package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{GoldDims, GoldFacts, SilverTransforms}

/** Gold builders: premium summary (full dbt aggregate set), dim_policy,
  * dim_coverage decode, dim_date spine semantics, and the two facts. */
class GoldSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val silverPolicies = SilverTransforms.transformPolicies(samplePolicies)
  private lazy val silverClaims = SilverTransforms.transformClaims(sampleClaims)

  private def premiums = Seq(
    ("PRM-1", "POL-001", "2024-02-01", "2024-02-01", 100.0, "COMPLETED"),
    ("PRM-2", "POL-001", "2024-03-05", "2024-03-01", 100.0, "COMPLETED"),
    ("PRM-3", "POL-001", "2024-04-01", "2024-04-01", 100.0, "FAILED"),
    ("PRM-4", "POL-002", "2024-04-02", "2024-04-01", 250.0, "PENDING"))
    .toDF("premium_id", "policy_id", "payment_date", "due_date", "amount", "payment_status")
    .select(col("premium_id"), col("policy_id"),
      col("payment_date").cast(DateType), col("due_date").cast(DateType),
      col("amount").cast(DecimalType(12, 2)), col("payment_status"))

  test("premium summary computes the full dbt aggregate set") {
    val s = GoldDims.buildPremiumSummary(premiums)
      .filter(col("policy_id") === "POL-001").head()
    assert(s.getAs[Long]("total_premium_payments") === 3)
    assert(s.getAs[java.math.BigDecimal]("total_paid").doubleValue() === 300.0)
    assert(s.getAs[java.math.BigDecimal]("total_premium_collected").doubleValue() === 200.0)
    assert(s.getAs[java.math.BigDecimal]("total_failed").doubleValue() === 100.0)
    assert(s.getAs[Int]("late_premium_payments") === 1)
    assert(s.getAs[Date]("first_payment_date").toString === "2024-02-01")
    assert(s.getAs[Date]("last_payment_date").toString === "2024-04-01")
  }

  test("dim_policy coalesces missing premium aggregates to 0") {
    val dim = GoldDims.buildDimPolicy(silverPolicies,
      GoldDims.buildPremiumSummary(premiums.filter(col("policy_id") === "POL-001")),
      asOf = lit("2024-06-01").cast(DateType))
    val jane = dim.filter(col("policy_id") === "POL-002").head()
    assert(jane.getAs[Long]("total_premium_payments") === 0)
    assert(jane.getAs[java.math.BigDecimal]("total_premium_collected").doubleValue() === 0.0)
  }

  test("dim_policy status category and SCD columns") {
    val dim = GoldDims.buildDimPolicy(silverPolicies,
      GoldDims.buildPremiumSummary(premiums), asOf = lit("2024-06-01").cast(DateType))
    val john = dim.filter(col("policy_id") === "POL-001").head()
    assert(john.getAs[String]("policy_status_category") === "IN FORCE")
    assert(john.getAs[Boolean]("is_current"))
    assert(john.isNullAt(john.fieldIndex("effective_end_date")))
    assert(john.getAs[String]("policy_sk").matches("[0-9a-f]{32}"))
    val jane = dim.filter(col("policy_id") === "POL-002").head()
    assert(jane.getAs[String]("policy_status_category") === "CANCELLED")
  }

  test("dim_coverage decodes names and categories") {
    val dim = GoldDims.buildDimCoverage(silverPolicies)
    val byCode = dim.collect().map(r =>
      r.getAs[String]("coverage_type_code") ->
        (r.getAs[String]("coverage_type_name"), r.getAs[String]("coverage_category"))).toMap
    assert(byCode("HO3") === ("Special Form Homeowners", "Homeowners"))
    assert(byCode("HO5") === ("Comprehensive Form Homeowners", "Homeowners"))
    assert(byCode.size === 2) // distinct codes only
  }

  test("dim_date spine is exclusive of end and flags seasons/weekends") {
    val dim = GoldDims.buildDimDate(spark, "2024-01-01", "2024-02-01")
    assert(dim.count() === 31) // Jan only; end exclusive like dbt date_spine
    val jan6 = dim.filter(col("date_key") === "2024-01-06").head() // Saturday
    assert(jan6.getAs[Int]("day_of_week") === 6)
    assert(jan6.getAs[Boolean]("is_weekend"))
    assert(jan6.getAs[Boolean]("is_winter_storm_season"))
    assert(!jan6.getAs[Boolean]("is_hurricane_season"))
  }

  test("fact_claims joins, caps, ratios, and null-safe datediff") {
    val properties = SilverTransforms.transformProperties(
      Seq(("PROP-001", "1 Main St", "Miami", "fl", "33101", "Dade",
        25.5, -80.25, 1990, 2000, 1, "frame", "shingle", "primary", "AE", "3",
        450000.0, "2024-01-01T00:00:00", "2024-01-01T00:00:00"))
        .toDF("property_id", "street_address", "city", "state", "zip_code", "county",
          "latitude", "longitude", "year_built", "square_footage", "stories",
          "construction_type", "roof_type", "occupancy_type", "flood_zone", "wind_zone",
          "property_value", "created_at", "updated_at"))
    val fact = GoldFacts.buildFactClaims(silverClaims, silverPolicies, properties)
    assert(fact.count() === 2) // both claims reference POL-001
    val closed = fact.filter(col("claim_id") === "CLM-001").head()
    // capped at claim amount (15000 < 300000 limit)
    assert(closed.getAs[java.math.BigDecimal]("capped_claim_amount").doubleValue() === 15000.0)
    assert(math.abs(closed.getAs[Double]("claim_to_premium_ratio") - 15000.0 / 1200.50) < 1e-9)
    assert(closed.getAs[String]("property_state") === "FL")
    assert(closed.getAs[Boolean]("is_closed"))
    val open = fact.filter(col("claim_id") === "CLM-002").head()
    assert(open.isNullAt(open.fieldIndex("days_to_close"))) // null closed_date
    assert(!open.getAs[Boolean]("is_paid"))
  }

  test("gold builder outputs honor the data-dictionary schema contracts") {
    import graft.model.GoldSchemas
    import graft.quality.SchemaValidator
    val dim = GoldDims.buildDimPolicy(silverPolicies,
      GoldDims.buildPremiumSummary(premiums), asOf = lit("2024-06-01").cast(DateType))
      .drop("_cleaned_timestamp")
    val dimCheck = SchemaValidator.validateSchema(dim, GoldSchemas.dimPolicy, strict = true)
    assert(dimCheck.passed, dimCheck.toString)

    val properties = SilverTransforms.transformProperties(
      Seq(("PROP-001", "1 Main St", "Miami", "fl", "33101", "Dade",
        25.5, -80.25, 1990, 2000, 1, "frame", "shingle", "primary", "AE", "3",
        450000.0, "2024-01-01T00:00:00", "2024-01-01T00:00:00"))
        .toDF("property_id", "street_address", "city", "state", "zip_code", "county",
          "latitude", "longitude", "year_built", "square_footage", "stories",
          "construction_type", "roof_type", "occupancy_type", "flood_zone", "wind_zone",
          "property_value", "created_at", "updated_at"))
    val fact = GoldFacts.buildFactClaims(silverClaims, silverPolicies, properties)
    val factCheck = SchemaValidator.validateSchema(fact, GoldSchemas.factClaims, strict = true)
    assert(factCheck.passed, factCheck.toString)

    val silverPrem = premiums
      .withColumn("payment_method", lit("ACH"))
      .withColumn("billing_period", lit("MONTHLY"))
      .withColumn("period_start_date", col("payment_date"))
      .withColumn("period_end_date", col("due_date"))
    val fp = GoldFacts.buildFactPremiums(silverPrem, silverPolicies)
    val fpCheck = SchemaValidator.validateSchema(fp, GoldSchemas.factPremiums, strict = true)
    assert(fpCheck.passed, fpCheck.toString)
  }

  test("fact_premiums conditional amounts and late flag") {
    val silverPrem = premiums
      .withColumn("payment_method", lit("ACH"))
      .withColumn("billing_period", lit("MONTHLY"))
      .withColumn("period_start_date", col("payment_date"))
      .withColumn("period_end_date", col("due_date"))
    val fact = GoldFacts.buildFactPremiums(silverPrem, silverPolicies)
    val late = fact.filter(col("premium_id") === "PRM-2").head()
    assert(late.getAs[Boolean]("is_late_payment"))
    assert(late.getAs[Int]("days_from_due") === 4)
    assert(late.getAs[java.math.BigDecimal]("collected_amount").doubleValue() === 100.0)
    val failed = fact.filter(col("premium_id") === "PRM-3").head()
    assert(failed.getAs[java.math.BigDecimal]("collected_amount").doubleValue() === 0.0)
    assert(failed.getAs[java.math.BigDecimal]("failed_amount").doubleValue() === 100.0)
  }
}
