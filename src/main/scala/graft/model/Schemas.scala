package graft.model

import org.apache.spark.sql.types._

/** Declared raw (bronze) schemas — fixed StructTypes, no inference.
  *
  * Semantics from the reference bronze ingestors:
  * `lakehouse_pipelines/bronze/ingest_policies.py:28-47`,
  * `ingest_claims.py:12-30`, `ingest_premiums.py:12-26`,
  * `ingest_properties.py:12-34`. All raw date/timestamp fields arrive as
  * STRING and are cast at silver (SURVEY §1.2).
  */
object Schemas {

  private def s(name: String, nullable: Boolean = true) =
    StructField(name, StringType, nullable)
  private def d(name: String) = StructField(name, DoubleType, nullable = true)
  private def i(name: String) = StructField(name, IntegerType, nullable = true)

  val rawPolicies: StructType = StructType(Seq(
    s("policy_id", nullable = false),
    s("policyholder_first_name"), s("policyholder_last_name"),
    s("policyholder_email"),
    s("property_id"), s("coverage_type_code"),
    s("effective_date"), s("expiration_date"),
    s("status"),
    d("annual_premium"), d("deductible"), d("coverage_limit"),
    s("agent_id"), s("channel"),
    s("created_at"), s("updated_at")))

  val rawClaims: StructType = StructType(Seq(
    s("claim_id", nullable = false), s("policy_id", nullable = false),
    s("claim_date"), s("reported_date"), s("closed_date"),
    s("claim_type"), s("claim_status"),
    d("claim_amount"), d("approved_amount"), d("deductible_applied"),
    s("adjuster_id"), s("cause_of_loss"), s("description"),
    s("created_at"), s("updated_at")))

  val rawPremiums: StructType = StructType(Seq(
    s("premium_id", nullable = false), s("policy_id", nullable = false),
    s("payment_date"), s("due_date"),
    d("amount"),
    s("payment_method"), s("payment_status"), s("billing_period"),
    s("period_start_date"), s("period_end_date"),
    s("created_at")))

  val rawProperties: StructType = StructType(Seq(
    s("property_id", nullable = false),
    s("street_address"), s("city"), s("state"), s("zip_code"), s("county"),
    d("latitude"), d("longitude"),
    i("year_built"), i("square_footage"), i("stories"),
    s("construction_type"), s("roof_type"), s("occupancy_type"),
    s("flood_zone"), s("wind_zone"),
    d("property_value"),
    s("created_at"), s("updated_at")))

  /** Accepted-value domains (reference `clean_policies.py:28-29`,
    * `clean_claims.py:14-26`, FIXTURES.md §1). */
  object Domains {
    val policyStatuses = Seq("ACTIVE", "CANCELLED", "EXPIRED", "PENDING", "SUSPENDED")
    val channels = Seq("ONLINE", "AGENT", "REFERRAL", "PARTNER", "DIRECT_MAIL")
    val coverageTypes = Seq("HO3", "HO5", "HO6", "DP1", "DP3", "HO4", "FLOOD", "WIND")
    val claimTypes = Seq("PROPERTY_DAMAGE", "LIABILITY", "THEFT", "WATER_DAMAGE",
      "WIND_DAMAGE", "FIRE", "HAIL", "FLOOD", "MOLD", "OTHER")
    val claimStatuses = Seq("OPEN", "UNDER_REVIEW", "APPROVED", "DENIED", "CLOSED", "REOPENED")
    val paymentMethods = Seq("ACH", "CREDIT_CARD", "CHECK", "WIRE", "ESCROW")
    val paymentStatuses = Seq("COMPLETED", "FAILED", "PENDING")
    val billingPeriods = Seq("MONTHLY", "QUARTERLY", "SEMI_ANNUAL", "ANNUAL")
  }
}
