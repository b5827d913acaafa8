package graft.model

import org.apache.spark.sql.types._

/** Expected gold-layer output schemas — the schema contracts from the
  * reference's data dictionary (`docs/data_dictionary.md`: dim_policy
  * :5-33, fact_claims :63-92, fact_premiums :94-118), used with
  * [[graft.quality.SchemaValidator.validateSchema]] to pin builder
  * outputs against the published contract (FIXTURES.md §3).
  */
object GoldSchemas {

  private def f(name: String, t: DataType) = StructField(name, t)

  val dimPolicy: StructType = StructType(Seq(
    f("policy_id", StringType),
    f("policyholder_first_name", StringType),
    f("policyholder_last_name", StringType),
    f("policyholder_full_name", StringType),
    f("policyholder_email", StringType),
    f("property_id", StringType),
    f("coverage_type_code", StringType),
    f("effective_date", DateType),
    f("expiration_date", DateType),
    f("status", StringType),
    f("annual_premium", DecimalType(12, 2)),
    f("deductible", DecimalType(12, 2)),
    f("coverage_limit", DecimalType(14, 2)),
    f("agent_id", StringType),
    f("channel", StringType),
    f("total_premium_payments", LongType),
    f("total_premium_collected", DecimalType(12, 2)),
    f("late_premium_payments", IntegerType),
    f("policy_term_days", IntegerType),
    f("policy_status_category", StringType),
    f("effective_start_date", TimestampType),
    f("effective_end_date", TimestampType),
    f("is_current", BooleanType),
    f("created_at", TimestampType),
    f("updated_at", TimestampType),
    f("policy_sk", StringType)))

  val factClaims: StructType = StructType(Seq(
    f("claim_id", StringType),
    f("policy_id", StringType),
    f("property_id", StringType),
    f("coverage_type_code", StringType),
    f("claim_date_key", DateType),
    f("reported_date_key", DateType),
    f("closed_date_key", DateType),
    f("claim_type", StringType),
    f("claim_status", StringType),
    f("cause_of_loss", StringType),
    f("adjuster_id", StringType),
    f("claim_amount", DecimalType(12, 2)),
    f("approved_amount", DecimalType(12, 2)),
    f("deductible_applied", DecimalType(12, 2)),
    f("capped_claim_amount", DecimalType(14, 2)),
    f("net_claim_payout", DecimalType(13, 2)),
    f("annual_premium", DecimalType(12, 2)),
    f("policy_deductible", DecimalType(12, 2)),
    f("coverage_limit", DecimalType(14, 2)),
    // typed DOUBLE per the data dictionary (`docs/data_dictionary.md:85`)
    f("claim_to_premium_ratio", DoubleType),
    f("days_to_report", IntegerType),
    f("days_to_close", IntegerType),
    f("property_state", StringType),
    f("flood_zone", StringType),
    f("wind_zone", StringType),
    f("exceeds_coverage_limit", BooleanType),
    f("late_reported", BooleanType),
    f("is_closed", BooleanType),
    f("is_paid", BooleanType)))

  val factPremiums: StructType = StructType(Seq(
    f("premium_id", StringType),
    f("policy_id", StringType),
    f("property_id", StringType),
    f("coverage_type_code", StringType),
    f("payment_date_key", DateType),
    f("due_date_key", DateType),
    f("period_start_date", DateType),
    f("period_end_date", DateType),
    f("payment_method", StringType),
    f("payment_status", StringType),
    f("billing_period", StringType),
    f("agent_id", StringType),
    f("channel", StringType),
    f("premium_amount", DecimalType(12, 2)),
    f("collected_amount", DecimalType(12, 2)),
    f("failed_amount", DecimalType(12, 2)),
    f("days_from_due", IntegerType),
    f("is_late_payment", BooleanType),
    f("is_collected", BooleanType),
    f("is_failed", BooleanType)))
}
