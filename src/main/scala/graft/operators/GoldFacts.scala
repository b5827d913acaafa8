package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gold-layer fact builders.
  *
  * Semantics: reference `lakehouse_pipelines/gold/fact_claims.py:18-79`
  * (which merges dbt `int_policy_claims.sql` + `fact_claims.sql`) and
  * `fact_premiums.py:14-52` (dbt `fact_premiums.sql`).
  */
object GoldFacts {

  /** Claims fact: claims ⋈ policies (inner — drops orphan claims), then
    * ⟕ properties (keeps all claims). Both joins are single-key
    * equi-joins; the dims are orders of magnitude smaller than the claim
    * stream at scale, so AQE auto-broadcasts them — the big side never
    * shuffles. `claim_to_premium_ratio` is cast to double per the data
    * dictionary (`docs/data_dictionary.md:85`; SURVEY §7.4 decimal-division
    * note). */
  def buildFactClaims(claims: DataFrame, policies: DataFrame, properties: DataFrame): DataFrame =
    claims.alias("c")
      .join(policies.alias("p"), col("c.policy_id") === col("p.policy_id"), "inner")
      .join(properties.alias("prop"), col("p.property_id") === col("prop.property_id"), "left")
      .select(
        col("c.claim_id"),
        col("c.policy_id"),
        col("p.property_id"),
        col("p.coverage_type_code"),
        col("c.claim_date").as("claim_date_key"),
        col("c.reported_date").as("reported_date_key"),
        col("c.closed_date").as("closed_date_key"),
        col("c.claim_type"),
        col("c.claim_status"),
        col("c.cause_of_loss"),
        col("c.adjuster_id"),
        col("c.claim_amount"),
        col("c.approved_amount"),
        col("c.deductible_applied"),
        least(col("c.claim_amount"), col("p.coverage_limit")).as("capped_claim_amount"),
        (col("c.approved_amount") - col("c.deductible_applied")).as("net_claim_payout"),
        col("p.annual_premium"),
        col("p.deductible").as("policy_deductible"),
        col("p.coverage_limit"),
        // Operands widened to double BEFORE dividing: the data dictionary
        // types the ratio as DOUBLE, and decimal÷decimal result scales
        // are engine-specific — double division is IEEE-deterministic.
        (col("c.claim_amount").cast(DoubleType) /
          nullif(col("p.annual_premium").cast(DoubleType), lit(0.0)))
          .as("claim_to_premium_ratio"),
        datediff(col("c.reported_date"), col("c.claim_date")).as("days_to_report"),
        datediff(col("c.closed_date"), col("c.reported_date")).as("days_to_close"),
        col("prop.state").as("property_state"),
        col("prop.flood_zone"),
        col("prop.wind_zone"),
        (col("c.claim_amount") > col("p.coverage_limit")).as("exceeds_coverage_limit"),
        (datediff(col("c.reported_date"), col("c.claim_date")) > 30).as("late_reported"),
        (col("c.claim_status") === "CLOSED").as("is_closed"),
        (col("c.approved_amount") > 0).as("is_paid"))

  /** Premium fact: premiums ⟕ narrow policy projection (manual column
    * pruning before the join, mirroring `fact_premiums.py:20-22`;
    * Catalyst would prune anyway — kept for plan-shape parity). */
  def buildFactPremiums(premiums: DataFrame, policies: DataFrame): DataFrame =
    premiums.alias("pr")
      .join(
        policies.select("policy_id", "property_id", "coverage_type_code", "agent_id", "channel")
          .alias("p"),
        col("pr.policy_id") === col("p.policy_id"), "left")
      .select(
        col("pr.premium_id"),
        col("pr.policy_id"),
        col("p.property_id"),
        col("p.coverage_type_code"),
        col("pr.payment_date").as("payment_date_key"),
        col("pr.due_date").as("due_date_key"),
        col("pr.period_start_date"),
        col("pr.period_end_date"),
        col("pr.payment_method"),
        col("pr.payment_status"),
        col("pr.billing_period"),
        col("p.agent_id"),
        col("p.channel"),
        col("pr.amount").as("premium_amount"),
        when(col("pr.payment_status") === "COMPLETED", col("pr.amount"))
          .otherwise(0).as("collected_amount"),
        when(col("pr.payment_status") === "FAILED", col("pr.amount"))
          .otherwise(0).as("failed_amount"),
        datediff(col("pr.payment_date"), col("pr.due_date")).as("days_from_due"),
        (col("pr.payment_date") > col("pr.due_date")).as("is_late_payment"),
        (col("pr.payment_status") === "COMPLETED").as("is_collected"),
        (col("pr.payment_status") === "FAILED").as("is_failed"))
}
