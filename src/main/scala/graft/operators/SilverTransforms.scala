package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Funcs

/** Silver-layer cleaning transforms.
  *
  * Semantics: reference `lakehouse_pipelines/silver/clean_{policies,claims,
  * premiums,properties}.py` (which themselves mirror the dbt staging models
  * `stg_*.sql`). Each is a pure `DataFrame => DataFrame`.
  *
  * Implementation note (SURVEY §7.2): the reference chains 15-20
  * `withColumn` calls; we emit a single `select` — one projection node,
  * same semantics, no per-call analyzer overhead, and the whole projection
  * stays in one whole-stage-codegen span.
  *
  * `clock` parameterizes `_cleaned_timestamp` (reference uses
  * `current_timestamp()`) so golden tests can pin a fixed instant
  * (SURVEY §7.4 "non-deterministic columns").
  */
object SilverTransforms {

  val ValidStatuses: Seq[String] = graft.model.Schemas.Domains.policyStatuses
  val ValidChannels: Seq[String] = graft.model.Schemas.Domains.channels
  val ValidClaimTypes: Seq[String] = graft.model.Schemas.Domains.claimTypes
  val ValidClaimStatuses: Seq[String] = graft.model.Schemas.Domains.claimStatuses

  /** Bronze lineage columns (`_ingestion_timestamp`, `_source_file`,
    * `_batch_id`, ...) flow through silver untouched — the reference's
    * `withColumn` chains never select them away (`clean_policies.py:41-73`),
    * so a closed select list here would silently change the silver schema.
    */
  private def passthrough(bronze: DataFrame): Seq[Column] =
    bronze.columns.toSeq.filter(c => c.startsWith("_")).map(col)

  /** Mirrors `clean_policies.py:32-75` / `stg_policies.sql`. */
  def transformPolicies(bronze: DataFrame, clock: Column = current_timestamp()): DataFrame =
    bronze
      .filter(col("policy_id").isNotNull)
      .filter(col("effective_date").isNotNull)
      .select(Seq(
        col("policy_id"),
        trim(col("policyholder_first_name")).as("policyholder_first_name"),
        trim(col("policyholder_last_name")).as("policyholder_last_name"),
        concat_ws(" ",
          trim(col("policyholder_first_name")),
          trim(col("policyholder_last_name"))).as("policyholder_full_name"),
        trim(col("policyholder_email")).as("policyholder_email"),
        col("property_id"),
        Funcs.normCode(col("coverage_type_code")).as("coverage_type_code"),
        col("effective_date").cast(DateType).as("effective_date"),
        col("expiration_date").cast(DateType).as("expiration_date"),
        Funcs.normCode(col("status")).as("status"),
        col("annual_premium").cast(DecimalType(12, 2)).as("annual_premium"),
        col("deductible").cast(DecimalType(12, 2)).as("deductible"),
        col("coverage_limit").cast(DecimalType(14, 2)).as("coverage_limit"),
        trim(col("agent_id")).as("agent_id"),
        trim(col("channel")).as("channel"),
        col("created_at").cast(TimestampType).as("created_at"),
        col("updated_at").cast(TimestampType).as("updated_at"),
        clock.as("_cleaned_timestamp")) ++ passthrough(bronze): _*)

  /** Mirrors `clean_claims.py:29-54` / `stg_claims.sql`. Includes the
    * empty-string→NULL normalization for `closed_date` pinned by
    * `test_silver_transforms.py:83-87`. */
  def transformClaims(bronze: DataFrame, clock: Column = current_timestamp()): DataFrame =
    bronze
      .filter(col("claim_id").isNotNull)
      .filter(col("policy_id").isNotNull)
      .filter(col("claim_amount") >= 0)
      .select(Seq(
        col("claim_id"),
        col("policy_id"),
        col("claim_date").cast(DateType).as("claim_date"),
        col("reported_date").cast(DateType).as("reported_date"),
        when(col("closed_date") === "", lit(null).cast(DateType))
          .otherwise(col("closed_date").cast(DateType)).as("closed_date"),
        Funcs.normCode(col("claim_type")).as("claim_type"),
        Funcs.normCode(col("claim_status")).as("claim_status"),
        col("claim_amount").cast(DecimalType(12, 2)).as("claim_amount"),
        col("approved_amount").cast(DecimalType(12, 2)).as("approved_amount"),
        col("deductible_applied").cast(DecimalType(12, 2)).as("deductible_applied"),
        trim(col("adjuster_id")).as("adjuster_id"),
        trim(col("cause_of_loss")).as("cause_of_loss"),
        trim(col("description")).as("description"),
        col("created_at").cast(TimestampType).as("created_at"),
        col("updated_at").cast(TimestampType).as("updated_at"),
        clock.as("_cleaned_timestamp")) ++ passthrough(bronze): _*)

  /** Mirrors `clean_premiums.py:15-32` / `stg_premiums.sql`. */
  def transformPremiums(bronze: DataFrame, clock: Column = current_timestamp()): DataFrame =
    bronze
      .filter(col("premium_id").isNotNull)
      .filter(col("policy_id").isNotNull)
      .filter(col("amount") > 0)
      .select(Seq(
        col("premium_id"),
        col("policy_id"),
        col("payment_date").cast(DateType).as("payment_date"),
        col("due_date").cast(DateType).as("due_date"),
        col("amount").cast(DecimalType(12, 2)).as("amount"),
        Funcs.normCode(col("payment_method")).as("payment_method"),
        Funcs.normCode(col("payment_status")).as("payment_status"),
        trim(col("billing_period")).as("billing_period"),
        col("period_start_date").cast(DateType).as("period_start_date"),
        col("period_end_date").cast(DateType).as("period_end_date"),
        col("created_at").cast(TimestampType).as("created_at"),
        clock.as("_cleaned_timestamp")) ++ passthrough(bronze): _*)

  /** Mirrors `clean_properties.py:15-38` / `stg_properties.sql`. */
  def transformProperties(bronze: DataFrame, clock: Column = current_timestamp()): DataFrame =
    bronze
      .filter(col("property_id").isNotNull)
      .select(Seq(
        col("property_id"),
        trim(col("street_address")).as("street_address"),
        trim(col("city")).as("city"),
        Funcs.normCode(col("state")).as("state"),
        trim(col("zip_code")).as("zip_code"),
        trim(col("county")).as("county"),
        col("latitude").cast(DecimalType(10, 7)).as("latitude"),
        col("longitude").cast(DecimalType(10, 7)).as("longitude"),
        col("year_built").cast(IntegerType).as("year_built"),
        col("square_footage").cast(IntegerType).as("square_footage"),
        Funcs.normCode(col("construction_type")).as("construction_type"),
        Funcs.normCode(col("roof_type")).as("roof_type"),
        col("stories").cast(IntegerType).as("stories"),
        Funcs.normCode(col("occupancy_type")).as("occupancy_type"),
        Funcs.normCode(col("flood_zone")).as("flood_zone"),
        Funcs.normCode(col("wind_zone")).as("wind_zone"),
        col("property_value").cast(DecimalType(14, 2)).as("property_value"),
        col("created_at").cast(TimestampType).as("created_at"),
        col("updated_at").cast(TimestampType).as("updated_at"),
        clock.as("_cleaned_timestamp")) ++ passthrough(bronze): _*)
}
