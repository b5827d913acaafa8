package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Funcs

/** Gold-layer dimension builders.
  *
  * Semantics: reference `lakehouse_pipelines/gold/dim_policy.py` plus the
  * three dims that exist only as dbt SQL (`legacy_dbt_project/models/marts/
  * dim_property.sql`, `dim_coverage.sql`, `dim_date.sql`) — implemented
  * here from the SQL (SURVEY "completeness note").
  *
  * `asOf` parameterizes `current_date()` so golden compares are
  * deterministic (SURVEY §7.4).
  */
object GoldDims {

  /** Full premium-payment aggregate from the dbt intermediate model
    * `int_premium_summary.sql:10-22` — the complete aggregate list, not
    * the reduced 3-column version the Python port kept
    * (`dim_policy.py:25-35`; SURVEY A2). One hash aggregate, map-side
    * partial combine, shuffle only on `policy_id`. */
  def buildPremiumSummary(premiums: DataFrame): DataFrame =
    premiums.groupBy("policy_id").agg(
      count(lit(1)).as("total_premium_payments"),
      sum(col("amount")).cast(DecimalType(12, 2)).as("total_paid"),
      sum(when(col("payment_status") === "COMPLETED", col("amount")).otherwise(0))
        .cast(DecimalType(12, 2)).as("total_premium_collected"),
      sum(when(col("payment_status") === "FAILED", col("amount")).otherwise(0))
        .cast(DecimalType(12, 2)).as("total_failed"),
      sum(when(col("payment_status") === "PENDING", col("amount")).otherwise(0))
        .cast(DecimalType(12, 2)).as("total_pending"),
      min(col("payment_date")).as("first_payment_date"),
      max(col("payment_date")).as("last_payment_date"),
      count(when(col("payment_date") > col("due_date"), lit(1)))
        .cast(IntegerType).as("late_premium_payments"),
      avg(datediff(col("payment_date"), col("due_date"))).as("avg_days_from_due"))

  /** Policy dimension (`dim_policy.py:38-95` / dbt `dim_policy.sql`).
    * The premium summary is per-policy (≤ one row per policy) and far
    * smaller than the policy table at scale — Catalyst/AQE broadcasts it;
    * no explicit hint needed for correctness. */
  def buildDimPolicy(policies: DataFrame, premiumSummary: DataFrame,
      asOf: Column = current_date()): DataFrame = {
    val joined = policies.alias("p")
      .join(premiumSummary.alias("ps"), col("p.policy_id") === col("ps.policy_id"), "left")
      .select(
        col("p.policy_id"),
        col("p.policyholder_first_name"),
        col("p.policyholder_last_name"),
        col("p.policyholder_full_name"),
        col("p.policyholder_email"),
        col("p.property_id"),
        col("p.coverage_type_code"),
        col("p.effective_date"),
        col("p.expiration_date"),
        col("p.status"),
        col("p.annual_premium"),
        col("p.deductible"),
        col("p.coverage_limit"),
        col("p.agent_id"),
        col("p.channel"),
        coalesce(col("ps.total_premium_payments"), lit(0)).as("total_premium_payments"),
        coalesce(col("ps.total_premium_collected"), lit(0)).as("total_premium_collected"),
        coalesce(col("ps.late_premium_payments"), lit(0)).as("late_premium_payments"),
        datediff(col("p.expiration_date"), col("p.effective_date")).as("policy_term_days"),
        when(col("p.status") === "ACTIVE" && col("p.expiration_date") >= asOf, lit("IN FORCE"))
          .when(col("p.status") === "ACTIVE" && col("p.expiration_date") < asOf, lit("EXPIRED"))
          .when(col("p.status") === "CANCELLED", lit("CANCELLED"))
          .when(col("p.status") === "PENDING", lit("PENDING"))
          .otherwise(lit("UNKNOWN")).as("policy_status_category"),
        col("p.updated_at").as("effective_start_date"),
        lit(null).cast(TimestampType).as("effective_end_date"),
        lit(true).as("is_current"),
        col("p.created_at"),
        col("p.updated_at"))
    joined.withColumn("policy_sk",
      Funcs.surrogateKey(col("policy_id"), col("updated_at")))
  }

  /** Property dimension — from dbt `dim_property.sql:9-53` (no Python
    * port exists; SURVEY completeness note). */
  def buildDimProperty(properties: DataFrame, asOf: Column = current_date()): DataFrame =
    properties.select(
      Funcs.surrogateKey(col("property_id"), col("updated_at")).as("property_sk"),
      col("property_id"), col("street_address"), col("city"), col("state"),
      col("zip_code"), col("county"), col("latitude"), col("longitude"),
      col("year_built"), col("square_footage"), col("construction_type"),
      col("roof_type"), col("stories"), col("occupancy_type"),
      col("flood_zone"), col("wind_zone"), col("property_value"),
      (year(asOf) - col("year_built")).as("property_age_years"),
      when(col("construction_type").isin("MASONRY", "CONCRETE"), lit("LOW"))
        .when(col("construction_type").isin("FRAME", "WOOD"), lit("HIGH"))
        .otherwise(lit("MEDIUM")).as("construction_risk_tier"),
      when(col("flood_zone").isin("A", "AE", "V", "VE"), lit("HIGH"))
        .when(col("flood_zone").isin("B", "X500"), lit("MODERATE"))
        .otherwise(lit("LOW")).as("flood_risk_tier"),
      when(col("wind_zone").isin("4", "5"), lit("HIGH"))
        .when(col("wind_zone") === "3", lit("MODERATE"))
        .otherwise(lit("LOW")).as("wind_risk_tier"),
      col("updated_at").as("effective_start_date"),
      lit(null).cast(TimestampType).as("effective_end_date"),
      lit(true).as("is_current"),
      col("created_at"), col("updated_at"))

  /** Coverage-type reference dim — from dbt `dim_coverage.sql:5-39`. */
  def buildDimCoverage(policies: DataFrame): DataFrame =
    policies.select("coverage_type_code").distinct().select(
      Funcs.surrogateKey(col("coverage_type_code")).as("coverage_sk"),
      col("coverage_type_code"),
      when(col("coverage_type_code") === "HO3", "Special Form Homeowners")
        .when(col("coverage_type_code") === "HO5", "Comprehensive Form Homeowners")
        .when(col("coverage_type_code") === "HO6", "Condo Unit Owners")
        .when(col("coverage_type_code") === "DP1", "Basic Dwelling Fire")
        .when(col("coverage_type_code") === "DP3", "Special Dwelling Fire")
        .when(col("coverage_type_code") === "HO4", "Renters Insurance")
        .when(col("coverage_type_code") === "FLOOD", "Flood Insurance")
        .when(col("coverage_type_code") === "WIND", "Wind/Hurricane Coverage")
        .otherwise("Other").as("coverage_type_name"),
      when(col("coverage_type_code").isin("HO3", "HO5", "HO6"), "Homeowners")
        .when(col("coverage_type_code").isin("DP1", "DP3"), "Dwelling")
        .when(col("coverage_type_code") === "HO4", "Renters")
        .when(col("coverage_type_code").isin("FLOOD", "WIND"), "Specialty")
        .otherwise("Other").as("coverage_category"),
      lit(true).as("is_current"))

  /** Date dimension — from dbt `dim_date.sql:5-41` (`dbt_utils.date_spine`
    * → `explode(sequence(...))`, the only table-generating function in the
    * inventory; SURVEY W1). `end` is EXCLUSIVE, matching
    * `dbt_utils.date_spine`'s end_date semantics (spine stops at
    * `end - 1 day`). Redshift DOW is 0=Sun..6; Spark `dayofweek` is
    * 1=Sun..7 — we keep Redshift's 0-based numbering so downstream
    * weekend logic (`IN (0,6)`) carries over unchanged. Redshift
    * TO_CHAR('Month') blank-pads; we emit unpadded names (documented
    * divergence, SURVEY F14). */
  def buildDimDate(spark: SparkSession,
      start: String = "2020-01-01", end: String = "2031-01-01"): DataFrame = {
    val spine = spark.sql(
      s"SELECT explode(sequence(to_date('$start'), date_sub(to_date('$end'), 1), interval 1 day)) AS date_day")
    spine.select(
      col("date_day").cast(DateType).as("date_key"),
      year(col("date_day")).as("year"),
      quarter(col("date_day")).as("quarter"),
      month(col("date_day")).as("month"),
      dayofmonth(col("date_day")).as("day_of_month"),
      (dayofweek(col("date_day")) - 1).as("day_of_week"),
      dayofyear(col("date_day")).as("day_of_year"),
      date_format(col("date_day"), "yyyy-MM").as("year_month"),
      concat(date_format(col("date_day"), "yyyy"), lit("-Q"),
        quarter(col("date_day"))).as("year_quarter"),
      date_format(col("date_day"), "MMMM").as("month_name"),
      date_format(col("date_day"), "EEEE").as("day_name"),
      (dayofweek(col("date_day")) - 1).isin(0, 6).as("is_weekend"),
      month(col("date_day")).between(6, 11).as("is_hurricane_season"),
      month(col("date_day")).between(3, 5).as("is_tornado_season"),
      month(col("date_day")).isin(12, 1, 2).as("is_winter_storm_season"))
  }
}
