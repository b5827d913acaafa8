package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-TEXT twins of the six gold marts (SURVEY §7.4): the dbt mart SQL
  * (`legacy_dbt_project/models/marts/{dim_policy,dim_property,dim_coverage,
  * dim_date,fact_claims,fact_premiums}.sql`) re-expressed as Spark SQL
  * STRINGS executed via `spark.sql` over temp views of the silver frames —
  * the surface a dbt-migration consumer actually types. Each twin is gated
  * against the SAME DuckDB oracle as its DataFrame builder
  * ([[PipelineQueries]] / [[RelationalQueries]] share the oracle vals), so
  * a SQL-layer semantic delta (`||` null behavior, DOW numbering,
  * DATEDIFF argument order, decimal coercion in CASE) cannot hide behind
  * a separately-authored oracle.
  *
  * Dialect deltas encoded here (vs the Redshift/DuckDB text):
  *   - `DATEDIFF('day', a, b)` / `date_diff('day', a, b)` = b − a becomes
  *     Spark `datediff(b, a)` — argument ORDER FLIPS.
  *   - Redshift DOW 0=Sun..6 becomes `dayofweek(d) - 1` (Spark is 1-based).
  *   - `CAST(x AS VARCHAR)` becomes `CAST(x AS STRING)`.
  *   - `dbt_utils.date_spine` becomes `explode(sequence(start, end-1))`.
  * Plans are identical to the DataFrame builders' — Catalyst parses both
  * to the same logical plan shapes (same joins, same aggregates), so the
  * scale posture of the builder gates carries over unchanged.
  */
object SqlMartQueries {

  /** Register the silver layer as temp views; the mart SQL reads these. */
  private def silverViews(s: SparkSession, dir: String): Unit = {
    PipelineQueries.silverPolicies(s, dir).createOrReplaceTempView("silver_policies")
    PipelineQueries.silverClaims(s, dir).createOrReplaceTempView("silver_claims")
    PipelineQueries.silverPremiums(s, dir).createOrReplaceTempView("silver_premiums")
    PipelineQueries.silverProperties(s, dir).createOrReplaceTempView("silver_properties")
  }

  private def mart(sql: String)(s: SparkSession, dir: String): DataFrame = {
    silverViews(s, dir)
    s.sql(sql)
  }

  // int_premium_summary.sql:10-22 as a Spark SQL CTE body.
  private val premiumSummarySparkSql: String =
    """SELECT policy_id,
      |    count(*) AS total_premium_payments,
      |    CAST(SUM(amount) AS DECIMAL(12,2)) AS total_paid,
      |    CAST(SUM(CASE WHEN payment_status = 'COMPLETED' THEN amount ELSE 0 END)
      |         AS DECIMAL(12,2)) AS total_premium_collected,
      |    CAST(SUM(CASE WHEN payment_status = 'FAILED' THEN amount ELSE 0 END)
      |         AS DECIMAL(12,2)) AS total_failed,
      |    CAST(SUM(CASE WHEN payment_status = 'PENDING' THEN amount ELSE 0 END)
      |         AS DECIMAL(12,2)) AS total_pending,
      |    MIN(payment_date) AS first_payment_date,
      |    MAX(payment_date) AS last_payment_date,
      |    CAST(count(CASE WHEN payment_date > due_date THEN 1 END) AS INT)
      |      AS late_premium_payments,
      |    AVG(datediff(payment_date, due_date)) AS avg_days_from_due
      |  FROM silver_premiums GROUP BY policy_id""".stripMargin

  // dbt dim_policy.sql:9-60 (asOf pinned to DATE'2026-06-01' like the builder).
  private val dimPolicySparkSql: String =
    s"""WITH ps AS ($premiumSummarySparkSql)
       |SELECT p.policy_id, p.policyholder_first_name, p.policyholder_last_name,
       |  p.policyholder_full_name, p.policyholder_email, p.property_id,
       |  p.coverage_type_code, p.effective_date, p.expiration_date, p.status,
       |  CAST(p.annual_premium AS DOUBLE) AS annual_premium,
       |  CAST(p.deductible AS DOUBLE) AS deductible,
       |  CAST(p.coverage_limit AS DOUBLE) AS coverage_limit,
       |  p.agent_id, p.channel,
       |  COALESCE(ps.total_premium_payments, 0) AS total_premium_payments,
       |  CAST(COALESCE(ps.total_premium_collected, CAST(0 AS DECIMAL(12,2)))
       |    AS DOUBLE) AS total_premium_collected,
       |  COALESCE(ps.late_premium_payments, 0) AS late_premium_payments,
       |  datediff(p.expiration_date, p.effective_date) AS policy_term_days,
       |  CASE WHEN p.status = 'ACTIVE' AND p.expiration_date >= DATE '2026-06-01'
       |         THEN 'IN FORCE'
       |       WHEN p.status = 'ACTIVE' AND p.expiration_date < DATE '2026-06-01'
       |         THEN 'EXPIRED'
       |       WHEN p.status = 'CANCELLED' THEN 'CANCELLED'
       |       WHEN p.status = 'PENDING' THEN 'PENDING'
       |       ELSE 'UNKNOWN' END AS policy_status_category,
       |  p.updated_at AS effective_start_date,
       |  CAST(NULL AS TIMESTAMP) AS effective_end_date,
       |  TRUE AS is_current,
       |  p.created_at, p.updated_at,
       |  md5(concat_ws('|', COALESCE(CAST(p.policy_id AS STRING), '_null_'),
       |      COALESCE(CAST(p.updated_at AS STRING), '_null_'))) AS policy_sk
       |FROM silver_policies p LEFT JOIN ps ON p.policy_id = ps.policy_id
       |ORDER BY p.policy_id""".stripMargin

  // dbt dim_property.sql:9-53.
  private val dimPropertySparkSql: String =
    """SELECT
      |  md5(concat_ws('|', COALESCE(CAST(property_id AS STRING), '_null_'),
      |      COALESCE(CAST(updated_at AS STRING), '_null_'))) AS property_sk,
      |  property_id, street_address, city, state, zip_code, county,
      |  CAST(latitude AS DOUBLE) AS latitude,
      |  CAST(longitude AS DOUBLE) AS longitude,
      |  year_built, square_footage, construction_type,
      |  roof_type, stories, occupancy_type, flood_zone, wind_zone,
      |  CAST(property_value AS DOUBLE) AS property_value,
      |  2026 - year_built AS property_age_years,
      |  CASE WHEN construction_type IN ('MASONRY', 'CONCRETE') THEN 'LOW'
      |       WHEN construction_type IN ('FRAME', 'WOOD') THEN 'HIGH'
      |       ELSE 'MEDIUM' END AS construction_risk_tier,
      |  CASE WHEN flood_zone IN ('A', 'AE', 'V', 'VE') THEN 'HIGH'
      |       WHEN flood_zone IN ('B', 'X500') THEN 'MODERATE'
      |       ELSE 'LOW' END AS flood_risk_tier,
      |  CASE WHEN wind_zone IN ('4', '5') THEN 'HIGH'
      |       WHEN wind_zone = '3' THEN 'MODERATE'
      |       ELSE 'LOW' END AS wind_risk_tier,
      |  updated_at AS effective_start_date,
      |  CAST(NULL AS TIMESTAMP) AS effective_end_date,
      |  TRUE AS is_current,
      |  created_at, updated_at
      |FROM silver_properties ORDER BY property_id""".stripMargin

  // dbt dim_coverage.sql:5-39.
  private val dimCoverageSparkSql: String =
    """WITH codes AS (SELECT DISTINCT coverage_type_code FROM silver_policies)
      |SELECT
      |  md5(concat_ws('|', COALESCE(coverage_type_code, '_null_'))) AS coverage_sk,
      |  coverage_type_code,
      |  CASE coverage_type_code
      |    WHEN 'HO3' THEN 'Special Form Homeowners'
      |    WHEN 'HO5' THEN 'Comprehensive Form Homeowners'
      |    WHEN 'HO6' THEN 'Condo Unit Owners'
      |    WHEN 'DP1' THEN 'Basic Dwelling Fire'
      |    WHEN 'DP3' THEN 'Special Dwelling Fire'
      |    WHEN 'HO4' THEN 'Renters Insurance'
      |    WHEN 'FLOOD' THEN 'Flood Insurance'
      |    WHEN 'WIND' THEN 'Wind/Hurricane Coverage'
      |    ELSE 'Other' END AS coverage_type_name,
      |  CASE WHEN coverage_type_code IN ('HO3', 'HO5', 'HO6') THEN 'Homeowners'
      |       WHEN coverage_type_code IN ('DP1', 'DP3') THEN 'Dwelling'
      |       WHEN coverage_type_code = 'HO4' THEN 'Renters'
      |       WHEN coverage_type_code IN ('FLOOD', 'WIND') THEN 'Specialty'
      |       ELSE 'Other' END AS coverage_category,
      |  TRUE AS is_current
      |FROM codes ORDER BY coverage_type_code""".stripMargin

  // dbt dim_date.sql:5-41 (dbt_utils.date_spine → explode(sequence);
  // same 2020-01-01..2022-01-01 exclusive range as the w1 builder gate;
  // Redshift 0-based DOW via dayofweek(d) - 1).
  private val dimDateSparkSql: String =
    """SELECT CAST(date_day AS DATE) AS date_key,
      |  year(date_day) AS year,
      |  quarter(date_day) AS quarter,
      |  month(date_day) AS month,
      |  day(date_day) AS day_of_month,
      |  dayofweek(date_day) - 1 AS day_of_week,
      |  dayofyear(date_day) AS day_of_year,
      |  date_format(date_day, 'yyyy-MM') AS year_month,
      |  concat(date_format(date_day, 'yyyy'), '-Q', quarter(date_day)) AS year_quarter,
      |  date_format(date_day, 'MMMM') AS month_name,
      |  date_format(date_day, 'EEEE') AS day_name,
      |  (dayofweek(date_day) - 1) IN (0, 6) AS is_weekend,
      |  month(date_day) BETWEEN 6 AND 11 AS is_hurricane_season,
      |  month(date_day) BETWEEN 3 AND 5 AS is_tornado_season,
      |  month(date_day) IN (12, 1, 2) AS is_winter_storm_season
      |FROM (SELECT explode(sequence(to_date('2020-01-01'),
      |       date_sub(to_date('2022-01-01'), 1), interval 1 day)) AS date_day)
      |ORDER BY date_key""".stripMargin

  // dbt fact_claims.sql:9-58.
  private val factClaimsSparkSql: String =
    """SELECT c.claim_id, c.policy_id, p.property_id, p.coverage_type_code,
      |  c.claim_date AS claim_date_key,
      |  c.reported_date AS reported_date_key,
      |  c.closed_date AS closed_date_key,
      |  c.claim_type, c.claim_status, c.cause_of_loss, c.adjuster_id,
      |  CAST(c.claim_amount AS DOUBLE) AS claim_amount,
      |  CAST(c.approved_amount AS DOUBLE) AS approved_amount,
      |  CAST(c.deductible_applied AS DOUBLE) AS deductible_applied,
      |  CAST(LEAST(c.claim_amount, p.coverage_limit) AS DOUBLE) AS capped_claim_amount,
      |  CAST(c.approved_amount - c.deductible_applied AS DOUBLE) AS net_claim_payout,
      |  CAST(p.annual_premium AS DOUBLE) AS annual_premium,
      |  CAST(p.deductible AS DOUBLE) AS policy_deductible,
      |  CAST(p.coverage_limit AS DOUBLE) AS coverage_limit,
      |  CAST(c.claim_amount AS DOUBLE) /
      |    NULLIF(CAST(p.annual_premium AS DOUBLE), 0) AS claim_to_premium_ratio,
      |  datediff(c.reported_date, c.claim_date) AS days_to_report,
      |  datediff(c.closed_date, c.reported_date) AS days_to_close,
      |  pr.state AS property_state,
      |  pr.flood_zone, pr.wind_zone,
      |  c.claim_amount > p.coverage_limit AS exceeds_coverage_limit,
      |  datediff(c.reported_date, c.claim_date) > 30 AS late_reported,
      |  c.claim_status = 'CLOSED' AS is_closed,
      |  c.approved_amount > 0 AS is_paid
      |FROM silver_claims c
      |JOIN silver_policies p ON c.policy_id = p.policy_id
      |LEFT JOIN silver_properties pr ON p.property_id = pr.property_id
      |ORDER BY c.claim_id""".stripMargin

  // dbt fact_premiums.sql:9-45.
  private val factPremiumsSparkSql: String =
    """SELECT pr.premium_id, pr.policy_id, p.property_id, p.coverage_type_code,
      |  pr.payment_date AS payment_date_key,
      |  pr.due_date AS due_date_key,
      |  pr.period_start_date, pr.period_end_date,
      |  pr.payment_method, pr.payment_status, pr.billing_period,
      |  p.agent_id, p.channel,
      |  CAST(pr.amount AS DOUBLE) AS premium_amount,
      |  CAST(CASE WHEN pr.payment_status = 'COMPLETED' THEN pr.amount
      |       ELSE 0 END AS DOUBLE) AS collected_amount,
      |  CAST(CASE WHEN pr.payment_status = 'FAILED' THEN pr.amount
      |       ELSE 0 END AS DOUBLE) AS failed_amount,
      |  datediff(pr.payment_date, pr.due_date) AS days_from_due,
      |  pr.payment_date > pr.due_date AS is_late_payment,
      |  pr.payment_status = 'COMPLETED' AS is_collected,
      |  pr.payment_status = 'FAILED' AS is_failed
      |FROM silver_premiums pr
      |LEFT JOIN silver_policies p ON pr.policy_id = p.policy_id
      |ORDER BY pr.premium_id""".stripMargin

  val defs: Seq[(String, Q)] = Seq(
    "sql_dim_policy" -> Q(mart(dimPolicySparkSql),
      Some(PipelineQueries.dimPolicyOracle)),
    "sql_dim_property" -> Q(mart(dimPropertySparkSql),
      Some(PipelineQueries.dimPropertyOracle)),
    "sql_dim_coverage" -> Q(mart(dimCoverageSparkSql),
      Some(PipelineQueries.dimCoverageOracle)),
    "sql_dim_date" -> Q((s, _) => { val df = s.sql(dimDateSparkSql); df },
      Some(RelationalQueries.dimDateOracle)),
    "sql_fact_claims" -> Q(mart(factClaimsSparkSql),
      Some(PipelineQueries.factClaimsOracle)),
    "sql_fact_premiums" -> Q(mart(factPremiumsSparkSql),
      Some(PipelineQueries.factPremiumsOracle)))
}
