package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.governance.Audit
import Registry.T

/** Governance/audit surface (reference `governance/audit_queries.sql`),
  * exercised over an audit-log-shaped frame derived from the `events`
  * table (Unity Catalog's `system.access.audit` is Databricks-only; the
  * shape is identical). `asOf` is pinned so the 7-day windows are
  * deterministic.
  */
object GovernanceQueries {

  /** events → audit-log shape. status_code is constant so rows that tie
    * on every sort key are fully identical (ns→µs truncation-safe). */
  private def auditLog(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    T(s, dir, "events").select(
      date_trunc("second", timestamp_micros(expr("ts div 1000"))).as("event_time"),
      concat(lit("user"), col("user_id") % 20, lit("@corp.io")).as("user_email"),
      concat(lit("fintech_catalog.gold.dim_policy_"), col("event_type")).as("table_accessed"),
      when(col("event_id") % 3 === 0, "getTable").otherwise("commandSubmit").as("action_name"),
      lit(200).as("status_code"))

  private val auditLogSql =
    """SELECT date_trunc('second', ts) AS event_time,
      |  'user' || CAST(user_id % 20 AS VARCHAR) || '@corp.io' AS user_email,
      |  'fintech_catalog.gold.dim_policy_' || event_type AS table_accessed,
      |  CASE WHEN event_id % 3 = 0 THEN 'getTable' ELSE 'commandSubmit' END AS action_name,
      |  200 AS status_code
      |FROM events""".stripMargin

  val defs: Seq[(String, Q)] = Seq(

    "gov_pii_access_window" -> Q((s, dir) =>
      Audit.piiAccessLast7Days(auditLog(s, dir), "fintech_catalog.gold.dim_policy",
        asOf = to_timestamp(lit("2024-01-08 00:00:00")))
        .orderBy(col("event_time").desc, col("user_email"), col("table_accessed"),
          col("action_name")),
      Some(s"""SELECT event_time, user_email, table_accessed, action_name, status_code
              |FROM ($auditLogSql) a
              |WHERE action_name IN ('getTable', 'commandSubmit')
              |  AND table_accessed LIKE 'fintech_catalog.gold.dim_policy%'
              |  AND event_time >= TIMESTAMP '2024-01-08 00:00:00' - INTERVAL 7 DAY
              |ORDER BY event_time DESC, user_email, table_accessed, action_name""".stripMargin)),

    "gov_audit_bulk_access" -> Q((s, dir) =>
      Audit.bulkAccessAnomalies(auditLog(s, dir), threshold = 20,
        asOf = to_timestamp(lit("2024-01-08 00:00:00")))
        .orderBy(col("query_count").desc, col("user_email"), col("access_date")),
      Some(s"""SELECT user_email, CAST(event_time AS DATE) AS access_date,
              |  count(*) AS query_count,
              |  count(DISTINCT table_accessed) AS distinct_tables
              |FROM ($auditLogSql) a
              |WHERE action_name = 'commandSubmit'
              |  AND event_time >= TIMESTAMP '2024-01-08 00:00:00' - INTERVAL 7 DAY
              |GROUP BY user_email, CAST(event_time AS DATE)
              |HAVING count(*) > 20
              |ORDER BY query_count DESC, user_email, access_date""".stripMargin)),

    "gov_subject_access_request" -> Q((s, dir) => {
      // DSAR across "gold tables": per-table row counts for one subject.
      T(s, dir, "orders").select(col("o_orderkey").cast("string").as("policy_id"))
        .createOrReplaceTempView("gov_dim_policy")
      T(s, dir, "lineitem").select(col("l_orderkey").cast("string").as("policy_id"))
        .createOrReplaceTempView("gov_fact_claims")
      T(s, dir, "lineitem").filter(col("l_quantity") > 10)
        .select(col("l_orderkey").cast("string").as("policy_id"))
        .createOrReplaceTempView("gov_fact_premiums")
      Audit.subjectAccessRequest(s, "42",
        Seq("gov_dim_policy", "gov_fact_claims", "gov_fact_premiums"))
    }, Some("""SELECT * FROM (
              |  SELECT 'gov_dim_policy' AS table_name,
              |    (SELECT count(*) FROM orders WHERE CAST(o_orderkey AS VARCHAR) = '42')
              |      AS row_count
              |  UNION ALL
              |  SELECT 'gov_fact_claims',
              |    (SELECT count(*) FROM lineitem WHERE CAST(l_orderkey AS VARCHAR) = '42')
              |  UNION ALL
              |  SELECT 'gov_fact_premiums',
              |    (SELECT count(*) FROM lineitem
              |     WHERE CAST(l_orderkey AS VARCHAR) = '42' AND l_quantity > 10)
              |) ORDER BY table_name""".stripMargin)),

    "gov_column_inventory" -> Q((s, dir) => {
      s.sql("CREATE DATABASE IF NOT EXISTS graft_gov")
      s.sql("DROP TABLE IF EXISTS graft_gov.nation_cols")
      T(s, dir, "nation").select("n_nationkey", "n_name")
        .write.saveAsTable("graft_gov.nation_cols")
      Audit.columnInventory(s, "graft_gov")
    }, Some("""SELECT * FROM (VALUES
              |  ('graft_gov', 'nation_cols', 'n_name', 'string'),
              |  ('graft_gov', 'nation_cols', 'n_nationkey', 'int'))
              |  AS t(table_schema, table_name, column_name, data_type)
              |ORDER BY table_schema, table_name, column_name""".stripMargin)),

    "gov_k_anonymity" -> Q((s, dir) => {
      // k-anonymity audit (AccessControls.kAnonymityClasses): customer
      // re-identification risk over (nation, segment, balance-bucket)
      // quasi-identifiers — the 40 smallest equivalence classes with
      // their below-k=5 flags. bal_bucket = floor(acctbal/500): a 2-dp
      // value over a double divide lands ≥2e-5 from any integer, so the
      // floor cannot straddle engines.
      val c = T(s, dir, "customer").withColumn("bal_bucket",
        floor(col("c_acctbal") / lit(500.0)).cast("long"))
      graft.governance.AccessControls
        .kAnonymityClasses(c, Seq("c_nationkey", "c_mktsegment", "bal_bucket"), 5)
        .orderBy(col("class_size"), col("c_nationkey"), col("c_mktsegment"),
          col("bal_bucket"))
        .limit(40)
    }, Some("""WITH cls AS (SELECT c_nationkey, c_mktsegment,
              |    CAST(floor(CAST(c_acctbal AS DOUBLE) / 500.0e0) AS BIGINT) AS bal_bucket,
              |    count(*) AS class_size
              |  FROM customer GROUP BY 1, 2, 3)
              |SELECT c_nationkey, c_mktsegment, bal_bucket, class_size,
              |  class_size < 5 AS violates_k
              |FROM cls
              |ORDER BY class_size, c_nationkey, c_mktsegment, bal_bucket
              |LIMIT 40""".stripMargin)),

    "gov_k_suppression" -> Q((s, dir) => {
      // Cell-suppression repair (AccessControls.suppressBelowK): rows in
      // below-k classes get quasi columns nulled. The gate pins the
      // partition arithmetic: input count, suppressed-row count (= the
      // summed population of violating classes), and that the repaired
      // frame's surviving classes all clear k.
      val quasi = Seq("c_nationkey", "c_mktsegment", "bal_bucket")
      val c = T(s, dir, "customer").withColumn("bal_bucket",
        floor(col("c_acctbal") / lit(500.0)).cast("long"))
      val repaired = graft.governance.AccessControls.suppressBelowK(c, quasi, 5)
      val survivorsBelowK = repaired.filter(col("c_mktsegment").isNotNull)
        .groupBy(quasi.map(col): _*).agg(count(lit(1)).as("cs"))
        .filter(col("cs") < 5)
      repaired.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("c_mktsegment").isNull, 1L).otherwise(0L)).as("n_suppressed"))
        .crossJoin(survivorsBelowK.agg(count(lit(1)).as("surviving_below_k")))
    }, Some("""WITH cls AS (SELECT c_nationkey, c_mktsegment,
              |    CAST(floor(CAST(c_acctbal AS DOUBLE) / 500.0e0) AS BIGINT) AS bal_bucket,
              |    count(*) AS class_size
              |  FROM customer GROUP BY 1, 2, 3)
              |SELECT (SELECT count(*) FROM customer) AS n_rows,
              |  CAST(coalesce(sum(CASE WHEN class_size < 5 THEN class_size END), 0)
              |    AS BIGINT) AS n_suppressed,
              |  CAST(0 AS BIGINT) AS surviving_below_k
              |FROM cls""".stripMargin)),

    "gov_right_to_erasure" -> Q((s, dir) => {
      import s.implicits._
      // GDPR erasure (AccessControls.eraseSubjects): subjects' rows
      // leave the retained frame, and the compliance record tallies
      // exactly what was removed. Output fuses both halves: per-status
      // retained counts + the erased-row total, so the gate pins the
      // split is a PARTITION of the input (nothing lost, nothing
      // duplicated).
      val o = T(s, dir, "orders")
      val subjects = (1L to 1500L by 13).toDF("subject_key")
      val (retained, tally) = graft.governance.AccessControls
        .eraseSubjects(o, "o_custkey", subjects, "subject_key")
      val byStatus = retained.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .select(col("o_orderstatus").as("bucket"), col("cnt"))
      val erasedTotal = tally.agg(
        sum(col("rows_erased")).as("cnt"))
        .select(lit("_erased_rows").as("bucket"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
      byStatus.unionByName(erasedTotal).orderBy("bucket")
    }, Some("""SELECT * FROM (
              |  SELECT o_orderstatus AS bucket, count(*) AS cnt FROM orders
              |  WHERE o_custkey NOT IN (SELECT unnest(range(1, 1501, 13)))
              |  GROUP BY o_orderstatus
              |  UNION ALL
              |  SELECT '_erased_rows', count(*) FROM orders
              |  WHERE o_custkey IN (SELECT unnest(range(1, 1501, 13)))
              |) ORDER BY bucket""".stripMargin)),

    "gov_pseudonymize_join" -> Q((s, dir) => {
      // Keyed pseudonymization with referential integrity
      // (AccessControls.pseudonymizeKey): customer and orders are
      // tokenized INDEPENDENTLY with the same salt, then joined on the
      // surrogate alone — the clear key never appears downstream. The
      // oracle is deliberately NOT a replay of the join: it joins on
      // the CLEAR key and only then derives the surrogate, so the gate
      // passes iff pseudonymization is consistent across tables and
      // injective (a salt drift, cast drift, or collision between the
      // two tokenization sites diverges). Top-10 customers by order
      // count, count-desc / surrogate-asc total order.
      import graft.governance.AccessControls
      val cust = T(s, dir, "customer").select(
        AccessControls.pseudonymizeKey(col("c_custkey"), "k7").as("surrogate"))
      val ords = T(s, dir, "orders").select(
        AccessControls.pseudonymizeKey(col("o_custkey"), "k7").as("surrogate"),
        col("o_totalprice"))
      Registry.decimalsToDouble(
        cust.join(ords, "surrogate")
          .groupBy("surrogate")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("spend")))
        .orderBy(col("n_orders").desc, col("surrogate"))
        .limit(10)
    }, Some("""SELECT surrogate, n_orders, CAST(spend AS DOUBLE) AS spend
              |FROM (
              |  SELECT md5('k7:' || CAST(c.c_custkey AS VARCHAR)) AS surrogate,
              |    count(*) AS n_orders,
              |    SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS spend
              |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
              |  GROUP BY 1)
              |ORDER BY n_orders DESC, surrogate LIMIT 10""".stripMargin)))
}
