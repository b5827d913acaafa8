package graft.governance

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Governance/audit query surface.
  *
  * Semantics: reference `governance/audit_queries.sql`. The reference runs
  * these against Unity Catalog's `system.access.audit`, which does not
  * exist in OSS Spark — so each query is parameterized by an audit-log
  * DataFrame with the same shape (event_time, user_email, table_accessed,
  * action_name, status_code), making the logic testable and portable.
  * `asOf` replaces `CURRENT_TIMESTAMP()` for deterministic runs
  * (SURVEY §7.4 clock-injection pattern).
  */
object Audit {

  /** Query 1 (`audit_queries.sql:12-23`): who accessed PII tables in the
    * last 7 days. DATEADD(DAY,-7,now) → `date_sub`/timestamp arithmetic;
    * ORDER BY event_time DESC. */
  def piiAccessLast7Days(auditLog: DataFrame, tablePrefix: String,
      asOf: Column = current_timestamp()): DataFrame =
    auditLog
      .filter(col("action_name").isin("getTable", "commandSubmit"))
      .filter(col("table_accessed").startsWith(tablePrefix))
      .filter(col("event_time") >= asOf - expr("INTERVAL 7 DAY"))
      .select("event_time", "user_email", "table_accessed", "action_name", "status_code")
      .orderBy(col("event_time").desc)

  /** Query 2 (`audit_queries.sql:28-40`): anomalous bulk access —
    * per-user per-day query counts with HAVING COUNT(*) > threshold. */
  def bulkAccessAnomalies(auditLog: DataFrame, threshold: Long = 100,
      asOf: Column = current_timestamp()): DataFrame =
    auditLog
      .filter(col("action_name") === "commandSubmit")
      .filter(col("event_time") >= asOf - expr("INTERVAL 7 DAY"))
      .groupBy(col("user_email"), col("event_time").cast("date").as("access_date"))
      .agg(count(lit(1)).as("query_count"),
        count_distinct(col("table_accessed")).as("distinct_tables"))
      .filter(col("query_count") > threshold)
      .orderBy(col("query_count").desc, col("user_email"))

  /** Query 3 (`audit_queries.sql:45-57`): CCPA data-subject access
    * request — find the subject's rows across every gold table keyed by
    * policy_id. Returns (table_name, row_count) so the DSAR report is
    * one bounded frame, never a driver-side loop over collects. */
  def subjectAccessRequest(spark: SparkSession, policyId: String,
      tables: Seq[String]): DataFrame = {
    val counts = tables.map { t =>
      spark.read.table(t).filter(col("policy_id") === policyId)
        .agg(count(lit(1)).as("row_count"))
        .select(lit(t).as("table_name"), col("row_count"))
    }
    counts.reduce(_ unionByName _).orderBy("table_name")
  }

  /** Query 4 (`audit_queries.sql:62-71`): lineage/metadata verification —
    * every column of every table in a database, from the catalog. */
  def columnInventory(spark: SparkSession, db: String): DataFrame = {
    import spark.implicits._
    // listTables(db) also returns session temp views (database = null);
    // keep only tables actually owned by the database.
    val rows = spark.catalog.listTables(db).collect()
      .filter(_.database == db)
      .flatMap { t =>
        spark.catalog.listColumns(db, t.name).collect().map(c =>
          (db, t.name, c.name, c.dataType))
      }.toSeq
    rows.toDF("table_schema", "table_name", "column_name", "data_type")
      .orderBy("table_schema", "table_name", "column_name")
  }
}
