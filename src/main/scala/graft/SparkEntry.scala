package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (and the beyond-parity LLM
  * pipeline operators) is registered here as a named query over the
  * driver testdata, with an equivalent DuckDB oracle in [[oracleSql]].
  * Queries and oracles are authored together in `graft.queries.*`.
  */
object SparkEntry {

  private def registry: Seq[(String, Q)] =
    RelationalQueries.defs ++ WindowQueries.defs ++ PipelineQueries.defs ++
      SqlMartQueries.defs ++ LlmQueries.defs ++ StreamingQueries.defs ++
      GovernanceQueries.defs ++ TpchQueries.defs ++ TpcdsQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.factClaimsQuery(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for ops whose result is not
    * SQL-expressible (driver then records a weaker rows-only check). */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, Q(_, Some(sql), _)) => name -> sql }.toMap

  /** Headline queries timed by [[Bench]] at sf0.1. */
  def benchQueries: Seq[String] =
    registry.collect { case (name, q) if q.bench => name }
}
