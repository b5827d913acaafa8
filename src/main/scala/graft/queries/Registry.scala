package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gradable query: a Spark implementation plus (usually) an
  * equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Determinism contract with the driver's compare (tools/check.py): rows
  * are compared POSITIONALLY after sorting columns by name, so every
  * query must impose a total deterministic row order on BOTH sides, with
  * identical null placement (Spark ascending = NULLS FIRST; DuckDB
  * defaults to NULLS LAST, so oracles must spell `NULLS FIRST` when
  * ordering nullable columns). Aggregates over doubles are routed through
  * decimal casts with enough scale to hold the exact value, so both
  * engines recover identical numbers.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Registry {
  /** Load a driver testdata table. */
  def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
