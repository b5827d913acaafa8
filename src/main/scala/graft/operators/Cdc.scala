package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture changelog apply: collapse a keyed stream of
  * I(nsert)/U(pdate)/D(elete) change rows into final table state.
  *
  * This is the batch form of what [[graft.operators.Scd2]] does for
  * history-keeping and what `st7_foreachbatch_upsert` does incrementally:
  * the lakehouse "apply changes" primitive (the reference's merge
  * semantics, `lakehouse_pipelines/silver/merge_scd2.py`, minus history).
  *
  * Scale shape: ONE window shuffle on the key. Both the latest-row pick
  * (`row_number`) and the per-key change count share the same window
  * partitioning, so Spark plans a single Exchange — the w3 pattern. No
  * groupBy+self-join-back, no driver state. A key whose LAST change is a
  * delete vanishes from the output; deletes earlier in a key's history
  * are survived by later re-inserts, matching Debezium/Delta CDF replay
  * semantics (last writer wins by `seqCol`, ties broken deterministically
  * by the caller passing a total-ordering seq).
  */
object Cdc {

  /** @param log      changelog rows
    * @param keyCols  primary key of the target table
    * @param seqCol   total order of changes within a key (commit LSN)
    * @param opCol    'I' | 'U' | 'D'
    * @param valueCols payload columns carried into the final state.
    *
    * `n_changes` counts ALL change rows for the key — deletes included —
    * i.e. the key's changelog length, NOT its surviving-change count. */
  def applyChangelog(log: DataFrame, keyCols: Seq[String], seqCol: Column,
      opCol: Column, valueCols: Seq[String]): DataFrame = {
    // The internal working columns and output columns are fixed names; a
    // caller whose input or valueCols already uses one would get a
    // silently shadowed column (or an ambiguous-reference error deep in
    // the plan), so reject the collision loudly up front (r7 advice).
    val reserved = Set("__op", "__rn", "n_changes", "last_op")
    val colliding = (log.columns.toSeq ++ valueCols ++ keyCols)
      .filter(reserved.contains).distinct
    require(colliding.isEmpty,
      s"applyChangelog reserves column names ${reserved.mkString(", ")}; " +
        s"rename colliding input/value columns: ${colliding.mkString(", ")}")
    val part = Window.partitionBy(keyCols.map(col): _*)
    val latest = part.orderBy(seqCol.desc)
    log
      .withColumn("__op", opCol)
      .withColumn("__rn", row_number().over(latest))
      .withColumn("n_changes", count(lit(1)).over(part))
      .where(col("__rn") === 1 && col("__op") =!= "D")
      .select((keyCols.map(col) ++ Seq(col("__op").as("last_op")) ++
        valueCols.map(col) :+ col("n_changes")): _*)
  }
}
