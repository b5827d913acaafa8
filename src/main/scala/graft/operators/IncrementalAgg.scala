package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of keyed additive summaries.
  *
  * The reference's cadence is a daily batch that rebuilds gold
  * aggregates from the full silver history (`dim_policy.py:151-174`
  * reads the whole premiums table every run). At 100 TB that full
  * rescan is the cost of the pipeline; but every aggregate the premium
  * summary uses (COUNT, SUM, MIN, MAX, conditional sums — SURVEY §2.4
  * A1-A3) is MERGEABLE under inserts: state(base ∪ delta) =
  * merge(state(base), state(delta)). So the daily run only needs to
  * (1) aggregate the day's delta — small — and (2) keywise-merge it
  * into the stored summary: a shuffle of |summary keys| + |delta keys|
  * rows, independent of history size.
  *
  * Merge rules per measure kind: counts/sums ADD, mins take LEAST,
  * maxes take GREATEST. AVG must be stored as (sum, count) and derived
  * on read — averaging averages is the classic wrong answer. Deletes/
  * updates are out of scope (ADD-only streams; an update is a
  * compensating delta the caller constructs).
  */
object IncrementalAgg {

  /** How one summary column merges across batches. */
  sealed trait MergeKind
  case object Add extends MergeKind       // counts, sums
  case object TakeMin extends MergeKind   // monotone under inserts
  case object TakeMax extends MergeKind

  /** Keywise-merge two summaries with identical schemas: union the
    * (tiny) frames and fold each measure by its merge rule. Keys
    * present in only one side pass through unchanged — union+agg
    * handles the outer-merge semantics a join would need COALESCE
    * gymnastics for, in ONE exchange. */
  def merge(summaryA: DataFrame, summaryB: DataFrame, keyCols: Seq[String],
      measures: Seq[(String, MergeKind)]): DataFrame = {
    val aggs = measures.map {
      case (c, Add)     => sum(col(c)).as(c)
      case (c, TakeMin) => min(col(c)).as(c)
      case (c, TakeMax) => max(col(c)).as(c)
    }
    summaryA.unionByName(summaryB)
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a sequence of per-batch summaries into one — merge is
    * associative and commutative, so batch arrival order never changes
    * the result (asserted in IncrementalAggSpec). */
  def mergeAll(summaries: Seq[DataFrame], keyCols: Seq[String],
      measures: Seq[(String, MergeKind)]): DataFrame =
    summaries.reduce((a, b) => merge(a, b, keyCols, measures))
}
