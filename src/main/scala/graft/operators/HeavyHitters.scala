package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heavy hitters (frequent values) via a mergeable Misra-Gries summary
  * plus an exact verification pass.
  *
  * Why not just `groupBy(key).count.filter(cnt >= t)`: that shuffles one
  * row per DISTINCT key. At training-data scale the key column (URLs,
  * doc fingerprints, user ids) can have billions of distinct values of
  * which a handful are hot — the full-cardinality shuffle is the cost,
  * not the count. The sketch path shuffles only fixed-size summaries:
  *
  *   pass 1 — each partition folds its rows into a k-counter Misra-Gries
  *   summary; partials merge map-side and on the driver-side reduce like
  *   any aggregate (the summary is MERGEABLE: merge = keywise add, then
  *   subtract the (k+1)-th largest count and drop non-positives —
  *   Agarwal et al., "Mergeable Summaries", PODS'12). Guarantee: any key
  *   with true count > n/(k+1) SURVIVES (no false negatives); counts are
  *   under-estimates by at most n/(k+1).
  *
  *   pass 2 — the ≤k candidate keys broadcast back as a semi-join filter
  *   and only THEIR rows are counted exactly; false candidates die on
  *   the exact threshold.
  *
  * Result: exact heavy-hitter set and exact counts, with shuffle volume
  * k·|partitions| + |hot rows| instead of |distinct keys|. Choose
  * `capacity` ≥ n/threshold (then the survival guarantee covers every
  * key at or above the threshold).
  *
  * The per-group state is genuinely imperative, so this is the
  * documented home for a custom [[Aggregator]] (SURVEY §2.10: a
  * TypedImperativeAggregate-style fused counter) — built-ins cannot
  * express "bounded counters with global decrement".
  */
object HeavyHitters {

  /** Mergeable Misra-Gries summary over string keys, capacity `k`.
    * Immutable-map buffer keeps the encoder simple; the decrement-all
    * event costs O(k) but fires at most once per k insertions, so the
    * stream pass stays amortized O(1) per row. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, "capacity must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
      if (key == null) b
      else b.get(key) match {
        case Some(c)              => b.updated(key, c + 1L)
        case None if b.size < k   => b.updated(key, 1L)
        case None                 =>
          // Full and key absent: the classic decrement-all step — every
          // counter (and the incoming key's implicit 1) loses 1.
          b.iterator.flatMap { case (kk, c) =>
            if (c > 1L) Iterator((kk, c - 1L)) else Iterator.empty
          }.toMap
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (acc, (kk, c)) =>
        acc.updated(kk, acc.getOrElse(kk, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        // Trim back to k: subtract the (k+1)-th largest count from all,
        // drop non-positives — the mergeable-summaries trim rule.
        val cut = summed.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
        summed.iterator.flatMap { case (kk, c) =>
          if (c > cut) Iterator((kk, c - cut)) else Iterator.empty
        }.toMap
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    // A real MapType encoder (not kryo binary): the output feeds
    // explode(), which needs a catalyst map.
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Smallest capacity whose survival guarantee covers every key with
    * true count ≥ `minCount` over `n` rows: capacity + 1 > n/minCount.
    * CAPACITY MUST SCALE WITH n — a fixed k that works at one scale
    * factor silently drops true heavy hitters at 10× (caught by the
    * sf0.1 verification sweep in round 5; the sketch yielded 19 of 391
    * true keys with k=1024 at n=150k, threshold 17). */
  def capacityFor(n: Long, minCount: Long): Int = {
    require(minCount > 0, "minCount must be positive")
    math.max(64L, n / minCount + 1L).min(Int.MaxValue.toLong).toInt
  }

  /** Candidate heavy keys and their (under-)estimated counts from one
    * sketch pass — every key with true count > n/(capacity+1) is here. */
  def candidateKeys(df: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    val mg = udaf(new MisraGries(capacity))
    df.filter(col(keyCol).isNotNull)
      .select(mg(col(keyCol).cast("string")).as("sketch"))
      .select(explode(col("sketch")).as(Seq("key", "est_count")))
  }

  /** Exact heavy hitters: keys whose true count ≥ `minCount`, with exact
    * counts. Correct whenever `capacity + 1 > n / minCount` (the sketch
    * survival guarantee); the exact pass removes false candidates. */
  def heavyHitters(df: DataFrame, keyCol: String, minCount: Long,
      capacity: Int): DataFrame = {
    val cands = candidateKeys(df, keyCol, capacity)
      .select(col("key").as("_candidate"))
    df.filter(col(keyCol).isNotNull)
      .join(broadcast(cands), col(keyCol).cast("string") === col("_candidate"),
        "left_semi")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("exact_count"))
      .filter(col("exact_count") >= minCount)
  }
}
