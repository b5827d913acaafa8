package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan '05): mergeable point-
  * frequency estimation — the frequency complement to the repo's
  * Misra-Gries heavy hitters (top-k) and HLL (distinct count).
  *
  * Shape at 100 TB: the sketch is `depth` hash rows × `width` buckets of
  * counters — CONSTANT size regardless of input. Build is one explode to
  * `depth` rows plus ONE map-side-combinable hash aggregate; the key
  * universe never shuffles (only (row, bucket) pairs do, bounded by
  * depth×width distinct groups). Sketches merge by cell-wise sum, so
  * per-partition / per-day sketches roll up without touching the data
  * again. Estimates are one-sided: est ≥ true count always, and
  * est ≤ true + εN with probability 1−δ for width = ⌈e/ε⌉,
  * depth = ⌈ln 1/δ⌉.
  *
  * Hashing is md5-derived (first 32 bits of md5("cm<row>|" + key)) — a
  * pure function of (row, key), so any engine with md5 rebuilds the
  * identical sketch; the DuckDB oracle replays build AND estimate
  * bit-for-bit. No RNG state, no seed to ship.
  */
object CountMin {

  /** Bucket of `key` in hash row `row`: first 32 bits of
    * md5("cm<row>|" + key) mod `width`. */
  def bucket(key: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cm$row|"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % width

  private def rowBuckets(key: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map { r =>
      struct(lit(r).as("cm_row"), bucket(key, r, width).as("cm_bucket"))
    }: _*))

  /** Build the sketch from a keyed frame (one input row = one occurrence):
    * output is at most depth×width rows of (cm_row, cm_bucket, cm_count). */
  def build(df: DataFrame, keyCol: String, depth: Int = 4, width: Int = 256): DataFrame =
    df.select(rowBuckets(col(keyCol), depth, width).as("rb"))
      .select(col("rb.cm_row").as("cm_row"), col("rb.cm_bucket").as("cm_bucket"))
      .groupBy("cm_row", "cm_bucket")
      .agg(count(lit(1)).as("cm_count"))

  /** Cell-wise merge of sketches built with the SAME (depth, width). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("cm_row", "cm_bucket")
      .agg(sum("cm_count").as("cm_count"))

  /** Point estimates for the probe keys: min over the key's `depth`
    * counters. The constant-size sketch broadcasts; a probe key whose
    * bucket was never touched estimates 0 (left join + coalesce). */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    probes.select(col(keyCol), rowBuckets(col(keyCol), depth, width).as("rb"))
      .select(col(keyCol), col("rb.cm_row").as("cm_row"),
        col("rb.cm_bucket").as("cm_bucket"))
      .join(broadcast(sketch), Seq("cm_row", "cm_bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cm_count"), lit(0L))).as("cm_estimate"))
}
