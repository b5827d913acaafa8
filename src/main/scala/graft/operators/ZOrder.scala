package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data layout.
  *
  * Why: a table sorted by ONE column gives tight parquet min/max (and
  * thus file/row-group pruning) on that column only — predicates on a
  * second dimension scan everything. Interleaving the bits of two
  * columns into one sort key makes every file a small RECTANGLE in
  * (a, b) space, so min/max pruning works on either dimension — the
  * same layout trick Delta OPTIMIZE ZORDER and Hudi clustering apply,
  * here as plain column arithmetic + a range repartition any Spark can
  * run. Write the result with [[zorderBy]] and both `WHERE a = ...`
  * and `WHERE b BETWEEN ...` scans prune.
  *
  * The code is pure integer shifts/masks (codegen'd, engine-portable —
  * the DuckDB oracle reproduces it with div/mod arithmetic). Inputs
  * must be non-negative; callers bucket/offset real domains first
  * (e.g. `ts - min_ts`, hash-bucketed strings).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integral
    * columns: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * Monotone in each argument when the other is fixed; `bits ≤ 31`
    * keeps the result in a positive long. */
  def mortonCode(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in 1..31")
    (0 until bits).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** Cluster `df` for (colA, colB) locality: range-repartition on the
    * Morton code and sort within partitions, so each output partition
    * (→ parquet file on write) covers a compact rectangle of the key
    * space. One range-exchange shuffle, same cost as a plain global
    * sort. The helper `_z` column is dropped from the result. */
  def zorderBy(df: DataFrame, colA: String, colB: String, bits: Int,
      numPartitions: Int): DataFrame =
    df.withColumn("_z", mortonCode(col(colA), col(colB), bits))
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}
