package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection via MAD (median absolute
  * deviation) — the DQ-style screen that survives heavy tails where a
  * mean/stddev z-score is dragged by the outliers it is hunting.
  *
  * Medians are NEAREST-RANK (lower median: the value at rank
  * ⌊(n+1)/2⌋ in value order) — an actual corpus value, engine-portable
  * by construction, where interpolated medians re-open float territory.
  * A row is an outlier when |x − med| > k·mad with k defaulting to
  * 4.4478 ≈ 3σ·1.4826 (the normal-consistency constant folded in).
  *
  * Cost: two window passes per group (value rank, deviation rank) plus
  * one aggregate — exact medians need a per-group sort. At sketch-scale
  * budgets use [[HistQuantile]] instead: bounded error, one pass,
  * mergeable. This operator is the exact twin for group counts that fit
  * a sort (DQ reports, per-source audits), not the 100 TB hot path.
  */
object RobustStats {

  /** Per-group (n, med, mad, n_outliers) for `valueCol` grouped by
    * `groupCol`. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 4.4478): DataFrame = {
    val wOrd = Window.partitionBy(groupCol).orderBy("x")
    val wAll = Window.partitionBy(groupCol)
    val ranked = df.select(col(groupCol), col(valueCol).cast("double").as("x"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
    val medRank = floor((col("n") + 1) / lit(2.0)).cast("long")
    val med = ranked.filter(col("rn") === medRank)
      .select(col(groupCol), col("x").as("med"))
    val dev = ranked.join(med, groupCol)
      .withColumn("dev", abs(col("x") - col("med")))
    val wDev = Window.partitionBy(groupCol).orderBy("dev")
    val mad = dev.withColumn("rn2", row_number().over(wDev))
      .filter(col("rn2") === medRank)
      .select(col(groupCol), col("dev").as("mad"))
    dev.join(mad, groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .cast("bigint").as("n_outliers"))
  }
}
