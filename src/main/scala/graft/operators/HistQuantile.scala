package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable equi-width histogram quantile sketch — the quantile
  * complement to the sketch family (HLL distinct, Count-Min frequency,
  * Misra-Gries top-k): a fixed `nBins`-cell counter vector whose cells
  * sum cell-wise under union, so shards build locally and merge
  * associatively; quantiles read off the cumulative counts with
  * within-bin linear interpolation, error ≤ one bin width by
  * construction for values inside [lo, hi].
  *
  * The classic accuracy trade vs GK/KLL (`approx_percentile`): bounds
  * must be known up front (one exact min/max pass, or domain knowledge)
  * and error is absolute in VALUE space, not rank space — but the state
  * is a dense constant-size vector any engine can reproduce exactly,
  * merge is a blind vector add (no survivor logic), and the DuckDB
  * oracle replays build AND estimate bit-for-bit, none of which holds
  * for GK summaries. Build is one hash aggregate of ≤ nBins groups
  * (map-side combined); estimation windows over the nBins-row sketch —
  * single-partition by design, the sketch is constant-size.
  *
  * Determinism: bin ids come from one shared floor expression; counts
  * are exact longs; every interpolation step is the same IEEE
  * arithmetic on both engines.
  */
object HistQuantile {

  /** Histogram (bin, cnt) of `valueCol` over [lo, hi]; out-of-range
    * values clamp into the edge bins. */
  def build(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"need hi > lo and bins, got [$lo,$hi] x $nBins")
    df.select(col(valueCol).cast("double").as("x"))
      .select(least(greatest(
          floor(((col("x") - lit(lo)) / lit(hi - lo)) * nBins), lit(0.0)),
        lit(nBins - 1.0)).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise merge of two histograms built with the same bounds. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bin").agg(sum("cnt").as("cnt"))

  /** Estimate quantiles `qs` from a histogram: first bin whose
    * cumulative count reaches q·n, linearly interpolated inside the
    * bin. Returns (q, est_q). */
  def estimate(hist: DataFrame, lo: Double, hi: Double, nBins: Int,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), s"bad quantiles $qs")
    val spark = hist.sparkSession
    import spark.implicits._
    val width = (hi - lo) / nBins
    val wCum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("cumb", col("cum") - col("cnt"))
    val nn = hist.agg(sum("cnt").cast("double").as("n"))
    val wq = Window.partitionBy("q").orderBy("bin")
    cum.crossJoin(broadcast(qs.toDF("q"))).crossJoin(broadcast(nn))
      .filter(col("cum").cast("double") >= col("q") * col("n"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") === 1)
      .select(col("q"),
        (lit(lo) + (col("bin") + (col("q") * col("n") - col("cumb")) / col("cnt")) *
          lit(width)).as("est_q"))
  }
}
