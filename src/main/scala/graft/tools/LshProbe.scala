package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextOps}
import graft.queries.Registry.T

/** Stage-level CPU attribution for the MinHash-LSH chain (guide §1):
  * QueryMetrics showed the signature chain costs ~15 executor-CPU-s for
  * 5000 sf0.1 docs — ~3 ms/doc — before any candidate join runs. This
  * probe times each prefix of the chain under a noop write (so nothing
  * is pruned) and prints wall + executor CPU per stage, isolating
  * tokenize vs shingle-build vs md5 vs window-min vs banding.
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.range(1000).count() catch { case _: Throwable => }

    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
    }
    spark.sparkContext.addSparkListener(listener)

    def time(label: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to 3).map { _ =>
        cpuNs.set(0)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (w, cpuNs.get / 1e9)
      }
      val best = runs.minBy(_._1)
      println(f"""{"probe":"$label","wall":${best._1}%.3f,"cpu":${best._2}%.3f,""" +
        f""""walls":${runs.map(r => f"${r._1}%.2f").mkString("[", ",", "]")}}""")
    }

    def docs = T(spark, dir, "documents").select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism * 2)

    time("scan_only")(docs)
    time("tokens")(docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t")))
    time("shingle_nodedup")(Dedup.shingleArray(docs, "doc_id", "text", 3, dedup = false))
    time("shingle_arr")(Dedup.shingleArray(docs, "doc_id", "text", 3))
    time("md5_digests")(Dedup.shingleArray(docs, "doc_id", "text", 3)
      .withColumn("_m1", expr("transform(shingles, s -> md5(s))"))
      .withColumn("_m2", expr("transform(shingles, s -> md5(concat('#', s)))"))
      .select(col("doc_id"), col("_m1"), col("_m2")))
    time("signatures")(Dedup.minhashSignaturesNative(
      Dedup.shingleArray(docs, "doc_id", "text", 3), "doc_id", 8))
    time("bands")(Dedup.lshBands(Dedup.minhashSignaturesNative(
      Dedup.shingleArray(docs, "doc_id", "text", 3), "doc_id", 8), "doc_id", 8, 2))
    def bandsDf = Dedup.lshBands(Dedup.minhashSignaturesNative(
      Dedup.shingleArray(docs, "doc_id", "text", 3), "doc_id", 8), "doc_id", 8, 2)
    time("buckets")(bandsDf.groupBy("band", "band_hash")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1))
    time("expand_hof")(bandsDf.groupBy("band", "band_hash")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids,
          |  (a, i) -> transform(slice(ids, i + 2, size(ids)),
          |            b -> struct(a AS id_a, b AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b")))
    time("pairs")(Dedup.candidatePairs(bandsDf, "doc_id"))
    time("bucket_histogram")(bandsDf.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("n")).groupBy("n").agg(count(lit(1)).as("buckets")))
    time("hist_after_repart")(bandsDf.repartition(64)
      .groupBy("band", "band_hash").agg(count(lit(1)).as("n"))
      .groupBy("n").agg(count(lit(1)).as("buckets")))
    time("buckets_from_ckpt") {
      val b = bandsDf.localCheckpoint(true)
      b.groupBy("band", "band_hash")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
    }
    def docsN(n: Int) = T(spark, dir, "documents").select("doc_id", "text")
      .repartition(n)
    def bucketsOf(d: DataFrame) = {
      val b = Dedup.lshBands(Dedup.minhashSignaturesNative(
        Dedup.shingleArray(d, "doc_id", "text", 3), "doc_id", 8), "doc_id", 8, 2)
      b.groupBy("band", "band_hash")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
    }
    time("buckets_m64")(bucketsOf(docsN(64)))
    time("buckets_m32")(bucketsOf(docsN(32)))
    time("buckets_m8")(bucketsOf(docsN(8)))
    spark.conf.set("spark.shuffle.sort.bypassMergeThreshold", 1)
    time("buckets_m64_sortshuf")(bucketsOf(docsN(64)))
    spark.conf.set("spark.shuffle.sort.bypassMergeThreshold", 200)
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    time("buckets_m64_r8")(bucketsOf(docsN(64)))
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    time("bands_sum_consumer")(bandsDf.select(
      (xxhash64(col("band_hash")).cast("double") + col("band") + col("doc_id")).as("h"))
      .agg(sum(col("h"))))
    time("sig_sum_consumer")(Dedup.minhashSignaturesNative(
        Dedup.shingleArray(docs, "doc_id", "text", 3), "doc_id", 8)
      .select((0 until 8).map(j => xxhash64(col(s"h$j")).cast("double"))
        .reduce(_ + _).as("h"))
      .agg(sum(col("h"))))
    spark.stop()
  }
}
