package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway experiment runner for optimization-round hypotheses. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def phase(name: String)(f: => Unit): Unit = {
      val j0 = jobs.get; val t0 = System.nanoTime()
      f
      Thread.sleep(200)
      println(f"[phase] $name%-28s jobs=${jobs.get - j0}%4d wall=${(System.nanoTime() - t0) / 1e9}%7.2f")
    }
    val dir = "/root/testdata/sf0.1"
    import graft.queries.Registry.T
    import graft.llm.{Dedup, Similarity}
    val emb = T(spark, dir, "embeddings")
    val cents = emb.filter(col("vec_id") < 8 || col("vec_id") % 2500 === 0)
    var pairs: org.apache.spark.sql.DataFrame = null
    phase("nearDupPairs+count") {
      pairs = Similarity.nearDupPairs(emb, cents, "vec_id", "embedding", 0.35)
        .select("id_a", "id_b").localCheckpoint(true)
    }
    var comps: org.apache.spark.sql.DataFrame = null
    phase("cc-inline") {
      // Inline copy of connectedComponents with per-round phases.
      val edges = pairs
        .select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct()
        .repartition(col("src"))
        .persist()
      var labels: org.apache.spark.sql.DataFrame = null
      phase("cc:init") {
        labels = edges.select(col("src").as("id")).distinct()
          .withColumn("component", col("id"))
          .localCheckpoint(true)
      }
      var it = 0
      var converged = labels.isEmpty
      while (!converged && it < 20) {
        val nbrMin = edges
          .join(labels.select(col("id").as("src"), col("component").as("c")), "src")
          .groupBy(col("dst").as("id")).agg(min(col("c")).as("nbr_min"))
        val folded = labels.alias("l")
          .join(nbrMin.alias("n"), Seq("id"), "left")
          .select(col("id"), col("l.component").as("_prev"),
            least(col("l.component"),
              coalesce(col("n.nbr_min"), col("l.component"))).as("_c1"))
        val lowered =
          if (it < 1) folded.select(col("id"), col("_prev"), col("_c1").as("_c2"))
          else folded
            .join(labels.select(col("id").as("_jid"), col("component").as("_jc")),
              col("_c1") === col("_jid"), "left")
            .select(col("id"), col("_prev"),
              least(col("_c1"), coalesce(col("_jc"), col("_c1"))).as("_c2"))
        var next: org.apache.spark.sql.DataFrame = null
        phase(s"cc:round$it-ckpt") {
          next = lowered
            .select(col("id"), col("_c2").as("component"),
              (col("_c2") < col("_prev")).as("changed"))
            .localCheckpoint(true)
        }
        phase(s"cc:round$it-isEmpty") {
          converged = next.filter(col("changed")).isEmpty
        }
        labels.unpersist()
        labels = next
        it += 1
      }
      edges.unpersist()
      comps = labels.select("id", "component")
    }
    phase("dedupClusters rest") {
      val sizes = comps.groupBy("component").agg(count(lit(1)).as("cluster_size"))
      val out = emb.select(col("vec_id"))
        .join(comps.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("component"), col("vec_id")).as("component"))
        .join(sizes, Seq("component"), "left")
      out.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
