package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Targeted stress probe: times `hyperplanePairs` uncapped vs capped on
  * the stress corpus embeddings — the quantitative record behind the r9
  * STRESS finding that fixed 2^bandBits buckets make the pair expansion
  * quadratic in the corpus, and that the representative-star cap
  * restores near-linear cost. Prints one JSON line per variant. */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/stressdata"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val sigs = emb.select(col("vec_id"),
      Similarity.hyperplaneSig(col("embedding"), 64, 16).as("rp_sig"))
      .localCheckpoint(true)
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$label","pairs":$n,"sec":$sec%.2f}""")
    }
    time("hyperplane_uncapped") {
      Similarity.hyperplanePairs(sigs, "vec_id", "rp_sig", 16, 4, 4)
    }
    time("hyperplane_capped_64x8") {
      Similarity.hyperplanePairs(sigs, "vec_id", "rp_sig", 16, 4, 4,
        maxBucket = 64, reps = 8)
    }
    spark.stop()
  }
}
