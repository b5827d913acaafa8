package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a registry gate's executed plan: `runMain graft.tools.ExplainGate
  * <sfDir> <name>` — the .explain("formatted") loop the plan audits use
  * (PLANS.md evidence), without editing Bench/Verify.
  */
object ExplainGate {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ExplainGate <sfDir> <name>")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    df.collect() // force AQE's final plan
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
