package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Plan-shape regression guards for the scale claims PLANS.md makes:
  * filters reach the parquet scan as PushedFilters, and projections
  * prune the scan's ReadSchema. If a refactor breaks either, a 100 TB
  * scan silently reads everything — these tests make that a local red.
  */
class PlanGuardsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_planguard").toString
    (1 to 1000).map(i => (i.toLong, s"name$i", i % 7, i * 1.5))
      .toDF("id", "name", "bucket", "amount")
      .write.mode("overwrite").parquet(s"$d/t.parquet")
    d
  }

  test("comparison filters are pushed down to the parquet scan") {
    val df = spark.read.parquet(s"$dir/t.parquet")
      .filter(col("bucket") === 3 && col("id") > 10L)
      .select("id", "bucket")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), s"no pushdown section:\n$plan")
    assert(plan.contains("EqualTo(bucket,3)") && plan.contains("GreaterThan(id,10)"),
      s"expected both predicates pushed:\n$plan")
  }

  test("narrow projection prunes the scan's ReadSchema to the used columns") {
    val df = spark.read.parquet(s"$dir/t.parquet")
      .groupBy("bucket").agg(sum(col("amount").cast("decimal(18,2)")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("bucket") && readSchema.contains("amount"),
      s"used columns missing from scan:\n$readSchema")
    assert(!readSchema.contains("name") && !readSchema.contains("id"),
      s"unused columns not pruned:\n$readSchema")
  }
}
