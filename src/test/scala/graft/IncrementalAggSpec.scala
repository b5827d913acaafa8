package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.{Add, TakeMax, TakeMin}

class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private val measures = Seq("cnt" -> Add, "total" -> Add,
    "lo" -> TakeMin, "hi" -> TakeMax)

  private def summarize(df: DataFrame): DataFrame =
    df.groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("total"),
      min("v").as("lo"), max("v").as("hi"))

  private def canon(df: DataFrame): Seq[(String, Long, Long, Long, Long)] =
    df.select("k", "cnt", "total", "lo", "hi").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("merge(state(base), state(delta)) equals state(base UNION delta) on random data") {
    val r = new scala.util.Random(5)
    val all = (1 to 2000).map(_ => (s"k${r.nextInt(40)}", r.nextLong(1000) - 300))
    val (base, delta) = all.partition(_ => r.nextBoolean())
    val merged = IncrementalAgg.merge(
      summarize(base.toDF("k", "v")), summarize(delta.toDF("k", "v")),
      Seq("k"), measures)
    assert(canon(merged) === canon(summarize(all.toDF("k", "v"))))
  }

  test("mergeAll is order-independent and handles keys unique to one batch") {
    val b1 = summarize(Seq(("a", 1L), ("b", 5L)).toDF("k", "v"))
    val b2 = summarize(Seq(("b", -2L), ("c", 7L)).toDF("k", "v"))
    val b3 = summarize(Seq(("c", 9L), ("d", 0L)).toDF("k", "v"))
    val abc = IncrementalAgg.mergeAll(Seq(b1, b2, b3), Seq("k"), measures)
    val cba = IncrementalAgg.mergeAll(Seq(b3, b2, b1), Seq("k"), measures)
    assert(canon(abc) === canon(cba))
    assert(canon(abc) === canon(summarize(
      Seq(("a", 1L), ("b", 5L), ("b", -2L), ("c", 7L), ("c", 9L), ("d", 0L))
        .toDF("k", "v"))))
  }

  test("an empty delta is a no-op merge") {
    val base = summarize(Seq(("a", 3L), ("b", 4L)).toDF("k", "v"))
    val empty = summarize(Seq.empty[(String, Long)].toDF("k", "v"))
    assert(canon(IncrementalAgg.merge(base, empty, Seq("k"), measures)) === canon(base))
  }
}
