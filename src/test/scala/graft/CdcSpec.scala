package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def log = Seq(
    // k1: plain insert + update → survives with last value
    ("k1", 1L, "I", 10.0), ("k1", 2L, "U", 20.0),
    // k2: deleted mid-history, re-inserted later → survives
    ("k2", 1L, "I", 1.0), ("k2", 2L, "D", 0.0), ("k2", 3L, "I", 3.0),
    // k3: terminal delete → vanishes
    ("k3", 1L, "I", 5.0), ("k3", 2L, "D", 0.0))
    .toDF("k", "seq", "op", "v")

  test("changelog replay: last writer wins, terminal delete removes the key") {
    val out = Cdc.applyChangelog(log, Seq("k"), col("seq"), col("op"), Seq("v"))
      .orderBy("k").collect()
    assert(out.map(_.getAs[String]("k")).toSeq == Seq("k1", "k2"))
    val k1 = out(0)
    assert(k1.getAs[String]("last_op") == "U" && k1.getAs[Double]("v") == 20.0)
    assert(k1.getAs[Long]("n_changes") == 2L)
    val k2 = out(1)
    assert(k2.getAs[String]("last_op") == "I" && k2.getAs[Double]("v") == 3.0)
    assert(k2.getAs[Long]("n_changes") == 3L)
  }

  test("reserved column names are rejected loudly, not silently shadowed") {
    val clash = log.withColumnRenamed("v", "n_changes")
    val ex = intercept[IllegalArgumentException] {
      Cdc.applyChangelog(clash, Seq("k"), col("seq"), col("op"), Seq("n_changes"))
    }
    assert(ex.getMessage.contains("n_changes"))
    val ex2 = intercept[IllegalArgumentException] {
      Cdc.applyChangelog(log.withColumn("__op", lit("x")), Seq("k"),
        col("seq"), col("op"), Seq("v"))
    }
    assert(ex2.getMessage.contains("__op"))
  }

  test("latest-pick and change-count share ONE window exchange") {
    val plan = Cdc.applyChangelog(log, Seq("k"), col("seq"), col("op"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"both window specs must reuse one key partitioning:\n$plan")
  }
}
