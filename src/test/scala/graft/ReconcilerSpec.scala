package graft

import org.apache.spark.sql.functions._

import graft.validation.Reconciler

/** MigrationReconciler semantics (`reconciliation.py:39-180`). */
class ReconcilerSpec extends SparkTestBase {
  import spark.implicits._

  test("compareRowCounts exact equality") {
    val a = Seq(1, 2, 3).toDF("v")
    assert(Reconciler.compareRowCounts(a, a).matched)
    val r = Reconciler.compareRowCounts(a, a.limit(2))
    assert(!r.matched && r.difference === 1)
  }

  test("compareAggregates within relative tolerance in one pass") {
    val a = Seq((100.0, 10.0), (200.0, 20.0)).toDF("x", "y")
    val b = Seq((100.0, 10.0), (200.005, 20.0)).toDF("x", "y") // x off by ~1.7e-5
    val results = Reconciler.compareAggregates(a, b, Seq("x", "y"), tolerance = 1e-4)
    assert(results.forall(_.withinTolerance))
    val strict = Reconciler.compareAggregates(a, b, Seq("x"), tolerance = 1e-6)
    assert(!strict.head.withinTolerance)
  }

  test("distributionDiff is a join-based diff with coalesced zeros") {
    val a = Seq("O", "O", "F").toDF("st")
    val b = Seq("O", "P").toDF("st")
    val diff = Reconciler.distributionDiff(a, b, "st").orderBy("value").collect()
    assert(diff.map(_.getAs[String]("value")).toSeq === Seq("F", "O", "P"))
    val f = diff(0)
    assert(f.getAs[Long]("source_count") === 1 && f.getAs[Long]("target_count") === 0)
    assert(!f.getAs[Boolean]("matched"))
  }

  test("compareDistributions verdict counts") {
    val a = Seq("O", "O", "F").toDF("st")
    val b = Seq("O", "P").toDF("st")
    val r = Reconciler.compareDistributions(a, b, "st")
    assert(!r.matched && r.valuesOnlyInSource === 1 && r.valuesOnlyInTarget === 1
      && r.countMismatches === 3)
    assert(Reconciler.compareDistributions(a, a, "st").matched)
  }

  test("compareSchemas ignores _-prefixed metadata columns") {
    val a = Seq((1, "x")).toDF("id", "v").withColumn("_batch_id", lit(1L))
    val b = Seq((1, "x")).toDF("id", "v").withColumn("_cleaned_timestamp", lit("t"))
    assert(Reconciler.compareSchemas(a, b).matched)
    val r = Reconciler.compareSchemas(a.drop("v"), b)
    assert(!r.matched && r.onlyInTarget === Seq("v"))
  }

  test("generateReport rolls up pass/fail") {
    val a = Seq(1, 2).toDF("v")
    val report = Reconciler.generateReport("dim_policy",
      Reconciler.compareRowCounts(a, a),
      Reconciler.compareAggregates(a, a, Seq("v")),
      Seq(Reconciler.compareDistributions(a, a, "v")),
      Reconciler.compareSchemas(a, a))
    assert(report.contains("OVERALL: PASS"))
    val bad = Reconciler.generateReport("dim_policy",
      Reconciler.compareRowCounts(a, a.limit(1)), Nil, Nil,
      Reconciler.compareSchemas(a, a))
    assert(bad.contains("OVERALL: FAIL") && bad.contains("MISMATCH"))
  }
}
