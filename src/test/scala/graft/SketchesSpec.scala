package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Mergeable HLL distinct-count sketches (SURVEY §7.6 beyond-parity:
  * constant-size mergeable state is the 100 TB distinct-count form). */
class SketchesSpec extends SparkTestBase {

  // Registry.T normalizes events.ts to nanos BIGINT whatever precision
  // the driver parquet carries (NANOS through r8, MICROS from r9).
  private lazy val events = graft.queries.Registry
    .T(spark, "/root/testdata/sf0.001", "events")
    .select(expr("(ts div 1000000000) div 86400").cast("long").as("day"),
      col("user_id"), col("event_type"))

  test("per-group sketch estimates land within the HLL error bound") {
    val g = Sketches.groupSketches(events, "event_type", "user_id")
      .withColumn("est", hll_sketch_estimate(col("hll_sketch")))
      .collect()
    assert(g.nonEmpty)
    val bound = Sketches.hllBound(12)
    g.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct")
      val est = r.getAs[Long]("est")
      assert(math.abs(est - exact) <= exact * bound,
        s"${r.getAs[String]("event_type")}: est=$est exact=$exact")
    }
  }

  test("union of per-group sketches estimates the GLOBAL cardinality") {
    // The mergeability claim itself: sketches built per group, merged
    // after the fact, must estimate the distinct count over the union of
    // the groups — without re-reading the base table.
    val perType = Sketches.groupSketches(events, "event_type", "user_id")
    val approx = Sketches.unionEstimate(perType).head().getAs[Long]("approx_distinct")
    val exact = events.agg(count_distinct(col("user_id"))).head().getLong(0)
    assert(math.abs(approx - exact) <= exact * Sketches.hllBound(12),
      s"union est=$approx exact=$exact")
  }

  test("sliding 7-day sketch merge agrees with the exact range-join form") {
    val exact = Sketches.slidingDistinctExact(events, "day", "user_id", 7)
    val approx = Sketches.slidingDistinct(events, "day", "user_id", 7)
    val joined = exact.join(approx, Seq("day")).collect()
    val nDays = events.select("day").distinct().count()
    assert(joined.length == nDays, s"${joined.length} rows vs $nDays days")
    val bound = Sketches.hllBound(12)
    joined.foreach { r =>
      val e = r.getAs[Long]("exact_distinct")
      val a = r.getAs[Long]("approx_distinct")
      assert(math.abs(a - e) <= e * bound, s"day ${r.getAs[Long]("day")}: $a vs $e")
    }
    // First day's window covers only itself: sliding must equal daily.
    val firstDay = joined.map(r => r.getAs[Long]("day")).min
    val d0exact = events.filter(col("day") === firstDay)
      .agg(count_distinct(col("user_id"))).head().getLong(0)
    val d0 = joined.find(_.getAs[Long]("day") == firstDay).get
    assert(d0.getAs[Long]("exact_distinct") == d0exact)
  }

  test("hllKeysetCompare bounds the symmetric difference of drifted key sets") {
    import spark.implicits._
    // 1..1000 vs 1..1000 minus multiples of 11 plus 3 extras: |A∆B| =
    // 90 dropped + 3 added = 93. At ~1000 keys the lgK=12 sketch is
    // already estimating (~±1.6%), so assert the recon contract — every
    // estimate within the bound the gate uses, sym-diff error bounded
    // by the compounded per-estimate error — not bit-exactness.
    val a = (1L to 1000L).toDF("k")
    val b = (1L to 1000L).filter(_ % 11 != 0).map(identity).toDF("k")
      .union(Seq(2001L, 2002L, 2003L).toDF("k"))
    val r = graft.validation.TableDiff.hllKeysetCompare(a, b, "k").head()
    val bound = Sketches.hllBound(12)
    assert(math.abs(r.getAs[Long]("est_a") - 1000L) <= 1000 * bound)
    assert(math.abs(r.getAs[Long]("est_b") - 913L) <= 913 * bound)
    assert(math.abs(r.getAs[Long]("est_union") - 1003L) <= 1003 * bound)
    assert(math.abs(r.getAs[Long]("est_sym_diff") - 93L) <= (1000 + 913) * bound)
  }

  test("daily sketch aggregate builds map-side partials (one shuffle)") {
    // The scan-side reduction is the whole scale story: raw events must
    // collapse to per-day sketches BEFORE the exchange.
    val daily = events.groupBy("day")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("s"))
    val plan = daily.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial_hll_sketch_agg")
      || "(?i)objecthashaggregate.*partial".r.findFirstIn(plan).isDefined,
      s"no partial aggregation before the exchange:\n$plan")
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"daily sketch rollup must be ONE shuffle:\n$plan")
  }

  test("histogram quantile sketch: halves merge cell-for-cell into the whole") {
    import spark.implicits._
    import graft.operators.HistQuantile
    val xs = (0 until 400).map(i => ((i * 37 + 11) % 1000).toDouble).toDF("x")
    val whole = HistQuantile.build(xs, "x", 0.0, 1000.0, 16)
    val odd = xs.filter((col("x").cast("int") % 2) === 1)
    val even = xs.filter((col("x").cast("int") % 2) === 0)
    val m2 = HistQuantile.merge(
      HistQuantile.build(odd, "x", 0.0, 1000.0, 16),
      HistQuantile.build(even, "x", 0.0, 1000.0, 16))
    val a = whole.orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val b = m2.orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("histogram quantile estimates stay within one bin width on uniform data") {
    import spark.implicits._
    import graft.operators.HistQuantile
    val xs = (0 until 1000).map(_.toDouble).toDF("x")
    val hist = HistQuantile.build(xs, "x", 0.0, 999.0, 20)
    val est = HistQuantile.estimate(hist, 0.0, 999.0, 20, Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val width = 999.0 / 20
    Seq(0.25, 0.5, 0.75).foreach { q =>
      val exact = q * 999.0
      assert(math.abs(est(q) - exact) <= width, s"q=$q est=${est(q)} exact=$exact")
    }
  }

  test("histogram quantile build clamps out-of-range values into edge bins") {
    import spark.implicits._
    import graft.operators.HistQuantile
    val xs = Seq(-50.0, 0.0, 5.0, 9.9, 200.0).toDF("x")
    val bins = HistQuantile.build(xs, "x", 0.0, 10.0, 10)
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(bins.head._1 == 0 && bins.head._2 == 2L) // -50 clamps down, 0 lands in bin 0
    assert(bins.last._1 == 9 && bins.last._2 == 2L) // 9.9 in bin 9, 200 clamps up
  }

  test("intersection estimates recover known overlaps, clamp disjoint pairs at 0") {
    import spark.implicits._
    // A = 0..99, B = 50..149 (|A∩B| = 50), C = 1000..1049 (disjoint from
    // both). HLL is effectively exact at these cardinalities, so the
    // inclusion-exclusion estimates must land on the true overlaps.
    val rows = ((0 until 100).map(("A", _)) ++ (50 until 150).map(("B", _)) ++
      (1000 until 1050).map(("C", _))).toDF("grp", "k")
    val sk = Sketches.groupSketches(rows, "grp", "k")
    val est = Sketches.intersectEstimates(sk, "grp")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(est.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(est(("A", "B")) == 50L, s"A∩B ${est(("A", "B"))}")
    assert(est(("A", "C")) == 0L)
    assert(est(("B", "C")) == 0L)
  }
}
