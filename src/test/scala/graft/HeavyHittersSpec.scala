package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters
import graft.operators.HeavyHitters.MisraGries

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  test("heavyHitters returns exactly the keys at/above threshold with exact counts") {
    // 3 hot keys, 200 cold keys; n = 3*100 + 200 = 500; capacity 64
    // satisfies 64+1 > 500/25.
    val rows = Seq.fill(100)("hot_a") ++ Seq.fill(100)("hot_b") ++
      Seq.fill(100)("hot_c") ++ (1 to 200).map(i => s"cold_$i")
    val df = rows.toDF("k")
    val out = HeavyHitters.heavyHitters(df, "k", minCount = 25L, capacity = 64)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("hot_a", 100L), ("hot_b", 100L), ("hot_c", 100L)))
  }

  test("null keys are ignored, threshold is inclusive") {
    val df = (Seq.fill(10)(Some("x")) ++ Seq.fill(9)(Some("y")) ++
      Seq.fill(3)(Option.empty[String])).toDF("k")
    val out = HeavyHitters.heavyHitters(df, "k", minCount = 10L, capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("x", 10L)))
  }

  test("capacityFor scales with n so the guarantee holds at any size") {
    import graft.operators.HeavyHitters.capacityFor
    assert(capacityFor(15000L, 17L) === 883)
    assert(capacityFor(150000L, 17L) === 8824)   // 10x data -> 10x capacity
    assert(capacityFor(10L, 17L) === 64)         // floor for tiny inputs
    // The guarantee inequality holds: capacity + 1 > n / minCount.
    Seq((15000L, 17L), (150000L, 17L), (1000000L, 3L)).foreach { case (n, t) =>
      assert((capacityFor(n, t) + 1).toDouble > n.toDouble / t, s"n=$n t=$t")
    }
    // Derived capacity recovers ALL heavy keys where a fixed small k
    // loses them (the r5 sf0.1 regression, shrunk): 400 keys x 25 rows.
    val rows = (1 to 400).flatMap(i => Seq.fill(25)(s"k$i"))
    val df = rows.toDF("k").repartition(8)
    val full = HeavyHitters
      .heavyHitters(df, "k", minCount = 25L, capacity = capacityFor(rows.size, 25L))
      .count()
    assert(full === 400L)
  }

  test("sketch guarantee: every key with count > n/(k+1) survives 300 random streams") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { trial =>
      val k = 1 + rnd.nextInt(12)
      val n = 50 + rnd.nextInt(400)
      // Zipf-ish stream: small universe so some keys genuinely exceed
      // the n/(k+1) survival bound.
      val universe = 1 + rnd.nextInt(25)
      val stream = Seq.fill(n)(s"k${math.min(rnd.nextInt(universe), rnd.nextInt(universe))}")
      val mg = new MisraGries(k)
      // Simulate distributed execution: partition the stream, reduce
      // each partition, merge partials in random order.
      val parts = stream.grouped(1 + rnd.nextInt(40)).toSeq
      val partials = parts.map(p => p.foldLeft(mg.zero)(mg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(mg.zero)(mg.merge)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val bound = n.toDouble / (k + 1)
      exact.foreach { case (key, c) =>
        if (c > bound)
          assert(merged.contains(key),
            s"trial $trial: key $key count=$c > bound=$bound dropped; sketch=$merged")
        // Counts never overestimate truth.
        merged.get(key).foreach(est => assert(est <= c,
          s"trial $trial: est $est > true $c for $key"))
      }
      assert(merged.size <= k, s"trial $trial: size ${merged.size} > k=$k")
    }
  }

  test("candidateKeys runs the sketch distributed and under-counts only") {
    val rows = Seq.fill(60)("hot") ++ (1 to 50).map(i => s"c$i")
    val df = rows.toDF("k").repartition(8)
    val cands = HeavyHitters.candidateKeys(df, "k", capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(cands.contains("hot"), s"hot key missing from $cands")
    assert(cands("hot") <= 60L)
    assert(cands.size <= 16)
  }
}
