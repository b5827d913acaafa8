package graft

import org.apache.spark.sql.functions._

import graft.operators.Windowed

class WindowedSpec extends SparkTestBase {
  import spark.implicits._

  test("keepLatest keeps exactly the newest row per key with deterministic ties") {
    val df = Seq(
      ("k1", 1L, "old"), ("k1", 3L, "new"), ("k1", 2L, "mid"),
      ("k2", 5L, "only"),
      ("k3", 7L, "tie_a"), ("k3", 7L, "tie_b")).toDF("key", "v", "tag")
    val out = Windowed.keepLatest(df, Seq("key"), col("v"), tieBreak = Seq(col("tag")))
      .orderBy("key").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ===
      Seq(("k1", "new"), ("k2", "only"), ("k3", "tie_b"))) // desc tie → "tie_b"
  }

  test("asofJoin matches latest at-or-before right row, NULL when none precedes") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 205L), (3L, "u2", 50L))
      .toDF("id", "user", "ts")
    val right = Seq(("u1", 100L, "a"), ("u1", 200L, "b"), ("u2", 60L, "late"))
      .toDF("user", "rts", "payload")
    val out = Windowed.asofJoin(left, right, Seq("user"),
      leftTs = "ts", rightTs = "rts", rightPayload = Seq("payload"))
      .orderBy("id").collect()
    // id=1: right row AT ts=100 matches (inclusive); id=2: latest before
    // 205 is "b"; id=3: the only u2 right row is later → NULL.
    assert(out.map(_.getAs[String]("asof_payload")).toSeq === Seq("a", "b", null))
  }

  test("asofJoin tieBreak totalizes right rows sharing (key, ts): greatest wins") {
    val left = Seq((1L, "u1", 100L)).toDF("id", "user", "ts")
    // Three right rows at the SAME (user, ts): the survivor must be the
    // greatest-tieBreak one regardless of input/partition order.
    val right = Seq(("u1", 100L, "low", 1L), ("u1", 100L, "high", 3L),
      ("u1", 100L, "mid", 2L)).toDF("user", "rts", "payload", "seq")
    (1 to 5).foreach { seed =>
      val shuffled = right.orderBy(rand(seed)).repartition(4)
      val out = Windowed.asofJoin(left, shuffled, Seq("user"),
        leftTs = "ts", rightTs = "rts", rightPayload = Seq("payload"),
        tieBreak = Seq("seq"))
        .collect()
      assert(out.map(_.getAs[String]("asof_payload")).toSeq === Seq("high"))
    }
  }

  test("asofJoin tieBreak columns need not exist on the left frame") {
    // Left has no "seq" column; the tieBreak contract is RIGHT-frame
    // columns only (ADVICE r4: they used to be silently NULL).
    val left = Seq((1L, "u1", 10L)).toDF("id", "user", "ts")
    val right = Seq(("u1", 5L, "a", 9L), ("u1", 5L, "b", 8L))
      .toDF("user", "rts", "payload", "seq")
    val out = Windowed.asofJoin(left, right, Seq("user"),
      leftTs = "ts", rightTs = "rts", rightPayload = Seq("payload"),
      tieBreak = Seq("seq")).collect()
    assert(out.map(_.getAs[String]("asof_payload")).toSeq === Seq("a"))
  }

  test("sessionize splits strictly on gap > gapSec and numbers sessions per key") {
    val df = Seq(
      ("u1", 0L), ("u1", 1800L),        // gap == gapSec → SAME session
      ("u1", 3601L),                    // gap 1801 > 1800 → new session
      ("u2", 10L)).toDF("user", "sec")
    val out = Windowed.sessionize(df, Seq("user"), "sec", gapSec = 1800L)
      .orderBy("user", "sec").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("u1", 0L, 1L), ("u1", 1800L, 1L), ("u1", 3601L, 2L), ("u2", 10L, 1L)))
  }

  test("sessionize matches a plain-Scala reference on 500 random event streams") {
    val r = new scala.util.Random(13)
    // Random users with random sorted timestamps, gaps straddling 100.
    val rows = (0 until 500).flatMap { u =>
      var t = r.nextInt(50).toLong
      (0 until 1 + r.nextInt(8)).map { _ =>
        val row = (s"u$u", t)
        t += 1 + r.nextInt(200) // gaps 1..200 around gapSec=100
        row
      }
    }
    val df = rows.toDF("user", "sec")
    val got = Windowed.sessionize(df, Seq("user"), "sec", gapSec = 100L)
      .select("user", "sec", "session_id").collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    // Reference: sequential fold per user.
    rows.groupBy(_._1).foreach { case (u, evs) =>
      var sid = 0L; var prev = Long.MinValue
      evs.map(_._2).sorted.foreach { t =>
        if (prev == Long.MinValue || t - prev > 100L) sid += 1
        assert(got((u, t)) === sid, s"user $u ts $t")
        prev = t
      }
    }
  }

  test("sessionize plans both window functions in a single exchange") {
    val df = Seq(("u1", 0L), ("u1", 5L)).toDF("user", "sec")
    val out = Windowed.sessionize(df, Seq("user"), "sec", gapSec = 1L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one shuffle, plan:\n$plan")
  }

  test("transitionMatrix counts within-session pairs only, rows sum to 1") {
    // u1: a→b→c in one session, then (gap) c alone — the c after the gap
    // contributes no outgoing transition. u2: a→b twice in one session.
    val df = Seq(
      ("u1", 0L, "a"), ("u1", 10L, "b"), ("u1", 20L, "c"),
      ("u1", 5000L, "c"),
      ("u2", 0L, "a"), ("u2", 1L, "b"), ("u2", 2L, "a"), ("u2", 3L, "b")
    ).toDF("user", "sec", "etype")
    val out = Windowed.transitionMatrix(df, Seq("user"), "sec", "etype",
        gapSec = 1800L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // transitions: u1 a→b, b→c; u2 a→b ×2, b→a ⇒ a→b:3, b→c:1, b→a:1
    assert(out(("a", "b")).getAs[Long]("n_trans") === 3L)
    assert(out(("a", "b")).getAs[Double]("p") === 1.0)
    assert(out(("b", "c")).getAs[Long]("n_trans") === 1L)
    assert(out(("b", "a")).getAs[Long]("n_trans") === 1L)
    assert(out(("b", "c")).getAs[Double]("p") === 0.5)
    assert(out.keySet === Set(("a", "b"), ("b", "c"), ("b", "a")))
    // no cross-gap c→c transition
    assert(!out.contains(("c", "c")))
  }

  test("transitionMatrix: sessionize + leads share one user-keyed exchange") {
    val df = Seq(("u1", 0L, "a"), ("u1", 5L, "b")).toDF("user", "sec", "etype")
    val out = Windowed.transitionMatrix(df, Seq("user"), "sec", "etype", gapSec = 10L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val userExchanges = "Exchange hashpartitioning\\(user".r.findAllIn(plan).length
    assert(userExchanges === 1,
      s"lead must ride the sessionizer's exchange, plan:\n$plan")
  }

  test("ewma matches the scalar recursion and truncates at lookback") {
    val vals = Seq(4.0, 8.0, 2.0, 6.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("u", i.toLong, v) }
      .toDF("user", "seq", "v")
    val out = Windowed.ewma(df, Seq("user"), Seq("seq"), "v", lookback = 3)
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("ewma")).toMap
    // reference: fold acc*0.5 + x*0.5 over the trailing-3 window
    for (i <- vals.indices) {
      val window = vals.slice(math.max(0, i - 2), i + 1)
      val ref = window.foldLeft(0.0)((acc, x) => acc * 0.5 + x * 0.5)
      assert(out(i.toLong) === ref, s"row $i")
    }
    // truncation: row 4 ignores rows 0-1 entirely
    val full = vals.foldLeft(0.0)((acc, x) => acc * 0.5 + x * 0.5)
    assert(out(4L) !== full)
  }

  test("ewma raises loudly on a null measurement instead of shrinking the frame") {
    val df = Seq(("u", 0L, Some(4.0)), ("u", 1L, None), ("u", 2L, Some(2.0)))
      .toDF("user", "seq", "v")
    val e = intercept[Exception] {
      Windowed.ewma(df, Seq("user"), Seq("seq"), "v", lookback = 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("ewma: null value")), s"got: $e")
  }

  test("rollingZscore flags a spike, matches a Scala reference, nulls before minRows") {
    // 9 steady readings then one spike, per user; values are exact ints.
    val vals = Seq(10L, 12L, 11L, 10L, 12L, 11L, 10L, 12L, 11L, 500L)
    val df = vals.zipWithIndex.map { case (v, i) => ("u1", i.toLong, v) }
      .toDF("user", "sec", "v")
    val out = Windowed.rollingZscore(df, Seq("user"), Seq(col("sec")), col("v"),
      lookback = 20, minRows = 5, threshold = 2.5)
      .orderBy("sec")
      .select("sec", "z", "is_anomaly").collect()
    // Rows 0-3: fewer than minRows in the window → z null, not anomalous.
    out.take(4).foreach { r => assert(r.isNullAt(1)); assert(!r.getBoolean(2)) }
    // The spike is the only anomaly.
    assert(out.map(r => r.getBoolean(2)).toSeq ===
      (0 until 9).map(_ => false) :+ true)
    // z of the spike matches the textbook sample formula computed in Scala.
    val w = vals // all 10 fit in the 20-row lookback
    val n = w.size.toDouble
    val s1 = w.sum.toDouble; val s2 = w.map(x => x * x).sum.toDouble
    val std = math.sqrt((s2 - s1 * s1 / n) / (n - 1.0))
    val expected = (500.0 - s1 / n) / std
    assert(math.abs(out.last.getDouble(1) - expected) < 1e-12)
  }

  test("rollingZscore: constant window yields null z (std = 0), never NaN") {
    val df = (0 until 8).map(i => ("u", i.toLong, 7L)).toDF("user", "sec", "v")
    val out = Windowed.rollingZscore(df, Seq("user"), Seq(col("sec")), col("v"))
      .select("z", "is_anomaly").collect()
    out.foreach { r => assert(r.isNullAt(0)); assert(!r.getBoolean(1)) }
  }

  test("cohortRetention: exact matrix on a hand-computed event log") {
    import graft.operators.Retention
    // Cohort week 0: users a,b (a returns week 1, b never).
    // Cohort week 1: user c (returns weeks 2 and 3).
    val ev = Seq(
      ("a", 0L), ("a", 0L), ("b", 0L), ("a", 1L),
      ("c", 1L), ("c", 2L), ("c", 3L)).toDF("user_id", "week")
    val got = Retention.cohortRetention(ev, "user_id", col("week"))
      .orderBy("cohort_bucket", "offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      (0L, 0L, 2L, 2L, 1.0),  // both cohort-0 users active at offset 0
      (0L, 1L, 1L, 2L, 0.5),  // only a returns
      (1L, 0L, 1L, 1L, 1.0),
      (1L, 1L, 1L, 1L, 1.0),
      (1L, 2L, 1L, 1L, 1.0)))
  }
}
