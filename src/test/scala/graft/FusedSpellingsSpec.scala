package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property tests for the round-11 single-scan fusions: each TPC-DS
  * engine spelling that replaced a multi-CTE reference shape must agree
  * ROW-FOR-ROW with the reference spelling IN SPARK on adversarial
  * random data — sparse channels, gap years, all-one-channel cells —
  * beyond the three driver/stress corpora the oracle hash already
  * covers. Seeded generators: failures reproduce.
  */
class FusedSpellingsSpec extends SparkTestBase {

  private def randomSales(seed: Int): DataFrame = {
    val r = new Random(seed)
    import spark.implicits._
    // (brand, mon, channel, rev) with deliberate sparsity: some brands
    // sell in one channel only, some months missing entirely.
    val rows = for {
      b <- 0 until 6
      _ <- 0 until (1 + r.nextInt(40))
    } yield (s"B$b", 1 + r.nextInt(12),
      if (r.nextInt(10) < (if (b % 3 == 0) 10 else 5)) "web" else "store",
      BigDecimal(r.nextInt(100000)) / 100)
    rows.toDF("p_brand", "mon", "channel", "rev")
      .withColumn("rev_u", (col("rev") * 1000000).cast("decimal(38,0)"))
  }

  test("q51 fusion: masked shared-window cumulative == per-channel windows + FULL OUTER") {
    for (seed <- Seq(7, 21, 99)) {
      randomSales(seed).createOrReplaceTempView("fs51")
      val reference = spark.sql(
        """WITH w AS (SELECT p_brand, mon, SUM(rev_u) AS rev_u FROM fs51
          |  WHERE channel = 'web' GROUP BY p_brand, mon),
          |st AS (SELECT p_brand, mon, SUM(rev_u) AS rev_u FROM fs51
          |  WHERE channel = 'store' GROUP BY p_brand, mon),
          |wc AS (SELECT p_brand, mon,
          |  SUM(rev_u) OVER (PARTITION BY p_brand ORDER BY mon
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_u FROM w),
          |sc AS (SELECT p_brand, mon,
          |  SUM(rev_u) OVER (PARTITION BY p_brand ORDER BY mon
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_u FROM st)
          |SELECT coalesce(wc.p_brand, sc.p_brand) AS p_brand,
          |  coalesce(wc.mon, sc.mon) AS mon,
          |  wc.cum_u AS web_cum, sc.cum_u AS store_cum,
          |  coalesce(wc.cum_u, 0) > coalesce(sc.cum_u, 0) AS web_ahead
          |FROM wc FULL OUTER JOIN sc
          |  ON wc.p_brand = sc.p_brand AND wc.mon = sc.mon
          |ORDER BY p_brand, mon""".stripMargin).collect().toSeq
      val fused = spark.sql(
        """WITH g AS (
          |  SELECT p_brand, mon,
          |    SUM(CASE WHEN channel = 'web' THEN rev_u END) AS web_u,
          |    SUM(CASE WHEN channel = 'store' THEN rev_u END) AS store_u
          |  FROM fs51 GROUP BY p_brand, mon),
          |c AS (
          |  SELECT p_brand, mon, web_u, store_u,
          |    SUM(web_u) OVER (PARTITION BY p_brand ORDER BY mon
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wcum,
          |    SUM(store_u) OVER (PARTITION BY p_brand ORDER BY mon
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scum
          |  FROM g)
          |SELECT p_brand, mon,
          |  CASE WHEN web_u IS NOT NULL THEN wcum END AS web_cum,
          |  CASE WHEN store_u IS NOT NULL THEN scum END AS store_cum,
          |  coalesce(CASE WHEN web_u IS NOT NULL THEN wcum END, 0) >
          |    coalesce(CASE WHEN store_u IS NOT NULL THEN scum END, 0)
          |    AS web_ahead
          |FROM c ORDER BY p_brand, mon""".stripMargin).collect().toSeq
      assert(fused.map(_.toString) == reference.map(_.toString),
        s"q51 fusion diverged at seed=$seed")
    }
  }

  test("lead-pairing fusion (q74/q59): lead() == consecutive-period self-join") {
    val r = new Random(41)
    import spark.implicits._
    // customers with GAP years: self-join on y+1 must skip gaps; lead()
    // must agree.
    val rows = for {
      c <- 0 until 50
      y <- 1992 to 1999 if r.nextInt(10) < 6
    } yield (c.toLong, y, BigDecimal(1 + r.nextInt(100000)) / 100)
    rows.toDF("cust", "yr", "tot").createOrReplaceTempView("fs74")
    val reference = spark.sql(
      """SELECT a.cust, a.yr, a.tot AS t1, b.tot AS t2
        |FROM fs74 a JOIN fs74 b
        |  ON a.cust = b.cust AND b.yr = a.yr + 1
        |ORDER BY a.cust, a.yr""".stripMargin).collect().toSeq
    val fused = spark.sql(
      """SELECT cust, yr, tot AS t1, t2 FROM (
        |  SELECT cust, yr, tot,
        |    lead(yr)  OVER (PARTITION BY cust ORDER BY yr) AS y2,
        |    lead(tot) OVER (PARTITION BY cust ORDER BY yr) AS t2
        |  FROM fs74)
        |WHERE y2 = yr + 1
        |ORDER BY cust, yr""".stripMargin).collect().toSeq
    assert(fused.map(_.toString) == reference.map(_.toString))
  }

  test("presence-flag fusion (q87/q38): flag algebra == EXCEPT / INTERSECT") {
    val r = new Random(13)
    import spark.implicits._
    val rows = (0 until 4000).map { _ =>
      (r.nextInt(60).toLong, 1 + r.nextInt(12), r.nextInt(3))
    }
    rows.toDF("cust", "mon", "chan").createOrReplaceTempView("fs87")
    val exceptRef = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT DISTINCT cust, mon FROM fs87 WHERE chan = 0
        |  EXCEPT SELECT DISTINCT cust, mon FROM fs87 WHERE chan = 1
        |  EXCEPT SELECT DISTINCT cust, mon FROM fs87 WHERE chan = 2)""".stripMargin)
      .head().getLong(0)
    val exceptFused = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT cust, mon FROM fs87 GROUP BY cust, mon
        |  HAVING max(CASE WHEN chan = 0 THEN 1 ELSE 0 END) = 1
        |    AND max(CASE WHEN chan = 1 THEN 1 ELSE 0 END) = 0
        |    AND max(CASE WHEN chan = 2 THEN 1 ELSE 0 END) = 0)""".stripMargin)
      .head().getLong(0)
    assert(exceptFused == exceptRef && exceptRef > 0,
      s"except fusion: $exceptFused != $exceptRef (and must be nonzero)")
    val intersectRef = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT cust, mon FROM fs87 WHERE chan = 0
        |  INTERSECT SELECT cust, mon FROM fs87 WHERE chan = 1
        |  INTERSECT SELECT cust, mon FROM fs87 WHERE chan = 2)""".stripMargin)
      .head().getLong(0)
    val intersectFused = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT cust, mon FROM fs87 GROUP BY cust, mon
        |  HAVING max(CASE WHEN chan = 0 THEN 1 ELSE 0 END) = 1
        |    AND max(CASE WHEN chan = 1 THEN 1 ELSE 0 END) = 1
        |    AND max(CASE WHEN chan = 2 THEN 1 ELSE 0 END) = 1)""".stripMargin)
      .head().getLong(0)
    assert(intersectFused == intersectRef && intersectRef > 0,
      s"intersect fusion: $intersectFused != $intersectRef (and must be nonzero)")
  }
}
