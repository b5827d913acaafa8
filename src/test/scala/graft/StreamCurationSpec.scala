package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the streaming curation gate (st23) that the
  * DuckDB oracle compare can't articulate on its own: the outcome frame
  * PARTITIONS the streamed corpus, increment-1 docs can never be dropped
  * by a state probe (both indexes are empty), and the URL drop in
  * increment 2 is STATE-dependent — an odd %10=7 doc dies at url_dedup
  * iff its even URL-partner survived all of increment 1 into the
  * accepted index.
  */
class StreamCurationSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  private lazy val outcomes =
    SparkEntry.queries("st23_stream_curation")(spark, dir)
      .localCheckpoint(true)

  test("outcomes partition the streamed corpus: one row per doc >= 10") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") >= 10)
    assert(outcomes.count() === docs.count())
    assert(outcomes.select("doc_id").distinct().count() === docs.count())
    val vals = outcomes.select("outcome").distinct()
      .collect().map(_.getString(0)).toSet
    assert(vals.subsetOf(Set(
      "accepted", "url_dup", "quality", "fuzzy_dup", "contaminated")))
    // increment matches arrival parity
    assert(outcomes.filter(
      (col("doc_id") % 2 === 0 && col("increment") =!= 1) ||
      (col("doc_id") % 2 =!= 0 && col("increment") =!= 2)).count() === 0)
  }

  test("increment 1 never drops on a state probe (indexes start empty)") {
    assert(outcomes.filter(col("increment") === 1 &&
      col("outcome").isin("url_dup", "fuzzy_dup")).count() === 0)
  }

  test("url_dup in increment 2 is exactly the accepted-partner probe") {
    // An odd doc with doc_id % 10 = 7 shares its even predecessor's
    // canonical URL; it must read url_dup iff that predecessor was
    // accepted in increment 1. No other doc can be url_dup: every other
    // doc's URL embeds its own unique id.
    val acc1 = outcomes
      .filter(col("increment") === 1 && col("outcome") === "accepted")
      .select(col("doc_id").as("partner_id"))
    val expected = outcomes.filter(col("increment") === 2)
      .filter(col("doc_id") % 10 === 7)
      .withColumn("partner_id", col("doc_id") - 1)
      .join(acc1, "partner_id")
      .select("doc_id")
    val actual = outcomes
      .filter(col("outcome") === "url_dup").select("doc_id")
    assert(actual.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(actual).count() === 0)
    assert(actual.count() > 0, "fixture must exercise the url_dup branch")
  }

  test("every drop stage fires somewhere at sf0.001") {
    val byOutcome = outcomes.groupBy("outcome").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOutcome.getOrElse("accepted", 0L) > 0)
    assert(byOutcome.getOrElse("url_dup", 0L) > 0)
    assert(byOutcome.getOrElse("quality", 0L) > 0)
  }
}
