package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application, Spark-first.
  *
  * The reference pipeline tokenizes with a fixed external vocabulary
  * (`token_count` in its curation scripts); a training-data engine also
  * needs to BUILD that vocabulary from the corpus. This is Sennrich-style
  * BPE (Neural Machine Translation of Rare Words with Subword Units,
  * ACL 2016) on the classic word-census trick:
  *
  *   - ONE corpus-scale pass builds the (word, count) census — a
  *     map-side-combinable aggregate, the only stage that ever sees the
  *     full corpus. At 100 TB this is a single scan+shuffle of
  *     vocabulary-sized output (Heaps' law: |vocab| ≪ |corpus|).
  *   - Every merge iteration then runs on the VOCAB frame (words as
  *     symbol arrays, weighted by count): a pair census the size of
  *     Σ|word| over distinct words, an argmax, and a codegen'd
  *     higher-order-function rebuild. No iteration touches the corpus.
  *   - Applying the trained merges (encode) is again vocab-sized work
  *     broadcast-joined back to the token stream — the corpus never
  *     shuffles on anything wider than its own words.
  *
  * Merge semantics are the standard leftmost non-overlapping scan: in
  * "aaaa", merging (a,a) yields [aa, aa]; in "aaa", [aa, a]. The fold
  * below gets this for free — after a merge fires, the accumulator's
  * last element is the MERGED symbol, which no longer equals the left
  * side, so the next input symbol starts a fresh match window.
  *
  * Everything is deterministic and engine-portable (integer counts,
  * string symbols, ties broken (count DESC, lhs ASC, rhs ASC)), so a
  * DuckDB oracle can replay training bit-for-bit — see the generated
  * iteration CTEs in LlmQueries.bpeOracle, which resolve the same
  * leftmost-non-overlap rule in closed form (runs of consecutive
  * pair-matches, even offsets taken) instead of a fold.
  */
object Bpe {

  /** A word as its initial character symbols (1 char = 1 symbol).
    * Empty-string guard: Spark's sequence(1, 0) steps DOWN to [1, 0]
    * (two phantom "" symbols), where the oracle's range(1, len+1) is
    * empty — '' must map to [] on both engines. */
  def charSymbols(word: Column): Column =
    when(length(word) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1))))

  /** One merge applied left-to-right non-overlapping, as a codegen'd
    * fold over the symbol array (no UDF). */
  def applyMerge(syms: Column, lhs: String, rhs: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(lhs) && s === lit(rhs),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
          .otherwise(concat(acc, array(s))))

  /** The corpus-scale pass: (word, cnt) census off the canonical
    * tokenizer ([[TextOps.tokens]] — the same spelling every shingle
    * census and the curation chain use, so vocabularies can't fork). */
  def wordCensus(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  final case class Merge(rank: Int, lhs: String, rhs: String,
                         merged: String, pairCount: Long)

  /** Train up to `k` merges over a (word, cnt) census. Returns the
    * merge table and the vocab frame with post-merge symbol arrays
    * (word, cnt, syms) — the trained tokenizer's working state.
    *
    * Each iteration is one pair census over the vocab frame (posexplode
    * + hash aggregate), one 1-row argmax via orderBy().limit(1) =
    * TakeOrderedAndProject (per-partition heaps, never a global sort),
    * and one fold rebuild. The vocab frame is localCheckpointed per
    * iteration to truncate lineage (same discipline as the GD/Lloyd
    * trainers). Stops early if no pair is left (every word fused). */
  def trainMerges(words: DataFrame, k: Int): (Seq[Merge], DataFrame) = {
    var cur = words
      .select(col("word"), col("cnt"), charSymbols(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    for (rank <- 1 to k if !exhausted) {
      val best = cur
        .select(col("cnt"), col("syms"), posexplode(col("syms")).as(Seq("i", "l")))
        .where(col("i") < size(col("syms")) - 1)
        .select(col("cnt"), col("l"), element_at(col("syms"), col("i") + 2).as("r"))
        .groupBy("l", "r").agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("l"), col("r")).limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, l + r, n)
        cur = cur.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint()
      }
    }
    (merges.toSeq, cur)
  }

  /** Encode the corpus with a trained vocab frame: per-document word and
    * token counts. The vocab (word → symbols) BROADCASTS — the token
    * stream never shuffles on anything but its own doc grouping.
    *
    * Out-of-vocabulary words (inevitable when the vocab was trained on
    * an earlier corpus than the one arriving — the st24 ingest shape)
    * fall back to their character symbols via the LEFT join's coalesce,
    * the standard BPE unknown-word behavior. An inner join would
    * silently drop them from both counts — a document of entirely new
    * words would vanish from the output. */
  def encodeDocs(docs: DataFrame, vocab: DataFrame,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(vocab.select(col("word"), col("syms"))), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(coalesce(col("syms"), charSymbols(col("word")))))
          .as("n_tokens"))
}
