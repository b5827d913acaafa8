package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * `randomSplit`/`sample` are seeded per-partition: the assignment of a
  * given row changes when the partition layout changes (repartition,
  * cluster resize, file compaction). A training pipeline needs the
  * OPPOSITE contract — a document's train/val/test fate must be a pure
  * function of its id, stable across runs, engines, and cluster sizes,
  * so evaluation sets never leak into training even as the corpus is
  * re-ingested. Everything here hashes the id column: zero shuffle for
  * split assignment (a projection), one window shuffle for stratified
  * caps.
  *
  * Reference behavior anchor: the migration suite's sampled compare
  * (`MIGRATION_PLAYBOOK.md:235`) wants "the same 1000 rows each run" —
  * hash order is the distributed, engine-portable way to get that.
  */
object Splits {

  /** Uniform bucket in `[0, buckets)` as a pure function of `id` (+ an
    * optional salt to draw an independent assignment): the first 32
    * bits of md5, so any engine with md5 reproduces it bit-for-bit. */
  def hashBucket(id: Column, buckets: Int, salt: String = ""): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Adds a `split` column assigning each row to a named split by
    * cumulative weight (basis points out of 10000 — e.g.
    * `Seq("train" -> 8000, "val" -> 1000, "test" -> 1000)`). Pure
    * projection: no shuffle, no state, no seed — the 100 TB corpus is
    * split at scan speed. */
  def assignSplits(df: DataFrame, idCol: String,
      weights: Seq[(String, Int)] = Seq("train" -> 8000, "val" -> 1000, "test" -> 1000),
      salt: String = ""): DataFrame = {
    require(weights.map(_._2).sum == 10000, "split weights must sum to 10000")
    val bucket = hashBucket(col(idCol), 10000, salt)
    val cum = weights.scanLeft(0)(_ + _._2).tail
    val split = weights.zip(cum).foldRight(lit(weights.last._1): Column) {
      case (((name, _), upper), rest) =>
        when(bucket < upper, lit(name)).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Data-mixing downsample: each row survives with its source's
    * probability (basis points out of 10000; sources absent from the map
    * keep `defaultBps`), decided by the row id's hash bucket — the
    * "mixture weights" step that rebalances a training corpus across
    * sources. Pure projection + filter: no shuffle, no seed, and the
    * kept set for a source is a stable subset as its weight grows
    * (bucket < threshold nests), so raising a weight only ADDS rows —
    * ideal for reproducible mixture sweeps. */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
      weightsBps: Map[String, Int], defaultBps: Int = 10000,
      salt: String = ""): DataFrame = {
    require((defaultBps +: weightsBps.values.toSeq).forall(w => w >= 0 && w <= 10000),
      "weights are basis points in [0, 10000]")
    val threshold = weightsBps.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultBps): Column) { case (acc, (src, bps)) =>
        when(col(sourceCol) === src, lit(bps)).otherwise(acc)
      }
    df.filter(hashBucket(col(idCol), 10000, salt) < threshold)
  }

  /** Keeps at most `n` rows per stratum, chosen by hash order — a
    * deterministic, uniformly-drawn downsample that caps dominant
    * groups (the class-balance step before training). One window
    * shuffle on the stratum key; ties in the (astronomically unlikely)
    * md5-collision case break on the id itself, so the kept set is a
    * total function of the data. */
  def stratifiedCap(df: DataFrame, strataCols: Seq[String], idCol: String,
      n: Int, salt: String = ""): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Within-stratum quantile bucket (`ntile(n)`) — the "quality
    * percentile WITHIN language/source" step of mixture curation:
    * absolute quality scores aren't comparable across languages (a
    * heuristic scorer drifts by script), so corpus recipes keep e.g.
    * the top quartile PER language rather than a global cutoff.
    * `orderCols` must totalize the order (append the id as the final
    * key) or bucket boundaries are engine-unspecified. One window
    * shuffle on the stratum key; ntile's equal-fill semantics
    * (remainder rows go to the lowest buckets) agree across engines.
    * Output column `outCol` is the 1-based bucket index. */
  def quantileBuckets(df: DataFrame, strataCols: Seq[String],
      orderCols: Seq[Column], n: Int, outCol: String = "bucket"): DataFrame =
    df.withColumn(outCol, ntile(n).over(
      Window.partitionBy(strataCols.map(col): _*).orderBy(orderCols: _*)))

  /** Temperature-scaled mixture design — the per-source sampling-weight
    * table a corpus recipe publishes (the flattening step of multi-
    * source pre-training mixes: raw token share^τ with τ < 1 upweights
    * small sources). τ is fixed at 0.5 BY CONSTRUCTION: share^0.5 is
    * `sqrt`, a correctly-rounded IEEE primitive every engine agrees on,
    * where a general pow(x, τ) is libm-dependent and breaks the oracle
    * contract. Weights normalize by a fixed-point Σ (floor(w·10¹²)
    * summed exactly — a plain double Σ is order-dependent), and the doc
    * `budget` allocates by LARGEST REMAINDER, so `target_docs` sums to
    * the budget exactly. Cost: one hash aggregate over the corpus; the
    * remainder ranking windows over the per-source frame only (sources ≪
    * rows — sketch-sized by construction). */
  def temperatureMixtureSqrt(df: DataFrame, sourceCol: String, tokenCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val s = df.groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"), sum(tokenCol).cast("bigint").as("n_tokens"))
    val tot = s.agg(sum("n_tokens").cast("double").as("t"))
    val w = s.crossJoin(broadcast(tot))
      .withColumn("raw_w", sqrt(col("n_tokens").cast("double") / col("t")))
    val norm = w.agg((sum(floor(col("raw_w") * lit(1.0e12)).cast("decimal(38,0)"))
      .cast("double") / lit(1.0e12)).as("z"))
    val alloc = w.crossJoin(broadcast(norm))
      .withColumn("mix_weight", col("raw_w") / col("z"))
      .withColumn("base_alloc", floor(col("mix_weight") * budget).cast("bigint"))
      .withColumn("rem",
        col("mix_weight") * budget - floor(col("mix_weight") * budget))
    val short = alloc.agg((lit(budget) - sum("base_alloc")).cast("bigint").as("k"))
    alloc.crossJoin(broadcast(short))
      .withColumn("rr", row_number().over(Window.orderBy(col("rem").desc, col(sourceCol))))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"), col("mix_weight"),
        (col("base_alloc") + when(col("rr") <= col("k"), lit(1L)).otherwise(lit(0L)))
          .cast("bigint").as("target_docs"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how target-domain-like its hashed n-gram profile is.
    * Features are unigrams + adjacent bigrams hashed into `buckets`
    * cells ([[hashBucket]] — deterministic, engine-portable); the
    * per-bucket log-ratio `ln(p_target(b) / p_raw(b))` uses add-one
    * smoothing so both distributions are ratios of exact integers, and
    * a document's `log_weight` is the sum of its feature occurrences'
    * log-ratios (computed ONCE on the `buckets`-row frame, fixed-point
    * summed per the round-9 doctrine). `keep = log_weight > 0` selects
    * docs more target-like than raw-average — the resampling criterion.
    *
    * Scale shape: the feature stream is a zero-shuffle projection +
    * explode; the bucket census is ONE map-side-combinable hash agg
    * onto a `buckets`-row frame (constant size — this is the entire
    * model, the point of hashed DSIR); the per-doc pass joins the
    * BROADCAST log-ratio table and aggregates by doc. The count
    * products are cast to double BEFORE multiplying — each cast is
    * exact below 2^53 and the single multiply/divide/ln chain is
    * correctly rounded identically everywhere. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      targetCol: Column, buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20), s"buckets=$buckets out of range")
    val toks = df.select(col(idCol), targetCol.cast("int").as("_t"),
      graft.llm.TextOps.tokens(col(textCol)).as("_tk"))
    val feats = toks.select(col(idCol), col("_t"),
        explode(concat(col("_tk"), expr(
          """CASE WHEN size(_tk) >= 2
            |  THEN transform(sequence(1, size(_tk) - 1),
            |    i -> concat(element_at(_tk, i), ' ', element_at(_tk, i + 1)))
            |  ELSE array() END""".stripMargin))).as("f"))
      .select(col(idCol), col("_t"), hashBucket(col("f"), buckets, "dsir").as("b"))
    val counts = feats.groupBy("b").agg(
      count(lit(1)).as("c_r"), sum(col("_t")).cast("bigint").as("c_t"))
    val totals = counts.agg(sum("c_r").cast("bigint").as("t_r"),
      sum("c_t").cast("bigint").as("t_t"))
    val lr = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        log((col("c_t") + 1).cast("double") * (col("t_r") + buckets).cast("double") /
          ((col("c_r") + 1).cast("double") * (col("t_t") + buckets).cast("double")))
          .as("lr"))
    feats.join(broadcast(lr), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        sum(floor(col("lr") * lit(1.0e12)).cast("decimal(38,0)")).as("_s"))
      .select(col(idCol), col("n_feats"),
        (col("_s").cast("double") / lit(1.0e12)).as("log_weight"))
      .withColumn("keep", col("log_weight") > 0)
  }

  /** Deterministic curriculum interleave: a global training ORDER that
    * round-robins across sources — position r of every source comes
    * before position r+1 of any source, and sources tie-break in name
    * order — so a training run consumes an even source mixture from
    * step one instead of draining sources sequentially. Within-source
    * order is md5 hash order (layout-invariant, like [[assignSplits]]).
    *
    * The global position is CLOSED-FORM, not a global row_number (a
    * one-partition sort at 100 TB): a doc at within-source rank `r` in
    * the source with index `i` sits after Σ_s min(count_s, r−1) docs of
    * earlier rounds plus the same-round docs of earlier sources,
    * #{s : idx_s < i ∧ count_s ≥ r} — both computable per row from the
    * broadcast (idx, count) array (S structs) with two HOF folds. One
    * source-partitioned rank window (S-way parallel) + one S-row
    * aggregate; no stage ever sees more than its partition. */
  def curriculumInterleave(df: DataFrame, idCol: String,
      sourceCol: String): DataFrame = {
    val wSrc = Window.partitionBy(sourceCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("_c"))
      .withColumn("_i", row_number().over(Window.orderBy(sourceCol)) - 1)
    val catalog = counts
      .agg(sort_array(collect_list(struct(col("_i"), col("_c"), col(sourceCol)
        .as("_s")))).as("cat"))
    val ranked = df.select(col(idCol), col(sourceCol),
      row_number().over(wSrc).cast("long").as("within_rank"))
    ranked.crossJoin(broadcast(catalog))
      .withColumn("_idx", expr(
        s"element_at(filter(cat, x -> x._s = $sourceCol), 1)._i"))
      .withColumn("global_pos",
        expr("""aggregate(cat, CAST(0 AS BIGINT),
            |  (acc, x) -> acc + least(x._c, within_rank - 1)
            |            + CASE WHEN x._i < _idx AND x._c >= within_rank
            |                   THEN 1 ELSE 0 END)""".stripMargin))
      .select(col(idCol), col(sourceCol), col("within_rank"), col("global_pos"))
  }

  /** Token-budget shard planning — assign every document a contiguous
    * output-shard id so each shard carries ~`targetPerShard` weight
    * (token count): the write-path planner that turns a filtered corpus
    * into evenly-sized training files. The order is md5(id) — the same
    * layout-invariant contract as [[assignSplits]] — and the shard id
    * is `floor(exclusive-prefix-sum / target)`: pure integer math, so
    * every engine reproduces the identical plan.
    *
    * The prefix sum is DISTRIBUTED, not a global ordered window (which
    * Spark executes as a ONE-partition sort — the a21 anti-pattern, and
    * a guaranteed OOM at 100 TB). Two levels: (1) rows group into 256
    * buckets by their first two md5 hex chars — bucket order IS hash
    * order's coarse prefix; per-bucket subtotals are one map-side-
    * combinable aggregate onto a 256-row frame, whose own prefix sum is
    * a trivially small window; (2) each bucket's exclusive offset
    * broadcasts back and a bucket-partitioned window (256-way parallel)
    * adds the within-bucket running sum. Exact global prefix sum, zero
    * single-partition stages. */
  def planShards(df: DataFrame, idCol: String, weightCol: Column,
      targetPerShard: Long): DataFrame = {
    require(targetPerShard > 0, "targetPerShard must be positive")
    val keyed = df.select(col(idCol), weightCol.cast("long").as("_w"),
      md5(col(idCol).cast("string")).as("_h"))
      .withColumn("_b", substring(col("_h"), 1, 2))
    val offsets = keyed.groupBy("_b").agg(sum("_w").as("_bw"))
      .withColumn("_off",
        coalesce(sum(col("_bw")).over(Window.orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_b", "_off")
    val wIn = Window.partitionBy("_b").orderBy(col("_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offsets), "_b")
      .select(col(idCol), col("_w").as("weight"),
        (col("_off") + coalesce(sum(col("_w")).over(wIn), lit(0L))).as("cum_before"))
      .withColumn("shard_id", expr(s"cum_before div ${targetPerShard}"))
      .drop("cum_before")
  }
}
