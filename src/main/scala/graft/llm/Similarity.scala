package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, and an IVF (inverted-file) bucketed variant as the scale
  * path.
  *
  * All vector math is Catalyst HOFs (`zip_with` + `aggregate`) over
  * `array<double>` — a sequential left fold, so results are deterministic
  * bit-for-bit. No UDFs, no collect.
  *
  * Scale shape: the query side is broadcast (it is small by construction);
  * the corpus side never shuffles for brute force. IVF assigns each corpus
  * vector to its nearest centroid once (narrow map against broadcast
  * centroids), then probes only the query's cluster — candidate count
  * drops by ~|clusters|×, the standard ANN recall/throughput trade.
  */
object Similarity {

  /** Cast a float embedding column to array<double> (exact widening) so
    * all downstream arithmetic is double-precision and
    * engine-reproducible. */
  def asDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Dot product via zip_with + left-fold aggregate. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity — the native fused expression
    * ([[graft.plans.CosineSimilarity]]): one pass over both arrays inside
    * whole-stage codegen instead of three HOF folds, bit-identical
    * results (same accumulation order). */
  def cosine(a: Column, b: Column): Column = graft.plans.CosineSimilarity(a, b)

  /** The composed-HOF formulation, kept as the reference semantics the
    * fused expression must match (see SimilaritySpec equivalence test). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k: every query (small, broadcast) against the
    * full corpus; rank with a per-query window. Ties broken by corpus id
    * for determinism. Excludes self-matches when ids collide. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), asDoubleVec(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDoubleVec(col(vecCol)).as("qv"))
    val sims = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("sim"))
    rankTopK(sims, k)
  }

  /** Assign each vector to its max-cosine centroid (ids from
    * `centroids`). Narrow map against broadcast centroids, then a window
    * per vector — at scale use `k_centroids ≪ n` so the cross product is
    * `n × k_centroids`. */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = vectors.select(col(idCol).as("vec_id_"), asDoubleVec(col(vecCol)).as("vv"))
    val cent = centroids.select(col(idCol).as("centroid_id"), asDoubleVec(col(vecCol)).as("cv"))
    val w = Window.partitionBy("vec_id_").orderBy(col("csim").desc, col("centroid_id"))
    v.crossJoin(broadcast(cent))
      .select(col("vec_id_"), col("centroid_id"), cosine(col("vv"), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id_").as(idCol), col("centroid_id").as("cluster_id"))
  }

  /** IVF top-k: probe only the query's own cluster. Returns
    * (query_id, corpus_id, cluster_id, sim, rank). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val assignedCorpus = ivfAssign(corpus, centroids, idCol, vecCol)
    val assignedQueries = ivfAssign(queries, centroids, idCol, vecCol)
      .select(col(idCol).as("q_id"), col("cluster_id"))
    val c = corpus.join(assignedCorpus, idCol)
      .select(col(idCol).as("corpus_id"), col("cluster_id"), asDoubleVec(col(vecCol)).as("cv"))
    val q = queries.join(assignedQueries.withColumnRenamed("q_id", idCol), idCol)
      .select(col(idCol).as("query_id"), col("cluster_id"), asDoubleVec(col(vecCol)).as("qv"))
    val sims = c.join(broadcast(q), "cluster_id")
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), col("cluster_id"),
        cosine(col("qv"), col("cv")).as("sim"))
    rankTopK(sims, k, extraCols = Seq("cluster_id"))
  }

  /** Lloyd's k-means in pure DataFrame algebra — the IVF INDEX BUILD
    * step ([[ivfAssign]]/[[ivfTopK]] consume the centroids this
    * produces). Per iteration: one narrow assign against broadcast
    * centroids + one mean recompute; cost is iters × (n·k cosines +
    * one (cluster, dim) shuffle of the exploded members) — linear in
    * corpus size, standard for index builds.
    *
    * Determinism, the part that matters for reproducible index builds:
    * initial centroids are the `k` smallest-id vectors; assignment ties
    * break by centroid id; and the per-dimension MEAN sums in
    * DECIMAL(28,14) — decimal addition is exact and order-independent,
    * where a double sum would vary with partition merge order and
    * could flip a borderline assignment between runs. Empty clusters
    * keep their previous centroid. Centroids are localCheckpoint'd
    * each iteration (they are k tiny rows; the checkpoint cuts the
    * otherwise-iteration-deep lineage). */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = corpus.select(col(idCol).as("vid"), asDoubleVec(col(vecCol)).as("vv"))
    var cent = v.orderBy("vid").limit(k)
      .select(col("vid").as("cid"), col("vv").as("cv"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val w = Window.partitionBy("vid").orderBy(col("csim").desc, col("cid"))
      val assigned = v.crossJoin(broadcast(cent))
        .select(col("vid"), col("cid"), col("vv"),
          cosine(col("vv"), col("cv")).as("csim"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      val means = assigned
        .select(col("cid"), posexplode(col("vv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg((sum(col("x").cast("decimal(28,14)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy("cid")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), expr("transform(pm, p -> p.m)").as("new_cv"))
      cent = cent.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("new_cv"), col("cv")).as("cv"))
        .localCheckpoint(true)
    }
    cent.select(col("cid").as("cluster_id"), col("cv").as("centroid"))
  }

  /** Embedding-cosine near-duplicate pairs: candidate pairs are generated
    * INSIDE IVF clusters (never all-pairs — candidate count drops by
    * ~|clusters|× like any IVF probe), then filtered by cosine threshold.
    * Returns (id_a < id_b, cluster_id, sim). The standard trade: true
    * near-dups whose members land in different clusters are missed;
    * raise recall with more probes or finer thresholds, not all-pairs. */
  def nearDupPairs(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val assigned = ivfAssign(corpus, centroids, idCol, vecCol)
    val v = corpus.join(assigned, idCol)
      .select(col(idCol).as("id_"), col("cluster_id"), asDoubleVec(col(vecCol)).as("vv"))
    v.alias("x").join(v.alias("y"),
        col("x.cluster_id") === col("y.cluster_id") && col("x.id_") < col("y.id_"))
      .select(col("x.id_").as("id_a"), col("y.id_").as("id_b"),
        col("x.cluster_id").as("cluster_id"),
        cosine(col("x.vv"), col("y.vv")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  private def rankTopK(sims: DataFrame, k: Int, extraCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("corpus_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select((Seq("query_id", "corpus_id") ++ extraCols ++ Seq("sim", "rank")).map(col): _*)
  }

  /** Per-vector min-max scalar quantization to 8-bit codes — the storage
    * path for ANN at scale: a 4-byte float becomes a 1-byte code plus two
    * per-vector doubles, a 4× shrink of the dominant column before the
    * IVF/LSH index is built. `q[i] = round(255·(v[i]−mn)/(mx−mn))`
    * computed in DOUBLE from the exact float inputs, so any engine
    * reproduces the codes bit-for-bit (constant vectors encode as all
    * zeros). Dequantize with `mn + q·(mx−mn)/255`. Pure projection: no
    * shuffle, stays in codegen. */
  def quantize(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val outs = df.columns.filterNot(_ == vecCol).map(col) ++ Seq(
      array_min(col(vecCol)).cast("double").as("q_min"),
      array_max(col(vecCol)).cast("double").as("q_max"),
      expr(s"""transform($vecCol, v -> CAST(coalesce(
              |  round((CAST(v AS DOUBLE) - CAST(array_min($vecCol) AS DOUBLE)) /
              |    nullif(CAST(array_max($vecCol) AS DOUBLE) -
              |           CAST(array_min($vecCol) AS DOUBLE), 0.0d) * 255.0d),
              |  0.0d) AS INT))""".stripMargin).as("codes"))
    df.select(outs.toIndexedSeq: _*)
  }
}
