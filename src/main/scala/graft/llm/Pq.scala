package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", PAMI 2011) — the memory-compression path for ANN at
  * scale, complementing the IVF recall path ([[Similarity.ivfTopK]]) and
  * the index-free hyperplane path ([[Similarity.hyperplaneSig]]).
  *
  * The vector splits into `m` contiguous subspaces of `subDim` dims; each
  * subspace gets its own tiny k-means codebook; a vector is stored as `m`
  * one-byte codes (here `array<int>` — the storage win is m·log2(k) bits
  * vs m·subDim·32: dim 64 floats → 8 codes is a 32× shrink). Queries
  * score candidates with the ADC (asymmetric distance) trick: a per-query
  * lookup table of ‖q_s − c_{s,j}‖² for every (subspace, centroid), so a
  * candidate's approximate distance is `m` table lookups — no float
  * vector is ever touched at query time.
  *
  * Scale shape: codebooks and per-query LUTs are O(m·k) — always
  * broadcast; the corpus is touched by narrow projections only (encode's
  * one groupBy shuffles (id, s, cid) triples, never vectors; scoring is a
  * zero-shuffle projection against the broadcast LUT). Because subspaces
  * partition the dimensions, the ADC score is EXACTLY the squared L2 to
  * the reconstruction Σ_s‖q_s − c_{s,code_s}‖² = ‖q − recon(codes)‖² —
  * spec-pinned in PqSpec.
  *
  * Determinism (oracle contract): every distance is ONE left fold over
  * `zip_with` (the oracle mirrors the same fold); assignment ties break
  * by centroid id; codebook ids are dense ranks 0..k−1 of the k
  * smallest-id training vectors, so `codes` index the cid-ordered LUT
  * rows directly on both engines.
  *
  * Centroid means use INTEGER-GRID summation, not the DECIMAL(28,14)
  * route the earlier k-means build used, because fractional decimals
  * cannot cross engines bit-for-bit: (a) Spark rounds the
  * double→DECIMAL(p,14) cast HALF_UP while DuckDB rounds half-even, and
  * a double-from-float can land exactly on the digit-15 half boundary
  * (mantissa multiple of 5^14 ≤ 2^33 — happens in this corpus); (b)
  * DuckDB's DECIMAL(38,s)→DOUBLE cast double-rounds through
  * (double)int128 / (double)10^s and is 1 ulp off the correctly-rounded
  * value Java BigDecimal produces (verified empirically for s=24).
  * Instead each training input snaps to the 2^-30 grid —
  * `floor(x·2^30)` exact in both engines — and the mean is
  * `(double)Σq / n / 2^30`: the Σq sum is an exact integer
  * (DECIMAL(38,0); int→double is correctly rounded everywhere), the
  * `/n` is one correctly-rounded IEEE division, and the `/2^30` is an
  * exponent shift. The snap perturbs each input by < 1e-9 — noise far
  * below k-means' own sensitivity — and buys bit-identical codebooks on
  * any engine with exact integer sums.
  */
object Pq {

  /** Squared L2 distance as one `zip_with` + left-fold `aggregate` —
    * same accumulation order as [[Similarity.dot]], reproduced verbatim
    * by the oracle's `list_reduce(list_transform(...))`. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Explode vectors to (vid, s, sv) subvector rows — `m` rows per
    * vector, each a `subDim`-slice. `zip_with` would silently null-pad a
    * wrong-length vector, so a row-level `assert_true` fails loudly when
    * `size(vec) ≠ m·subDim`. */
  def subspaces(df: DataFrame, idCol: String, vecCol: String, m: Int, subDim: Int): DataFrame = {
    val guard = assert_true(size(col(vecCol)) === m * subDim,
      concat(lit(s"Pq: expected dim ${m * subDim} but vector has "),
        size(col(vecCol)).cast("string"), lit(" elements")))
    val vv = Similarity.asDoubleVec(col(vecCol))
    val slices = array((0 until m).map(j => slice(vv, j * subDim + 1, subDim)): _*)
    df.select((col(idCol) + coalesce(guard.cast("long"), lit(0L))).as("vid"),
      posexplode(slices).as(Seq("s", "sv")))
  }

  /** Per-subspace Lloyd codebooks: (s, cid, cv) with cid dense 0..k−1.
    * Init = subvectors of the k smallest-id vectors (rank order, so ids
    * need not be dense); per iteration one broadcast assign + one
    * decimal-exact mean recompute, all `m` subspaces trained in the SAME
    * jobs (subspace is just a grouping column). Empty clusters keep
    * their previous centroid. Centroids localCheckpoint each iteration
    * (m·k tiny rows) to cut iteration-deep lineage. */
  def codebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int, k: Int, iters: Int): DataFrame = {
    val wInit = Window.partitionBy("s").orderBy("vid")
    var cent = subspaces(corpus.orderBy(idCol).limit(k), idCol, vecCol, m, subDim)
      .withColumn("cid", row_number().over(wInit) - 1)
      .select(col("s"), col("cid"), col("sv").as("cv"))
      .localCheckpoint(true)
    val sub = subspaces(corpus, idCol, vecCol, m, subDim)
    for (_ <- 1 to iters) {
      // Argmin via min_by over the total key (d2, cid), not a
      // row_number window: the broadcast join emits a (vid, s) group's
      // k candidate rows inside one input partition, so map-side
      // partial aggregation collapses them before the exchange — n·m
      // rows shuffle instead of n·m·k and no per-partition sort
      // (guide §2.3/§2.4). The key is total (cid unique per group), so
      // the winner is exactly the window's (d2 ASC, cid ASC) rank-1 row.
      val assigned = sub.join(broadcast(cent), "s")
        .select(col("s"), col("cid"), col("sv"), col("vid"), l2sq(col("sv"), col("cv")).as("d2"))
        .groupBy(col("vid"), col("s"))
        .agg(min_by(struct(col("cid"), col("sv")), struct(col("d2"), col("cid"))).as("a"))
        .select(col("s"), col("a.cid").as("cid"), col("a.sv").as("sv"))
      // ONE aggregate with subDim mean columns instead of posexplode →
      // per-(s,cid,pos) agg → per-(s,cid) re-collect: the per-element
      // integer-grid arithmetic is identical (floor(x·2^30) summed as
      // DECIMAL(38,0), one division by the group count, one exponent
      // shift), but the subvector rows never explode subDim-fold and
      // the second exchange disappears (guide §2.3/§2.4) — every
      // element lands at the array position its subspace slot dictates,
      // exactly what the sort_array(struct(pos, mu)) re-collect
      // produced.
      val meanCols = (0 until subDim).map { d =>
        (sum(floor(element_at(col("sv"), d + 1) * lit(1073741824.0))
          .cast("decimal(38,0)")).cast("double") /
          count(lit(1)) / lit(1073741824.0)).as(s"_mu$d")
      }
      val means = assigned
        .groupBy("s", "cid")
        .agg(meanCols.head, meanCols.tail: _*)
        .select(col("s"), col("cid"),
          array((0 until subDim).map(d => col(s"_mu$d")): _*).as("ncv"))
      cent = cent.join(means, Seq("s", "cid"), "left")
        .select(col("s"), col("cid"), coalesce(col("ncv"), col("cv")).as("cv"))
        .localCheckpoint(true)
    }
    cent
  }

  /** Encode each vector as its `m` nearest-centroid codes, subspace
    * order: (idCol, codes array<int>). One broadcast join + one groupBy
    * of (id, s, cid) triples — the vectors themselves never shuffle. */
  def encode(vectors: DataFrame, cb: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame = {
    // Same min_by-over-total-key argmin as [[codebooks]]' assign step:
    // map-side partial aggregation shrinks the first exchange from
    // n·m·k rows to n·m and drops the window's sort.
    subspaces(vectors, idCol, vecCol, m, subDim)
      .join(broadcast(cb), "s")
      .select(col("s"), col("cid"), col("vid"), l2sq(col("sv"), col("cv")).as("d2"))
      .groupBy(col("vid"), col("s"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
      .groupBy("vid")
      .agg(sort_array(collect_list(struct(col("s"), col("cid")))).as("sc"))
      .select(col("vid").as(idCol), expr("transform(sc, x -> x.cid)").as("codes"))
  }

  /** Reconstruct the quantized vector from codes (centroid concat) —
    * the decode twin of [[encode]], used by PqSpec to pin the ADC
    * identity. */
  def reconstruct(codes: DataFrame, cb: DataFrame, idCol: String): DataFrame = {
    codes.select(col(idCol), posexplode(col("codes")).as(Seq("s", "cid")))
      .join(broadcast(cb), Seq("s", "cid"))
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("s"), col("cv")))).as("sc"))
      .select(col(idCol), flatten(expr("transform(sc, x -> x.cv)")).as("recon"))
  }

  /** ADC top-k: per-query LUT of ‖q_s − c_{s,j}‖² (m·k doubles,
    * broadcast), candidate score = left fold of `m` LUT lookups over the
    * codes array — a zero-shuffle projection over the encoded corpus.
    * Ties break by corpus id; self-matches excluded. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, cb: DataFrame,
      idCol: String, vecCol: String, m: Int, subDim: Int, kTop: Int): DataFrame = {
    val codes = encode(corpus, cb, idCol, vecCol, m, subDim)
      .withColumnRenamed(idCol, "corpus_id")
    val lut = queryLuts(queries, cb, idCol, vecCol, m, subDim)
    val w = Window.partitionBy("query_id").orderBy(col("approx_d2").asc, col("corpus_id"))
    codes.crossJoin(broadcast(lut))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), adcScore)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
  }

  /** Per-query ADC lookup tables: (query_id, luts) where `luts[s][j]` =
    * ‖q_s − c_{s,j}‖² — m·k doubles per query, the only query-side state
    * ADC scoring needs (broadcast by the callers). */
  private def queryLuts(queries: DataFrame, cb: DataFrame,
      idCol: String, vecCol: String, m: Int, subDim: Int): DataFrame =
    subspaces(queries, idCol, vecCol, m, subDim)
      .join(broadcast(cb), "s")
      .select(col("vid").as("query_id"), col("s"), col("cid"), l2sq(col("sv"), col("cv")).as("dd"))
      .groupBy("query_id", "s")
      .agg(sort_array(collect_list(struct(col("cid"), col("dd")))).as("cd"))
      .select(col("query_id"), col("s"), expr("transform(cd, c -> c.dd)").as("l"))
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("s"), col("l")))).as("sl"))
      .select(col("query_id"), expr("transform(sl, x -> x.l)").as("luts"))

  private def adcScore: Column =
    aggregate(zip_with(col("codes"), col("luts"),
        (c, l) => element_at(l, c + 1)),
      lit(0.0), (acc, x) => acc + x).as("approx_d2")

  /** IVF-PQ search — the composed index (the FAISS `IVFPQ` shape):
    * a coarse quantizer routes each vector to its max-cosine centroid's
    * inverted list, the corpus is stored ONLY as (cluster_id, m codes)
    * — at production dims that is ~32× smaller than the raw vectors —
    * and a query ADC-scores just its own cluster's codes through the
    * broadcast LUT. Query-time cost drops by the cluster fan-out ON TOP
    * of PQ's per-candidate speedup, and the raw corpus vectors are
    * never read at query time (they exist only inside the offline
    * encode/assign passes).
    *
    * Plan shape: encode + assign are offline builds (broadcast joins +
    * one groupBy each); at query time the (cluster_id, codes) frame
    * meets the broadcast (query LUT ⋈ query cluster) frame in an
    * equi-join on cluster_id — never a cross join — followed by the
    * per-query top-k window on O(candidates-in-cluster) rows.
    *
    * `nprobe` is the recall knob ([[Similarity.ivfAssignMulti]]): the
    * query side carries its `nprobe` nearest clusters, widening the
    * equi-join's candidate volume linearly while the corpus side — each
    * vector stored in exactly ONE inverted list — stays untouched, so
    * no candidate can appear twice and no distinct is needed. Routing
    * loss (the true neighbor across a Voronoi boundary) is what extra
    * probes buy back; quantization loss needs more codebook bits. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      cb: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int, kTop: Int, nprobe: Int = 1): DataFrame = {
    val codes = encode(corpus, cb, idCol, vecCol, m, subDim)
      .join(Similarity.ivfAssign(corpus, centroids, idCol, vecCol), idCol)
      .select(col(idCol).as("corpus_id"), col("cluster_id"), col("codes"))
    val qside = queryLuts(queries, cb, idCol, vecCol, m, subDim)
      .join(Similarity.ivfAssignMulti(queries, centroids, idCol, vecCol, nprobe)
        .select(col(idCol).as("query_id"), col("cluster_id")), "query_id")
    val w = Window.partitionBy("query_id").orderBy(col("approx_d2").asc, col("corpus_id"))
    codes.join(broadcast(qside), "cluster_id")
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), col("cluster_id"), adcScore)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
  }

  /** Residual-encoded IVF-PQ — the fidelity FAISS's IVFPQ actually
    * ships: instead of PQ-coding the raw vector, each vector is coded as
    * its RESIDUAL from its coarse centroid (r = x − c), and the query
    * LUT is built on the query's residual from the SAME probed centroid
    * (q − c), so the ADC score approximates ‖(q−c) − r̂‖² = ‖q − x̂‖²
    * with x̂ = c + r̂. Residuals concentrate near zero once the coarse
    * quantizer has absorbed the between-cluster variance, so the same
    * m·log₂(k) bits quantize a much smaller cell — reconstruction error
    * drops versus raw-vector codes (spec-pinned on a two-cluster
    * corpus where raw PQ must straddle both clusters).
    *
    * Scale shape matches [[ivfPqTopK]] — codes + cluster id per corpus
    * vector, broadcast LUTs, equi-join on cluster_id — with one
    * difference: the LUT is per (query, probed cluster), because the
    * query residual changes with the centroid; `nprobe` therefore
    * multiplies only the broadcast LUT count (queries × nprobe × m·k
    * doubles), never the corpus side.
    *
    * Determinism: the residual subtraction is one `zip_with` both
    * engines fold identically; codebooks train on residuals through the
    * same integer-grid means as [[codebooks]]. */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int, k: Int, iters: Int, kTop: Int,
      nprobe: Int = 1): DataFrame = {
    val centVec = centroids.select(col(idCol).as("cluster_id"),
      Similarity.asDoubleVec(col(vecCol)).as("_cv0"))
    val resid = corpus
      .select(col(idCol), Similarity.asDoubleVec(col(vecCol)).as("_vv"))
      .join(Similarity.ivfAssign(corpus, centroids, idCol, vecCol), idCol)
      .join(broadcast(centVec), "cluster_id")
      .select(col(idCol), col("cluster_id"),
        zip_with(col("_vv"), col("_cv0"), (x, c) => x - c).as("rv"))
      .localCheckpoint(true)
    val cb = codebooks(resid, idCol, "rv", m, subDim, k, iters)
    val codes = encode(resid, cb, idCol, "rv", m, subDim)
      .join(resid.select(col(idCol), col("cluster_id")), idCol)
      .select(col(idCol).as("corpus_id"), col("cluster_id"), col("codes"))
    val qResid = queries
      .select(col(idCol).as("query_id"), Similarity.asDoubleVec(col(vecCol)).as("_qv"))
      .join(Similarity.ivfAssignMulti(queries, centroids, idCol, vecCol, nprobe)
        .select(col(idCol).as("query_id"), col("cluster_id")), "query_id")
      .join(broadcast(centVec), "cluster_id")
      .select(col("query_id"), col("cluster_id"),
        zip_with(col("_qv"), col("_cv0"), (x, c) => x - c).as("qrv"))
    // Per-(query, cluster) LUTs — queryLuts keys on the id alone, but
    // the residual changes with the probed centroid. Same wrong-length
    // guard as subspaces (zip_with would null-pad silently).
    val guard = assert_true(size(col("qrv")) === m * subDim,
      concat(lit(s"Pq: expected dim ${m * subDim} but query residual has "),
        size(col("qrv")).cast("string"), lit(" elements")))
    val slices = array((0 until m).map(j =>
      slice(col("qrv"), j * subDim + 1, subDim)): _*)
    val lut = qResid
      .select(col("query_id"),
        (col("cluster_id") + coalesce(guard.cast("long"), lit(0L))).as("cluster_id"),
        posexplode(slices).as(Seq("s", "sv")))
      .join(broadcast(cb), "s")
      .select(col("query_id"), col("cluster_id"), col("s"), col("cid"),
        l2sq(col("sv"), col("cv")).as("dd"))
      .groupBy("query_id", "cluster_id", "s")
      .agg(sort_array(collect_list(struct(col("cid"), col("dd")))).as("cd"))
      .select(col("query_id"), col("cluster_id"), col("s"),
        expr("transform(cd, c -> c.dd)").as("l"))
      .groupBy("query_id", "cluster_id")
      .agg(sort_array(collect_list(struct(col("s"), col("l")))).as("sl"))
      .select(col("query_id"), col("cluster_id"),
        expr("transform(sl, x -> x.l)").as("luts"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx_d2").asc, col("corpus_id"))
    codes.join(broadcast(lut), "cluster_id")
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), col("cluster_id"), adcScore)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
  }

  /** ADC shortlist → EXACT rerank — the standard production composition
    * (FAISS's refine stage): [[ivfPqTopK]] produces a `shortlist`-sized
    * candidate list per query from the compressed codes, then ONLY those
    * candidates' raw vectors are read back for an exact squared-L2
    * rerank to the final `kTop`. This is where PQ's quantization error
    * gets bought back: the codes bound how many raw vectors are touched
    * (shortlist × queries, not the corpus), the rerank restores exact
    * ordering among them.
    *
    * Scale shape: the shortlist frame is O(queries · shortlist) — always
    * broadcast into the join against the corpus raw vectors, so the
    * corpus side is ONE broadcast-hash probe (no corpus shuffle, raw
    * vectors stream through the scan exactly once); the query vectors
    * broadcast too. Output carries `approx_rank` next to the exact rank
    * so the reorder the rerank performed is observable.
    *
    * Determinism: exact_d2 is the same one-fold [[l2sq]] both the exact
    * chains and the oracle replay; ties break on corpus_id. */
  def ivfPqRerank(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      cb: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int, kTop: Int, shortlist: Int, nprobe: Int = 1): DataFrame = {
    val short = ivfPqTopK(corpus, queries, centroids, cb, idCol, vecCol,
        m, subDim, shortlist, nprobe)
      .select(col("query_id"), col("corpus_id"), col("rank").as("approx_rank"))
    val cvec = corpus.select(col(idCol).as("corpus_id"),
      Similarity.asDoubleVec(col(vecCol)).as("cv"))
    val qvec = queries.select(col(idCol).as("query_id"),
      Similarity.asDoubleVec(col(vecCol)).as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("exact_d2").asc, col("corpus_id"))
    cvec.join(broadcast(short), "corpus_id")
      .join(broadcast(qvec), "query_id")
      .select(col("query_id"), col("corpus_id"), col("approx_rank"),
        l2sq(col("cv"), col("qv")).as("exact_d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
  }
}
