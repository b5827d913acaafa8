package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting + local clustering coefficient — the classic graph
  * quality signals link-curation pipelines compute next to PageRank
  * (spam subgraphs are triangle-dense; crawl frontier scoring and
  * community pruning both read the clustering coefficient).
  *
  * Algorithm: compact-forward / degree-ordered node iteration (Latapy
  * 2008). Each undirected edge is oriented from its (degree, id)-smaller
  * endpoint to the larger, making the oriented graph acyclic with
  * out-degree O(√m) on any graph — so the wedge self-join below is
  * Σ outdeg², the theoretical minimum candidate set, instead of the
  * Σ deg² a naive neighbor join pays (catastrophic on power-law graphs
  * where one hub's deg² dwarfs the whole edge list).
  *
  * Shuffle shape at 100 TB: canonicalize + distinct is one exchange on
  * (a, b); the degree attach is two joins against the |V|-row degree
  * frame; the wedge join and the closing-edge join are both equi-joins
  * keyed on vertex ids (wedge pivot u, then (y, z)) — hash-partitioned,
  * never broadcast-dependent, never all-pairs. Per-vertex counts are one
  * hash aggregate over 3 rows per triangle.
  *
  * Determinism: counts are exact integers; the only double is the final
  * lcc = 2·tri / (deg·(deg−1)) — one correctly-rounded division of exact
  * integers, bit-identical across engines.
  */
object Triangles {

  /** Canonical undirected simple edges (a < b) from any edge list —
    * drops self-loops, merges duplicates and reversed duplicates. */
  def canonical(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Per-vertex (v, deg, tri, lcc) over the undirected simple graph.
    * `deg` counts distinct neighbors; `tri` counts triangles through v;
    * `lcc` = 2·tri / (deg·(deg−1)), 0.0 when deg < 2. Covers every
    * vertex that appears in an edge (isolated vertices have no row). */
  /** Degree-ordered orientation of the canonical edges: (u, h, hd) with
    * u the (deg, id)-smaller endpoint — out-degree O(√m) on any graph,
    * the property that makes the wedge self-join Σ outdeg² instead of
    * Σ deg². Exposed so PlanGuardsSpec can pin the orientation invariant
    * (a hub never becomes a wedge pivot) against the real builder. */
  private[graft] def orientedEdges(canon: DataFrame, deg: DataFrame): DataFrame = {
    // Orient a—b from the (deg, id)-smaller endpoint to the larger.
    // Struct comparison gives the lexicographic (deg, id) order on both
    // sides without packing into a single key (ids and degrees keep
    // their native types; no overflow ceiling to document).
    val withDeg = canon
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("h"),
      when(aFirst, col("db")).otherwise(col("da")).as("hd"))
  }

  /** Degrees over the canonical simple graph (one row per vertex). */
  private[graft] def degrees(canon: DataFrame): DataFrame =
    canon.select(col("a").as("v"))
      .unionByName(canon.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))

  def perVertex(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val canon = canonical(edges, srcCol, dstCol).localCheckpoint(true)
    val deg = degrees(canon).localCheckpoint(true)
    val oriented = orientedEdges(canon, deg).localCheckpoint(true)

    // Wedges at pivot u: unordered out-neighbor pairs, canonicalized by
    // the same (deg, id) order — so the closing edge, if present, is
    // oriented y→z and the final join is a plain equi-join.
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          (struct(col("e1.hd"), col("e1.h")) < struct(col("e2.hd"), col("e2.h"))))
      .select(col("e1.u").as("x"), col("e1.h").as("y"), col("e2.h").as("z"))
    val tris = wedges.join(
      oriented.select(col("u").as("y"), col("h").as("z")), Seq("y", "z"))

    val perV = tris.select(col("x").as("v"))
      .unionByName(tris.select(col("y").as("v")))
      .unionByName(tris.select(col("z").as("v")))
      .groupBy("v").agg(count(lit(1)).as("tri"))

    deg.join(perV, Seq("v"), "left")
      .select(col("v"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("deg") < 2, lit(0.0))
          .otherwise((lit(2.0) * coalesce(col("tri"), lit(0L))) /
            (col("deg") * (col("deg") - lit(1L))).cast("double"))
          .as("lcc"))
  }

  /** Global triangle count (each triangle once). */
  def globalCount(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): Long = {
    val pv = perVertex(edges, srcCol, dstCol)
    val s = pv.agg(sum(col("tri"))).first()
    if (s.isNullAt(0)) 0L else s.getLong(0) / 3
  }
}
