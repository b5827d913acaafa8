package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank (Brin & Page '98) in DataFrame algebra — the classic
  * link-centrality signal crawl-curation pipelines use to weight domains
  * and documents before sampling training data.
  *
  * Per iteration: contributions `pr/outdeg` flow along edges (one join
  * keyed on src), reduce per destination (one hash aggregate keyed on
  * dst — PageRank's irreducible communication pattern), and dangling
  * mass redistributes uniformly. At scale, hash-partition `edges` by src
  * ONCE up front: the per-iteration ranks join then reuses that
  * partitioning and only the dst-keyed aggregate shuffles. Ranks are
  * `localCheckpoint`ed each round (|V| small rows) so lineage stays flat
  * across iterations, the same shape as connected components'
  * label-propagation loop.
  *
  * Determinism (oracle contract): per-edge contributions and dangling
  * mass accumulate in FIXED POINT — `floor(x·10¹²)` summed as
  * DECIMAL(38,0), then one correctly-rounded division back to double.
  * The product x·10¹² is the same IEEE multiply on both engines and
  * floor is exact, where `round(x, 12)` is NOT portable: Spark rounds
  * the shortest string repr (`BigDecimal.valueOf`) while DuckDB rounds
  * the scaled double, and across ~10⁴ roundings per iteration a
  * divergent boundary cell is near-certain (observed at sf0.1). The
  * dangling mass is a per-iteration driver scalar — model state like a
  * GD weight vector, not row data.
  */
object PageRank {

  /** Ranks after `iters` damped rounds. `nodes` must have one row per
    * vertex (column `idCol`); `edges` columns (src, dst) reference those
    * ids. Returns (idCol, pr); Σpr ≈ 1. */
  def run(nodes: DataFrame, edges: DataFrame, idCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    val nD = nodes.count().toDouble
    val e = edges.localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
      .localCheckpoint(true)
    var ranks = nodes.select(col(idCol).as("nid"), (lit(1.0) / lit(nD)).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters)
      ranks = round(nodes, e, outdeg, ranks, idCol, nD, damping).localCheckpoint(true)
    ranks.select(col("nid").as(idCol), col("pr"))
  }

  /** ONE damped round, pre-checkpoint — exposed so PlanGuardsSpec can pin
    * the per-iteration plan shape (two rank/degree attach joins, exactly
    * one dst-keyed aggregate exchange, no cartesian fallback) against the
    * REAL iteration body rather than a re-derived twin. */
  private[graft] def round(nodes: DataFrame, e: DataFrame, outdeg: DataFrame,
      ranks: DataFrame, idCol: String, nD: Double, damping: Double): DataFrame = {
    val inflow = e.join(ranks, col("src") === col("nid"))
      .join(outdeg, "src")
      .select(col("dst"),
        floor((col("pr") / col("deg")) * lit(1.0e12)).cast("decimal(38,0)").as("c"))
      .groupBy("dst")
      .agg((sum(col("c")).cast("double") / lit(1.0e12)).as("inflow"))
    val dm = ranks.join(outdeg, ranks("nid") === outdeg("src"), "left_anti")
      .agg(coalesce(
        sum(floor(col("pr") * lit(1.0e12)).cast("decimal(38,0)")).cast("double") /
          lit(1.0e12),
        lit(0.0)))
      .first().getDouble(0)
    nodes.select(col(idCol).as("nid"))
      .join(inflow, col("nid") === col("dst"), "left")
      .select(col("nid"),
        (lit(1.0 - damping) / lit(nD) + lit(damping) *
          (coalesce(col("inflow"), lit(0.0)) + lit(dm) / lit(nD))).as("pr"))
  }
}
