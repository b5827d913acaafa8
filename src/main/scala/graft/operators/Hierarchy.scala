package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive hierarchy flattening (org charts, bills of material,
  * account rollup trees): per node its root, depth, and the full
  * root-to-node label path — the one classic relational shape Spark
  * has no native recursion for (no CONNECT BY, no recursive CTE).
  *
  * Spark-first answer: POINTER DOUBLING, the same technique behind the
  * connected-components labeler (llm dedup chains). Each round joins
  * every unfinished node's topmost-known ancestor to THAT node's state,
  * concatenating path segments — so the frontier climbs 1, 2, 4, 8, …
  * edges per round and a depth-D forest finishes in ⌈log₂ D⌉+1 rounds,
  * not D self-joins. Each round is ONE equi-join shuffle of the
  * node-sized state frame (never the payload), localCheckpointed to
  * truncate lineage. At 100 TB-scale node counts the state frame is
  * still just (id, anc, root, path); pre-partitioning both sides on id
  * makes the rounds exchange-free after the first.
  *
  * Cycles and dangling parents fail loudly: a cycle can never resolve
  * its anc pointer to null, so the round cap trips a `require`; a
  * parent id absent from the node set drops its subtree at the join and
  * trips the completeness `require` on the same round.
  */
object Hierarchy {

  /** @param nodes     one row per node
    * @param idCol     node id (unique)
    * @param parentCol parent id; NULL marks a root
    * @param labelCol  label used in the path (must not contain `sep`)
    * @param maxDepth  upper bound on tree depth (the round cap is
    *                  ⌈log₂ maxDepth⌉+2 — generous, trips only on
    *                  cycles or genuinely deeper data)
    * @return (id, root_id, depth, path): depth = edges from root,
    *         path = labels root→node joined by `sep` */
  def flatten(nodes: DataFrame, idCol: String, parentCol: String,
              labelCol: String, maxDepth: Int = 1024,
              sep: String = "/"): DataFrame = {
    // State invariant: `path` covers the chain (anc, node] — when anc
    // is null it covers root→node and `root` holds the root's id.
    var cur = nodes.select(
      col(idCol).as("id"),
      col(parentCol).as("anc"),
      when(col(parentCol).isNull, col(idCol)).as("root"),
      col(labelCol).cast("string").as("path")).localCheckpoint()
    val rounds = (math.ceil(math.log(math.max(maxDepth, 2)) / math.log(2))
      .toInt + 2)
    var pendingN = cur.filter(col("anc").isNotNull).count()
    var round = 0
    while (pendingN > 0) {
      round += 1
      require(round <= rounds,
        s"hierarchy did not resolve in $rounds doubling rounds " +
          s"($pendingN pointers open) — cycle or depth > $maxDepth")
      val anc = cur.select(col("id").as("a_id"), col("anc").as("a_anc"),
        col("root").as("a_root"), col("path").as("a_path"))
      val pending = cur.filter(col("anc").isNotNull)
      val done = cur.filter(col("anc").isNull)
      val jumped = pending.join(anc, col("anc") === col("a_id"), "left")
        .select(col("id"),
          when(col("a_id").isNull, col("anc")).otherwise(col("a_anc")).as("anc"),
          col("a_root").as("root"),
          when(col("a_id").isNull, col("path"))
            .otherwise(concat(col("a_path"), lit(sep), col("path"))).as("path"),
          col("a_id").isNull.as("dangling"))
      // A dangling parent never resolves; count it against the cap
      // instead of spinning: leave its anc pointer open.
      cur = done.unionByName(jumped.drop("dangling")).localCheckpoint()
      val open = cur.filter(col("anc").isNotNull).count()
      require(open < pendingN || open == 0,
        s"$open parent pointers cannot resolve (dangling parent ids)")
      pendingN = open
    }
    cur.select(col("id"), col("root").as("root_id"),
      (size(split(col("path"), java.util.regex.Pattern.quote(sep))) - 1)
        .as("depth"),
      col("path"))
  }
}
