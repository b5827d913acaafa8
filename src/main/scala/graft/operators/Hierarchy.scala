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
  * PENDING state frame against the full state (never the payload);
  * resolved rows are checkpointed exactly once, the round they resolve
  * — the per-round checkpoint I/O is the shrinking pending set, not
  * O(N·log D). Pre-partitioning both sides on id makes the rounds
  * exchange-free at 100 TB node counts.
  *
  * Bad inputs fail loudly, each with its own diagnosis: a label
  * containing `sep` (would silently corrupt depth) trips an up-front
  * require; a CYCLE leaves a round with zero dangling pointers and
  * zero progress; a DANGLING parent id (absent from the node set)
  * is detected at the join itself.
  */
object Hierarchy {

  /** @param nodes     one row per node
    * @param idCol     node id (unique)
    * @param parentCol parent id; NULL marks a root
    * @param labelCol  label used in the path (must not contain `sep` —
    *                  enforced)
    * @param maxDepth  upper bound on tree depth (the round cap is
    *                  ⌈log₂ maxDepth⌉+2 — generous, trips only on
    *                  genuinely deeper data)
    * @return (id, root_id, depth, path): depth = edges from root,
    *         path = labels root→node joined by `sep` */
  def flatten(nodes: DataFrame, idCol: String, parentCol: String,
              labelCol: String, maxDepth: Int = 1024,
              sep: String = "/"): DataFrame = {
    require(nodes.filter(col(labelCol).contains(sep)).limit(1).isEmpty,
      s"labels must not contain the path separator '$sep' — " +
        "depth and path parsing would silently corrupt")
    // State invariant: `path` covers the chain (anc, node] — when anc
    // is null it covers root→node and `root` holds the root's id.
    val init = nodes.select(
      col(idCol).as("id"),
      col(parentCol).as("anc"),
      when(col(parentCol).isNull, col(idCol)).as("root"),
      col(labelCol).cast("string").as("path")).localCheckpoint()
    var doneParts = List(init.filter(col("anc").isNull))
    var pending = init.filter(col("anc").isNotNull)
    val rounds = (math.ceil(math.log(math.max(maxDepth, 2)) / math.log(2))
      .toInt + 2)
    var pendingN = pending.count()
    var round = 0
    while (pendingN > 0) {
      round += 1
      require(round <= rounds,
        s"hierarchy did not resolve in $rounds doubling rounds " +
          s"($pendingN pointers open) — depth exceeds $maxDepth")
      // Ancestor lookup must see the FULL state: a pending pointer can
      // reference a node resolved in an earlier round. The union is
      // plan-only — every part is already checkpointed.
      val anc = (doneParts :+ pending).reduce(_ unionByName _)
        .select(col("id").as("a_id"), col("anc").as("a_anc"),
          col("root").as("a_root"), col("path").as("a_path"))
      val jumped = pending.join(anc, col("anc") === col("a_id"), "left")
        .select(col("id"),
          when(col("a_id").isNull, col("anc")).otherwise(col("a_anc")).as("anc"),
          col("a_root").as("root"),
          when(col("a_id").isNull, col("path"))
            .otherwise(concat(col("a_path"), lit(sep), col("path"))).as("path"),
          col("a_id").isNull.as("dangling"))
        .localCheckpoint()
      val danglingN = jumped.filter(col("dangling")).count()
      require(danglingN == 0,
        s"$danglingN parent pointers reference ids absent from the " +
          "node set (dangling parents)")
      doneParts :+= jumped.filter(col("anc").isNull).drop("dangling")
      pending = jumped.filter(col("anc").isNotNull).drop("dangling")
      val open = pending.count()
      require(open < pendingN,
        s"no pointer resolved in round $round ($open open, none " +
          "dangling) — the parent graph contains a cycle")
      pendingN = open
    }
    doneParts.reduce(_ unionByName _)
      .select(col("id"), col("root").as("root_id"),
        (size(split(col("path"), java.util.regex.Pattern.quote(sep))) - 1)
          .as("depth"),
        col("path"))
  }
}
