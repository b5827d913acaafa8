package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differ: derive the I/U/D changelog that transforms snapshot
  * A into snapshot B — the INVERSE of [[Cdc.applyChangelog]] (Delta CDF
  * / Debezium-shaped output from plain table states, for sources that
  * can't emit a changelog themselves; the reference reconciles whole
  * snapshots, `migration_validation/reconciliation.py`, but never
  * derives the delta between them).
  *
  * Output per changed key: the key, `op` ('I'|'U'|'D'), `changed_cols`
  * (comma-joined names of the value columns that differ, '' for I/D),
  * and `old_<c>` / `new_<c>` for every compared column. Keys whose
  * compared values are null-safely identical produce NO row — the
  * changelog is minimal, so `Cdc.applyChangelog(A-as-inserts ∪ diff)`
  * reproduces B exactly (the roundtrip SnapshotDiffSpec pins).
  *
  * Scale shape: ONE full-outer sort-merge join on the key — both sides
  * shuffle once on the same partitioning; presence is detected with
  * constant marker columns (never `key IS NULL`, which a genuinely
  * null key would spoof), and every comparison is a codegen'd
  * null-safe `<=>` projection. At 100 TB, bucket both snapshots on the
  * key (s16's layout) and the join plans exchange-free.
  */
object SnapshotDiff {

  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    val reserved = Set("op", "changed_cols", "__ina", "__inb") ++
      compareCols.flatMap(c => Seq(s"old_$c", s"new_$c"))
    val colliding = (keyCols ++ compareCols).filter(reserved.contains)
    require(colliding.isEmpty,
      s"diff reserves ${reserved.mkString(", ")}; rename: ${colliding.mkString(", ")}")

    val cols = (keyCols ++ compareCols).map(col)
    val aa = a.select(cols: _*).withColumn("__ina", lit(true)).alias("a")
    val bb = b.select(cols: _*).withColumn("__inb", lit(true)).alias("b")
    val joined = aa.join(bb,
      keyCols.map(k => col(s"a.$k") <=> col(s"b.$k")).reduce(_ && _),
      "full_outer")

    val op = when(col("__ina").isNull, lit("I"))
      .when(col("__inb").isNull, lit("D"))
      .otherwise(lit("U"))
    // concat_ws skips NULL args on both engines, so the changed-column
    // list needs no array/filter machinery.
    val changed = concat_ws(",", compareCols.map(c =>
      when(!(col(s"a.$c") <=> col(s"b.$c")), lit(c))): _*)

    joined
      .withColumn("op", op)
      .withColumn("changed_cols", when(col("op") === "U", changed).otherwise(lit("")))
      .where(col("op") =!= "U" || col("changed_cols") =!= "")
      .select(keyCols.map(k => coalesce(col(s"a.$k"), col(s"b.$k")).as(k)) ++
        Seq(col("op"), col("changed_cols")) ++
        compareCols.flatMap(c => Seq(
          col(s"a.$c").as(s"old_$c"), col(s"b.$c").as(s"new_$c"))): _*)
  }

  /** The differ's output rewritten as a [[Cdc.applyChangelog]] log that
    * replays A into B: A's rows as seq-0 inserts, the diff as seq-1
    * changes carrying the NEW values (null payloads for deletes). */
  def asChangelog(a: DataFrame, d: DataFrame, keyCols: Seq[String],
                  compareCols: Seq[String]): DataFrame = {
    // Same loud-collision posture as diff() and Cdc.applyChangelog: a
    // key/payload column named like a working column would be silently
    // REPLACED by withColumn below, corrupting the replay ordering.
    val colliding = (keyCols ++ compareCols).filter(Set("seq", "cdc_op"))
    require(colliding.isEmpty,
      s"asChangelog reserves seq, cdc_op; rename: ${colliding.mkString(", ")}")
    val base = a.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("seq", lit(0L)).withColumn("cdc_op", lit("I"))
    val delta = d.select(keyCols.map(col) ++
        compareCols.map(c => col(s"new_$c").as(c)) :+
        lit(1L).as("seq") :+ col("op").as("cdc_op"): _*)
    base.unionByName(delta)
  }
}
