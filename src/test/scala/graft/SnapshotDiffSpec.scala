package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, SnapshotDiff}

/** Snapshot differ ([[graft.operators.SnapshotDiff]]): minimal I/U/D
  * output, null-safe value comparison (null→value and value→null are
  * updates; null=null is not), null keys matched null-safely, and the
  * roundtrip law diff∘apply = identity against [[Cdc.applyChangelog]].
  */
class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  private val keyCols = Seq("k")
  private val valCols = Seq("v", "s")

  private def snapA = Seq[(java.lang.Long, java.lang.Double, String)](
    (1L, 10.0, "a"),   // unchanged
    (2L, 20.0, "b"),   // value update
    (3L, null, "c"),   // null -> value update
    (4L, 40.0, null),  // deleted in B
    (6L, 60.0, "f"),   // both columns change
    (null, 70.0, "g")  // null key, unchanged (null-safe key match)
  ).toDF("k", "v", "s")

  private def snapB = Seq[(java.lang.Long, java.lang.Double, String)](
    (1L, 10.0, "a"),
    (2L, 25.0, "b"),
    (3L, 30.0, "c"),
    (5L, 50.0, "e"),   // inserted
    (6L, 61.0, "ff"),
    (null, 70.0, "g")
  ).toDF("k", "v", "s")

  test("minimal changelog with per-column attribution") {
    val d = SnapshotDiff.diff(snapA, snapB, keyCols, valCols)
      .orderBy(asc_nulls_first("k"))
      .select("k", "op", "changed_cols")
      .as[(Option[Long], String, String)].collect().toSeq
    assert(d == Seq(
      (Some(2L), "U", "v"),
      (Some(3L), "U", "v"),
      (Some(4L), "D", ""),
      (Some(5L), "I", ""),
      (Some(6L), "U", "v,s")))
    // keys 1 and null produced no row: identical under null-safe compare
  }

  test("old/new payloads carry the snapshot values") {
    val row = SnapshotDiff.diff(snapA, snapB, keyCols, valCols)
      .where(col("k") === 3L)
      .select("old_v", "new_v", "old_s", "new_s")
      .as[(Option[Double], Option[Double], String, String)].head()
    assert(row == ((None, Some(30.0), "c", "c")))
  }

  test("roundtrip: applying the diff to A reproduces B") {
    val d = SnapshotDiff.diff(snapA, snapB, keyCols, valCols)
    val log = SnapshotDiff.asChangelog(snapA, d, keyCols, valCols)
    val replayed = Cdc.applyChangelog(log, keyCols, col("seq"),
        col("cdc_op"), valCols)
      .select("k", "v", "s")
    val want = snapB
    assert(replayed.exceptAll(want).isEmpty && want.exceptAll(replayed).isEmpty)
  }

  test("reserved-name collision fails loudly") {
    val bad = snapA.withColumnRenamed("v", "op")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(bad, bad, keyCols, Seq("op", "s"))
    }
    // asChangelog's working columns too: a payload named "seq" would be
    // silently REPLACED by the replay ordering otherwise.
    val seqy = snapA.withColumnRenamed("v", "seq")
    intercept[IllegalArgumentException] {
      SnapshotDiff.asChangelog(seqy,
        SnapshotDiff.diff(snapA, snapB, keyCols, valCols), keyCols, Seq("seq", "s"))
    }
  }
}
