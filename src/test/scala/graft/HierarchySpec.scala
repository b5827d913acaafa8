package graft

import org.apache.spark.sql.functions._

import graft.operators.Hierarchy

/** Hierarchy flattener ([[graft.operators.Hierarchy]]): multi-root
  * forests, log-round resolution of deep chains, path/depth/root
  * correctness, and loud failure on cycles and dangling parents.
  */
class HierarchySpec extends SparkTestBase {
  import spark.implicits._

  private def flat(rows: Seq[(java.lang.Long, java.lang.Long, String)]) =
    Hierarchy.flatten(rows.toDF("id", "parent", "label"),
      "id", "parent", "label")
      .orderBy("id")
      .as[(Long, Long, Int, String)].collect().toSeq

  test("forest with two roots: root, depth, and path per node") {
    val got = flat(Seq(
      (1L, null, "a"), (2L, 1L, "b"), (3L, 1L, "c"), (4L, 2L, "d"),
      (10L, null, "x"), (11L, 10L, "y")))
    assert(got == Seq(
      (1L, 1L, 0, "a"), (2L, 1L, 1, "a/b"), (3L, 1L, 1, "a/c"),
      (4L, 1L, 2, "a/b/d"), (10L, 10L, 0, "x"), (11L, 10L, 1, "x/y")))
  }

  test("depth-10 chain resolves (doubling, not one join per level)") {
    val chain = (0L to 10L).map(i =>
      (i: java.lang.Long, if (i == 0) null else (i - 1): java.lang.Long, s"n$i"))
    val got = flat(chain)
    assert(got.size == 11)
    assert(got.last == ((10L, 0L, 10, (0L to 10L).map("n" + _).mkString("/"))))
  }

  test("depth-300 chain resolves under the log₂ round cap") {
    // maxDepth=512 caps the loop at ⌈log₂512⌉+2 = 11 rounds; a linear
    // one-level-per-round climber would trip the cap at depth 300, so
    // success IS the doubling proof.
    val chain = (0L to 300L).map(i =>
      (i: java.lang.Long, if (i == 0) null else (i - 1): java.lang.Long, "x"))
    val got = Hierarchy.flatten(chain.toDF("id", "parent", "label"),
        "id", "parent", "label", maxDepth = 512)
      .where(col("id") === 300L)
      .as[(Long, Long, Int, String)].head()
    assert(got._1 == 300L && got._2 == 0L && got._3 == 300)
    assert(got._4 == Seq.fill(301)("x").mkString("/"))
  }

  test("cycle fails loudly") {
    val e = intercept[IllegalArgumentException] {
      flat(Seq((1L, 2L, "a"), (2L, 1L, "b")))
    }
    assert(e.getMessage.contains("cycle") || e.getMessage.contains("resolve"))
  }

  test("dangling parent fails loudly") {
    val e = intercept[IllegalArgumentException] {
      flat(Seq((1L, null, "a"), (2L, 99L, "b")))
    }
    assert(e.getMessage.contains("dangling") || e.getMessage.contains("resolve"))
  }
}
