package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

/** Triangle counting ([[graft.operators.Triangles]]): known counts on
  * K4 / K5 / cycles, canonicalization of dirty edge lists, clustering
  * coefficient values, and partitioning-independence.
  */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def clique(n: Int) =
    (for { i <- 0 until n; j <- i + 1 until n } yield (i.toLong, j.toLong))
      .toDF("src", "dst")

  test("K4: 4 triangles, every vertex in 3, lcc = 1") {
    val pv = Triangles.perVertex(clique(4)).collect()
    assert(pv.length == 4)
    assert(pv.forall(_.getLong(1) == 3L), "deg")
    assert(pv.forall(_.getLong(2) == 3L), "tri per vertex")
    assert(pv.forall(_.getDouble(3) == 1.0), "lcc")
    assert(Triangles.globalCount(clique(4)) == 4L)
  }

  test("K5 global count is C(5,3) = 10") {
    assert(Triangles.globalCount(clique(5)) == 10L)
  }

  test("square (4-cycle) has no triangles; lcc 0") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val pv = Triangles.perVertex(e).collect()
    assert(pv.forall(_.getLong(2) == 0L))
    assert(pv.forall(_.getDouble(3) == 0.0))
  }

  test("dirty edge list: duplicates, reversals, self-loops collapse") {
    // Triangle 0-1-2 written every messy way, plus pendant 3 and a
    // self-loop; still exactly one triangle.
    val e = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (0L, 2L), (2L, 0L),
      (0L, 1L), (2L, 3L), (3L, 3L)).toDF("src", "dst")
    val pv = Triangles.perVertex(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(pv(0L) == ((2L, 1L, 1.0)))
    assert(pv(1L) == ((2L, 1L, 1.0)))
    assert(pv(2L) == ((3L, 1L, 2.0 / 6.0)))
    assert(pv(3L) == ((1L, 0L, 0.0)))
  }

  test("bowtie: shared vertex counts both triangles") {
    // Triangles 0-1-2 and 0-3-4 sharing vertex 0.
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L), (3L, 4L), (4L, 0L))
      .toDF("src", "dst")
    val pv = Triangles.perVertex(e).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pv(0L) == 2L)
    assert(Seq(1L, 2L, 3L, 4L).forall(pv(_) == 1L))
    assert(Triangles.globalCount(e) == 2L)
  }

  test("counts do not depend on input partitioning") {
    val e = (clique(5).collect().map(r => (r.getLong(0), r.getLong(1))) ++
      Seq((5L, 0L), (5L, 1L), (6L, 2L))).toSeq.toDF("src", "dst")
    val a = Triangles.perVertex(e).orderBy("v").collect().toSeq
    val b = Triangles.perVertex(e.repartition(7)).orderBy("v").collect().toSeq
    assert(a == b)
  }
}
