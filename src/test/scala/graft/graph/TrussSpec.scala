package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** K-truss contracts: hand-computable trusses, the edge-removal cascade
  * (why fixpoint, not fixed depth), support exactness, messy-input
  * canonicalization, and the k-core relationship.
  */
class TrussSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "truss-spec")
  import spark.implicits._

  private def truss(edges: Seq[(Long, Long)], k: Int): Map[(Long, Long), Long] =
    Truss.decompose(edges.toDF("x", "y"), "x", "y", k)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap

  test("K4: every edge supports 2 triangles — a 4-truss, gone at k=5") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val t4 = truss(k4, 4)
    assert(t4.keySet == k4.toSet && t4.values.forall(_ == 2L))
    assert(truss(k4, 5) == Map.empty)
  }

  test("cascade: a triangle chain dissolves at k=4 only via repeated peeling") {
    // K4 with a pendant triangle sharing edge (3,4): edge (3,5)/(4,5)
    // support 1 -> dropped at k=4; the K4 itself survives because its
    // supports are internal
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val g = k4 ++ Seq((3L, 5L), (4L, 5L))
    val t = truss(g, 4)
    assert(t.keySet == k4.toSet, s"pendant triangle should peel: ${t.keySet}")
    // at k=3 everything with >=1 triangle survives, supports exact
    val t3 = truss(g, 3)
    assert(t3((3L, 5L)) == 1L && t3((3L, 4L)) == 3L)
  }

  test("triangle-free graphs vanish at k=3; messy input canonicalizes") {
    assert(truss(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 3) == Map.empty)
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (1L, 3L))
    assert(truss(messy, 3) ==
      Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (1L, 3L) -> 1L))
    assert(truss(Seq.empty, 3) == Map.empty)
  }

  test("two K4s sharing one vertex: both survive independently at k=4") {
    val a = for (i <- 0L until 4L; j <- i + 1 until 4L) yield (i, j)
    val b = for (i <- Seq(3L, 10L, 11L, 12L); j <- Seq(3L, 10L, 11L, 12L) if i < j)
      yield (i, j)
    val t = truss(a ++ b, 4)
    assert(t.keySet == (a ++ b).toSet)
    assert(t((0L, 1L)) == 2L && t((10L, 11L)) == 2L)
  }
}
