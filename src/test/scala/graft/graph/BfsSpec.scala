package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** BFS hop-distance contracts: hand-computable layers, unreachable
  * nodes absent, isolated source, messy-input canonicalization, and
  * the maxDepth diameter guard.
  */
class BfsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "bfs-spec")
  import spark.implicits._

  private def hops(edges: Seq[(Long, Long)], src: Long, maxDepth: Int = 64): Map[Long, Int] =
    Bfs.hops(edges.toDF("x", "y"), "x", "y", src, maxDepth)
      .as[(Long, Int)].collect().toMap

  test("layers on a lollipop: triangle + tail, distances exact") {
    // triangle 0-1-2 with a tail 2-3-4-5; distances from 0
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 5L))
    val d = hops(e, 0L)
    assert(d == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("unreachable component absent; isolated source emits (src, 0)") {
    val e = Seq((0L, 1L), (7L, 8L))
    assert(hops(e, 0L) == Map(0L -> 0, 1L -> 1))
    // source not touching any edge: just the seed row
    assert(hops(e, 42L) == Map(42L -> 0))
  }

  test("duplicates, self-loops and reversed orientations canonicalize") {
    val e = Seq((0L, 1L), (1L, 0L), (0L, 0L), (1L, 2L), (1L, 2L))
    assert(hops(e, 0L) == Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("maxDepth guard throws on a path deeper than the bound") {
    val chain = (0L until 6L).map(i => (i, i + 1)) // eccentricity 6
    val ex = intercept[IllegalStateException](hops(chain, 0L, maxDepth = 3))
    assert(ex.getMessage.contains("maxDepth"))
    // and succeeds at the exact depth
    assert(hops(chain, 0L, maxDepth = 6).size == 7)
  }
}
