package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** K-core contracts: deep-cascade peeling (the fixpoint property a
  * fixed-depth loop would miss), hand-computable cores, canonicalization
  * of messy inputs, and the empty-core edge.
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "kcore-spec")
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    KCore.decompose(edges.toDF("x", "y"), "x", "y", k)
      .as[(Long, Long)].collect().toMap

  test("path dissolves at k=2 layer by layer — the deep cascade") {
    // a 12-node path needs 6 peel rounds: only the endpoints are
    // sub-k each round. A fixed-depth loop would leave a phantom core.
    val path = (0L until 11L).map(i => (i, i + 1))
    assert(core(path, 2) == Map.empty)
    // at k=1 everything survives with degree >= 1
    val c1 = core(path, 1)
    assert(c1.keySet == (0L to 11L).toSet && c1(0L) == 1L && c1(5L) == 2L)
  }

  test("cycle survives k=2 whole; chord raises only local degrees") {
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6))
    val c = core(cycle, 2)
    assert(c == (0L until 6L).map(i => i -> 2L).toMap)
    // chord 0-3: those two nodes now have degree 3 in the 2-core
    val chord = core(cycle :+ ((0L, 3L)), 2)
    assert(chord(0L) == 3L && chord(3L) == 3L && chord(1L) == 2L)
  }

  test("K5 with a pendant tail: tail peels, clique stands until k=5") {
    val k5 = for (i <- 0L until 5L; j <- i + 1 until 5L) yield (i, j)
    val tail = Seq((4L, 10L), (10L, 11L))
    val c4 = core(k5 ++ tail, 4)
    assert(c4 == (0L until 5L).map(i => i -> 4L).toMap, s"got $c4")
    assert(core(k5 ++ tail, 5) == Map.empty)
  }

  test("two cliques joined by a bridge: cores are independent of the bridge") {
    val a = for (i <- 0L until 4L; j <- i + 1 until 4L) yield (i, j) // K4
    val b = for (i <- 10L until 15L; j <- i + 1 until 15L) yield (i, j) // K5
    val g = a ++ b ++ Seq((3L, 10L))
    val c3 = core(g, 3)
    assert(c3.keySet == (0L until 4L).toSet ++ (10L until 15L).toSet)
    // at k=4 only the K5 stands — the bridge doesn't rescue K4
    assert(core(g, 4).keySet == (10L until 15L).toSet)
  }

  test("messy input: duplicates, reversed orientations, self-loops") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(core(messy, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(core(Seq.empty, 2) == Map.empty)
  }
}
