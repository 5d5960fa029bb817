package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Sync-LPA contracts: min-label tie rule, simultaneous (not in-place)
  * update, community convergence on separable structure, the round-0
  * identity, and oscillation on bipartite structure (why the round
  * budget is the contract).
  */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "labelprop-spec")
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelProp.run(edges.toDF("x", "y"), "x", "y", rounds)
      .as[(Long, Long)].collect().toMap

  test("two cliques with one bridge: each converges to its min label") {
    val a = for (i <- 0L until 4L; j <- i + 1 until 4L) yield (i, j)
    val b = for (i <- 10L until 14L; j <- i + 1 until 14L) yield (i, j)
    val g = a ++ b ++ Seq((3L, 10L))
    val l = run(g, 5)
    assert((0L until 4L).forall(l(_) == 0L), s"clique A: $l")
    assert((10L until 14L).forall(l(_) == 10L), s"clique B: $l")
  }

  test("round 0 is the identity labelling; one round adopts the min neighbour") {
    val tri = Seq((5L, 7L), (7L, 9L), (5L, 9L))
    assert(run(tri, 0) == Map(5L -> 5L, 7L -> 7L, 9L -> 9L))
    // each vertex's neighbour labels are distinct singletons -> min wins
    assert(run(tri, 1) == Map(5L -> 7L, 7L -> 5L, 9L -> 5L))
  }

  test("tie rule: equal counts resolve to the smallest label") {
    // 100 sits between cliques {1,2,3} and {4,5,6} with equal pull after
    // round 1 (each clique converges to its min: 1 and 4) -> 100 takes 1
    val a = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val b = Seq((4L, 5L), (5L, 6L), (4L, 6L))
    val g = a ++ b ++ Seq((100L, 1L), (100L, 4L))
    assert(run(g, 3)(100L) == 1L)
  }

  test("bipartite oscillation: a single edge swaps labels every round") {
    val e = Seq((1L, 2L))
    assert(run(e, 1) == Map(1L -> 2L, 2L -> 1L))
    assert(run(e, 2) == Map(1L -> 1L, 2L -> 2L)) // swapped back
    assert(run(e, 3) == Map(1L -> 2L, 2L -> 1L))
  }
}
