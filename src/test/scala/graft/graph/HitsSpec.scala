package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** HITS kernel contracts the qg14 oracle can't see from the gate:
  * hand-computed scores on a star graph, the directed-role separation
  * (pure hubs score 0 authority and vice versa), weighted vs
  * parallel-edge equivalence, and partitioning invariance.
  */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "hits-spec")
  import spark.implicits._

  private def scores(
      edges: Seq[(Long, Long, Double)],
      iters: Int): Map[Long, (Double, Double)] =
    Hits.run(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  // multi-term Σ w·score sums associate differently across partitionings
  // (the same bounded slack qg9 carries), so all comparisons run at the
  // gate's 6-dp output contract, never on raw doubles
  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
  private def approx(x: Double, y: Double): Boolean = math.abs(x - y) < 1e-9

  test("two-iteration star graph matches the hand-computed fixpoint steps") {
    // 1 -> {10, 11, 12}, 2 -> 10. Iter 1: a = (10: 2, 11: 1, 12: 1)
    // -> max-norm (1, 1/2, 1/2); h = (1: 2, 2: 1) -> (1, 1/2).
    // Iter 2: a = (10: 3/2, 11: 1, 12: 1) -> (1, 2/3, 2/3);
    // h = (1: 7/3, 2: 1) -> (1, 3/7).
    val s = scores(
      Seq((1L, 10L, 1.0), (1L, 11L, 1.0), (1L, 12L, 1.0), (2L, 10L, 1.0)),
      iters = 2)
    assert(s(1L)._1 == 1.0 && approx(s(2L)._1, 3.0 / 7.0))
    assert(s(10L)._2 == 1.0 && approx(s(11L)._2, 2.0 / 3.0)
      && approx(s(12L)._2, 2.0 / 3.0))
    // pure hubs have no authority; pure authorities have no hubness
    assert(s(1L)._2 == 0.0 && s(2L)._2 == 0.0)
    assert(Seq(10L, 11L, 12L).forall(n => s(n)._1 == 0.0))
  }

  test("weight doubling ≡ parallel duplicate edge (weights pre-sum)") {
    val weighted = scores(
      Seq((1L, 10L, 2.0), (1L, 11L, 1.0), (2L, 11L, 1.0)), iters = 3)
    val parallel = scores(
      Seq((1L, 10L, 1.0), (1L, 10L, 1.0), (1L, 11L, 1.0), (2L, 11L, 1.0)),
      iters = 3)
    assert(weighted.keySet == parallel.keySet)
    weighted.foreach { case (n, (h, a)) =>
      assert(r6(h) == r6(parallel(n)._1) && r6(a) == r6(parallel(n)._2), s"node $n")
    }
  }

  test("deterministic under repartitioning (at the 6-dp output contract)") {
    val edges = (1 to 60).map(i =>
      ((i % 7).toLong, (i % 11 + 20).toLong, (i % 3 + 1).toDouble))
    val a = scores(edges, iters = 3)
    val b = Hits.run(
        edges.toDF("src", "dst", "w").repartition(13), "src", "dst", "w", 3)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (n, (h, au)) =>
      assert(r6(h) == r6(b(n)._1) && r6(au) == r6(b(n)._2), s"node $n")
    }
  }

  test("rejects zero iterations and an empty graph") {
    intercept[IllegalArgumentException](
      Hits.run(Seq((1L, 2L, 1.0)).toDF("src", "dst", "w"), "src", "dst", "w", 0))
    intercept[IllegalArgumentException](
      Hits.run(
        Seq.empty[(Long, Long, Double)].toDF("src", "dst", "w"),
        "src", "dst", "w", 2))
  }
}
