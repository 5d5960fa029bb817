package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** PageRank kernel contracts no SQL oracle can see from the gate:
  * closed-form values on hand graphs, mass conservation, dangling-node
  * redistribution, parallel-edge additivity, and damping edges.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "pagerank-spec")
  import spark.implicits._

  private def ranks(
      edges: Seq[(Long, Long, Double)],
      iters: Int,
      d: Double = 0.85): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters, d)
      .as[(Long, Double)].collect().toMap

  test("2-cycle: symmetric graph stays uniform at every iteration count") {
    val e = Seq((1L, 2L, 1.0), (2L, 1L, 1.0))
    for (it <- Seq(0, 1, 5)) {
      val r = ranks(e, it)
      assert(math.abs(r(1L) - 0.5) < 1e-12 && math.abs(r(2L) - 0.5) < 1e-12)
    }
  }

  test("closed form: 3-chain with back-edges matches hand-iterated values") {
    // 1 -> 2, 2 -> 3, 3 -> 1 (a 3-cycle): uniform is the fixed point
    val cyc = ranks(Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0)), 7)
    cyc.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    // 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 2: hand-run one iteration from uniform
    // r1(1) = 0.05 (no in-edges, no dangling)
    // r1(2) = 0.05 + 0.85*(1/3 * 1/2 + 1/3 * 1) = 0.475
    // r1(3) = 0.05 + 0.85*(1/3 * 1/2 + 1/3 * 1) = 0.475
    val r = ranks(Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0), (3L, 2L, 1.0)), 1)
    assert(math.abs(r(1L) - 0.05) < 1e-12)
    assert(math.abs(r(2L) - 0.475) < 1e-12)
    assert(math.abs(r(3L) - 0.475) < 1e-12)
  }

  test("mass conservation: sum of ranks is 1 even with dangling nodes") {
    // 3 is dangling (appears only as dst)
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (1L, 3L, 3.0))
    for (it <- Seq(1, 4)) {
      val r = ranks(e, it)
      assert(math.abs(r.values.sum - 1.0) < 1e-12, s"iter=$it ranks=$r")
    }
  }

  test("dangling mass redistributes uniformly, not silently dropped") {
    // star into a sink: 1 -> 3, 2 -> 3; 3 dangling
    // r1(3) = 0.05 + 0.85*(1/3 + 1/3) + 0.85*(1/3)/3
    val r = ranks(Seq((1L, 3L, 1.0), (2L, 3L, 1.0)), 1)
    val expected3 = 0.05 + 0.85 * (2.0 / 3) + 0.85 * (1.0 / 3) / 3
    val expected1 = 0.05 + 0.85 * (1.0 / 3) / 3
    assert(math.abs(r(3L) - expected3) < 1e-12)
    assert(math.abs(r(1L) - expected1) < 1e-12)
    assert(math.abs(r(2L) - expected1) < 1e-12)
  }

  test("parallel edges add; weights shift rank toward the heavy target") {
    // duplicate (1,2) edges must equal a single edge of summed weight
    val dup = ranks(Seq((1L, 2L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0), (2L, 1L, 1.0), (3L, 1L, 1.0)), 4)
    val merged = ranks(Seq((1L, 2L, 3.0), (1L, 3L, 3.0), (2L, 1L, 1.0), (3L, 1L, 1.0)), 4)
    dup.foreach { case (k, v) => assert(math.abs(v - merged(k)) < 1e-12) }
    // heavier edge -> more rank
    val skew = ranks(Seq((1L, 2L, 9.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0)), 4)
    assert(skew(2L) > skew(3L))
  }

  test("personalized: hand-computed 2-step walk from the source, mass conserved") {
    import spark.implicits._
    // cycle 1 -> 2 -> 3 -> 1, restart at 1:
    // r0 = (1, 0, 0); r1 = (0.15, 0.85, 0);
    // r2 = (0.15, 0.85·0.15, 0.85·0.85)
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0))
    val got = PageRank
      .run(e.toDF("src", "dst", "w"), "src", "dst", "w", 2,
        personalizedTo = Some(1L))
      .as[(Long, Double)].collect().toMap
    // 1 − 0.85 is 0.15000000000000002, not 0.15 — replay the exact
    // expression (the gate's 6-dp round is what absorbs this vs the
    // oracle's literal)
    val restart = 1.0 - 0.85
    assert(got(1L) == restart && got(2L) == 0.85 * restart && got(3L) == 0.85 * 0.85)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // a personalized dangling sink returns its mass to the SOURCE,
    // not uniformly: 1 -> 2 (2 dangling) keeps Σrank = 1
    val sink = PageRank
      .run(Seq((1L, 2L, 1.0)).toDF("src", "dst", "w"), "src", "dst", "w", 10,
        personalizedTo = Some(1L))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(sink.values.sum - 1.0) < 1e-9)
    assert(sink(1L) > sink(2L)) // restart + returned mass concentrate at 1
  }

  test("damping 1.0 removes teleport; damping 0.0 is uniform regardless of edges") {
    val e = Seq((1L, 2L, 1.0), (2L, 1L, 1.0), (1L, 3L, 1.0), (3L, 1L, 1.0))
    val d0 = ranks(e, 3, d = 0.0)
    d0.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    val d1 = ranks(e, 50, d = 1.0)
    assert(math.abs(d1.values.sum - 1.0) < 1e-9)
    // validations
    intercept[IllegalArgumentException](ranks(e, -1))
    intercept[IllegalArgumentException](ranks(e, 1, d = 1.5))
  }
}
