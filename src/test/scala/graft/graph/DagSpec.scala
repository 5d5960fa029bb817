package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** DAG layering contracts: longest-path-ending-at semantics against
  * hand graphs and a memoized brute-force DP, null-endpoint handling,
  * and the cycle guard (layer ≥ n proves a cycle — the operator throws
  * rather than emitting garbage ranks).
  */
class DagSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "dag-spec")
  import spark.implicits._

  private def layers(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dag.longestPathLayer(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap

  test("diamond: the layer is the LONGEST path in, not the shortest") {
    // 1→2→3→4 and the 1→4 shortcut: 4 sits at layer 3, not 1
    val got = layers(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("forest: independent chains layer independently") {
    val got = layers(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 10L -> 0L, 11L -> 1L))
  }

  test("multiple parents: layer = 1 + max over incoming, converging " +
      "at different depths") {
    // 1→5 (depth 1) and 1→2→3→5 (depth 3): 5 takes 3
    val got = layers(Seq((1L, 5L), (1L, 2L), (2L, 3L), (3L, 5L)))
    assert(got(5L) == 3L)
  }

  test("null endpoints: the edge drops but the non-null side is still " +
      "a node at layer 0; no null output row") {
    val got = Dag.longestPathLayer(
      Seq[(java.lang.Long, java.lang.Long)](
        (1L, 2L), (3L, null), (null, 4L))
        .toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
  }

  test("a cycle throws (including a self-loop) instead of converging " +
      "to garbage") {
    val e1 = intercept[IllegalArgumentException] {
      layers(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    }
    assert(e1.getMessage.contains("cycle"))
    val e2 = intercept[IllegalArgumentException] {
      layers(Seq((1L, 2L), (7L, 7L)))
    }
    assert(e2.getMessage.contains("cycle"))
  }

  test("criticalPath: the SLOWER chain binds even when it has fewer hops; " +
      "parallel tasks keep the max duration; w ≡ 1 reproduces the layer") {
    import org.apache.spark.sql.functions.lit
    // 1→4 direct takes 10; 1→2→3→4 takes 3 — cost follows duration (10),
    // layer follows hops (3)
    val e = Seq((1L, 4L, 10.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0),
      (1L, 2L, 0.5)) // parallel task 1→2: the slower (1.0) binds
    val got = Dag.criticalPath(e.toDF("s", "d", "w"), "s", "d", "w")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((0L, 0.0)), 2L -> ((1L, 1.0)),
      3L -> ((2L, 2.0)), 4L -> ((3L, 10.0))))
    // w ≡ 1: cost degenerates to the unweighted layer
    val ones = Dag.criticalPath(
      e.toDF("s", "d", "w").withColumn("w", lit(1.0)), "s", "d", "w")
      .as[(Long, Long, Double)].collect()
    assert(ones.forall(r => r._3 == r._2.toDouble))
  }

  test("criticalPath: a ZERO-duration cycle still throws (the hop layer, " +
      "not the cost fold, certifies acyclicity)") {
    val ex = intercept[IllegalArgumentException] {
      Dag.criticalPath(
        Seq((1L, 2L, 0.0), (2L, 1L, 0.0)).toDF("s", "d", "w"), "s", "d", "w")
        .collect()
    }
    assert(ex.getMessage.contains("cycle"))
  }

  test("criticalPath: a same-hop-length higher-cost relax lands exactly " +
      "even beside a 1e16-cost row (the Σcost-absorption scale the old " +
      "FP signature could swallow — convergence is now an exact " +
      "changed-row count, the Bfs.sssp pattern)") {
    // two 2-hop paths into 4 with different costs: the higher (1→3→4,
    // cost 3) must win over the lower (1→2→4, cost 2). The isolated
    // 100→101 edge puts 1e16 into every Σcost a signature would take
    // (ulp(1e16) = 2, so the +1-class deltas of the small component
    // vanish from a double sum) — the row-wise compare is immune.
    val e = Seq(
      (1L, 2L, 1.0), (2L, 4L, 1.0),
      (1L, 3L, 2.0), (3L, 4L, 1.0),
      (100L, 101L, 1.0e16))
    val got = Dag.criticalPath(e.toDF("s", "d", "w"), "s", "d", "w")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((0L, 0.0)), 2L -> ((1L, 1.0)),
      3L -> ((1L, 2.0)), 4L -> ((2L, 3.0)),
      100L -> ((0L, 0.0)), 101L -> ((1L, 1.0e16))))
  }

  test("brute-force agreement on a random 60-node bucket-layered DAG") {
    val rnd = new scala.util.Random(7L)
    val edges = Seq.fill(300) {
      val a = rnd.nextInt(60); val b = rnd.nextInt(60)
      (math.min(a, b).toLong, math.max(a, b).toLong)
    }.filter(e => e._1 / 10 < e._2 / 10).distinct
    val adj = edges.groupBy(_._2).map { case (v, es) => v -> es.map(_._1) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val memo = scala.collection.mutable.Map.empty[Long, Long]
    def depth(v: Long): Long = memo.getOrElseUpdate(v,
      adj.get(v).map(_.map(depth).max + 1L).getOrElse(0L))
    val expect = nodes.map(v => v -> depth(v)).toMap
    assert(layers(edges) == expect)
  }
}
