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

  private def sssp(
      edges: Seq[(Long, Long, Double)], src: Long,
      directed: Boolean = false, maxRounds: Int = 128): Map[Long, Double] =
    Bfs.sssp(edges.toDF("x", "y", "w"), "x", "y", "w", src,
      directed = directed, maxRounds = maxRounds)
      .as[(Long, Double)].collect().toMap

  test("sssp: a cheap 2-hop path beats the direct heavy edge; distances " +
      "correct past the first improvement (label-correcting, not BFS)") {
    // 0-2 direct costs 10; 0-1-2 costs 3; 2-3 extends the cheap path
    val got = sssp(Seq((0L, 2L, 10.0), (0L, 1L, 1.0), (1L, 2L, 2.0), (2L, 3L, 1.0)), 0L)
    assert(got == Map(0L -> 0.0, 1L -> 1.0, 2L -> 3.0, 3L -> 4.0))
  }

  test("sssp: directed keeps orientation; undirected relaxes both ways; " +
      "parallel edges collapse to min; unreachable nodes absent") {
    val e = Seq((1L, 2L, 5.0), (1L, 2L, 3.0), (3L, 1L, 1.0), (8L, 9L, 1.0))
    val dirGot = sssp(e, 1L, directed = true)
    // directed: 3→1 is not traversable FROM 1; 8-9 unreachable
    assert(dirGot == Map(1L -> 0.0, 2L -> 3.0))
    val undGot = sssp(e, 1L)
    assert(undGot == Map(1L -> 0.0, 2L -> 3.0, 3L -> 1.0))
  }

  test("sssp: a negative cycle throws via the maxRounds guard") {
    val ex = intercept[IllegalStateException] {
      sssp(Seq((1L, 2L, -1.0), (2L, 1L, -1.0)), 1L,
        directed = true, maxRounds = 16)
    }
    assert(ex.getMessage.contains("maxRounds"))
  }

  test("sssp: one negative edge with directed=false fails FAST with a " +
      "precise message (its reverse forms a negative cycle) instead of " +
      "burning maxRounds; directed negative edges without a cycle " +
      "still relax exactly") {
    val ex = intercept[IllegalArgumentException] {
      sssp(Seq((1L, 2L, 1.0), (2L, 3L, -0.5)), 1L,
        directed = false, maxRounds = 128)
    }
    assert(ex.getMessage.contains("non-negative"), ex.getMessage)
    // directed Bellman-Ford legitimately handles a negative edge on a DAG
    val got = sssp(Seq((1L, 2L, 5.0), (2L, 3L, -3.0), (1L, 3L, 4.0)), 1L,
      directed = true)
    assert(got == Map(1L -> 0.0, 2L -> 5.0, 3L -> 2.0))
  }

  test("sssp: agrees with a driver-side Dijkstra on a random weighted graph") {
    val rnd = new scala.util.Random(21L)
    val edges = Seq.fill(160) {
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong, (1 + rnd.nextInt(9)).toDouble)
    }.filter(e => e._1 != e._2)
    val got = sssp(edges, 0L)
    // reference: plain Dijkstra over the same canonicalized graph
    val adj = scala.collection.mutable.Map.empty[Long, Map[Long, Double]]
    edges.foreach { case (a, b, w) =>
      Seq((a, b), (b, a)).foreach { case (u, v) =>
        val m = adj.getOrElse(u, Map.empty)
        adj(u) = m + (v -> math.min(w, m.getOrElse(v, Double.MaxValue)))
      }
    }
    val dist = scala.collection.mutable.Map(0L -> 0.0)
    val done = scala.collection.mutable.Set.empty[Long]
    while (dist.keySet.diff(done).nonEmpty) {
      val u = dist.keySet.diff(done).minBy(dist)
      done += u
      adj.getOrElse(u, Map.empty).foreach { case (v, w) =>
        val nd = dist(u) + w
        if (nd < dist.getOrElse(v, Double.MaxValue)) dist(v) = nd
      }
    }
    assert(got == dist.toMap)
  }
}
