package graft

import org.apache.spark.sql.functions._

/** Scale measurement for the graph-analytics tier (the RoutingScale
  * pattern applied to Triangles/KCore/LabelProp/PageRank): deterministic
  * hash-random graphs at |E| = 10⁵ / 10⁶ / 10⁷ (avg degree ~20), wall
  * times on local[32]. Run: `sbt "runMain graft.GraphScale [maxEdges]"`.
  * Numbers land in ENGINE.md §2.8 — the point is the SHAPE (near-linear
  * in |E| for the keyed-join algorithms; triangle wedges grow with
  * Σ out-deg² but the degree orientation caps out-degree at O(√m)).
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val maxEdges = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = GraftSession.local(32, "graph-scale")
    import spark.implicits._
    Seq(100000L, 1000000L, 10000000L).filter(_ <= maxEdges).foreach { m =>
      val n = m / 10 // avg degree ~20 after doubling
      val edges = spark.range(m).select(
        pmod(xxhash64(col("id")), lit(n)).as("x"),
        pmod(xxhash64(col("id") + 1234567L), lit(n)).as("y"))
        .localCheckpoint(true)
      def time(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[graphscale] |E|=$m%8d $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (result=$r)")
      }
      time("triangles") {
        graft.graph.Triangles.count(edges, "x", "y").collect()(0).getLong(2)
      }
      time("kcore") {
        graft.graph.KCore.decompose(edges, "x", "y", 15).count()
      }
      time("labelprop3") {
        graft.graph.LabelProp.run(edges, "x", "y", 3).count()
      }
      // k-truss support via degree-ordered triangle ENUMERATION (the
      // round-14 rework) — the skew probe below pins the win vs the old
      // full-neighbourhood intersection form
      time("ktruss4") {
        graft.graph.Truss.decompose(edges, "x", "y", 4).count()
      }
      // HITS at the fixed 4-iteration budget: per iteration one lazy
      // two-join plan + one localCheckpoint (constant-ΣW scaling), so
      // wall should track |E| like the other keyed-join fixpoints
      time("hits4") {
        graft.graph.Hits.run(
          edges.withColumn("w", lit(1.0)), "x", "y", "w", 4).count()
      }
      // betweenness cost is pivots × diameter rounds; 16 pivots is the
      // estimator at a fixed budget, so wall should track |E|, not n·m
      time("betweenness16") {
        graft.graph.Betweenness.run(edges, "x", "y", pivots = 16).count()
      }
      // HyperBall: diameter rounds of (edges × register-rows) joins,
      // state Θ(n·2^p) — the probe pins that harmonic centrality costs
      // ~diameter × |E|-join, never the n² pair table the exact tier
      // walks (hash-random diameter ~log n, so rounds stay single-digit)
      time("hyperball_p6") {
        graft.graph.Centrality.harmonicHyperBall(edges, "x", "y", p = 6).count()
      }
      // SCC treats the hash-random edges as DIRECTED (x → y): at avg
      // degree ~20 a giant SCC plus IN/OUT tendrils — trim peels the
      // tendrils, coloring retires the giant in a few label rounds, so
      // wall should track rounds × |E|-join like the other fixpoints
      time("scc") {
        graft.graph.Scc.run(edges, "x", "y").count()
      }
      // DAG layering: bucket-increasing orientation (20 buckets) bounds
      // the critical depth at 19 regardless of |E|, so rounds stay
      // constant while each round's edge join scales linearly — the
      // layered shape real dependency/citation corpora have
      time("dag_layer") {
        val b = lit(math.max(n / 20L, 1L))
        val dag = edges.filter(floor(col("x") / b) < floor(col("y") / b))
        graft.graph.Dag.longestPathLayer(dag, "x", "y").count()
      }
      // weighted SSSP (qg30): one source over the full graph — rounds =
      // hop length of the hop-longest optimal path (~log n hash-random),
      // each round a frontier-sized join; wall should track |E| × rounds
      time("wsssp") {
        graft.graph.Bfs.sssp(
          edges.withColumn("w", (pmod(col("x") + col("y"), lit(7)) + 1).cast("double")),
          "x", "y", "w", source = 0L).count()
      }
      // link prediction (qg35): wedge volume is Θ(Σ deg(w)²) BY
      // CONTRACT (every shared neighbor witnesses its pair) — the
      // maxDegree cap bounds the hub term, so wall tracks the capped
      // wedge count; 10⁷ skipped (4×10⁸ wedges is the documented
      // all-pairs regime, not a probe)
      if (m <= 1000000L) {
        time("linkpred_d64") {
          graft.graph.Structure
            .linkPrediction(edges, "x", "y", minCommon = 2, maxDegree = 64L)
            .count()
        }
      }
      // assortativity + modularity: one canonicalize + degree aggregate
      // each, integer moments — wall should track |E| like any keyed agg
      time("assortativity") {
        graft.graph.Structure.assortativity(edges, "x", "y").count()
      }
      time("modularity32") {
        val labels = spark.range(n)
          .select(col("id").as("v"), (col("id") % 32).as("c"))
        graft.graph.Structure.modularity(edges, "x", "y", labels, "v", "c")
          .count()
      }
      // weighted betweenness (qg34): pivot-bounded like betweenness16 —
      // cost is pivots × 3 keyed-join fixpoints (distances, σ, δ), each
      // |E|-join rounds deep; 8 pivots fixes the budget so wall should
      // track |E| × rounds, never n·m (integer 1..7 weights keep the
      // tie-detection contract exact)
      time("wbetween8") {
        graft.graph.Betweenness.runWeighted(
          edges.withColumn("w", (pmod(col("x") + col("y"), lit(7)) + 1).cast("double")),
          "x", "y", "w", pivots = 8).count()
      }
      // weighted all-pairs distance kernel (qg32/qg33): exact all-pairs
      // is Θ(Σ component²) BY CONSTRUCTION, so the probe bounds the
      // component size — edges confined to 100-node buckets give
      // n/100 components and ~n·100 reachable pairs; wall should track
      // pairs × rounds, NOT n². The unconfined form is the HyperBall
      // estimator's job (the qg22/qg23 split).
      time("wallpairs_b100") {
        val b = lit(100L)
        val bucketed = edges
          .filter(floor(col("x") / b) === floor(col("y") / b))
          .withColumn("w", (pmod(col("x") + col("y"), lit(7)) + 1).cast("double"))
        graft.graph.Centrality
          .weightedAllPairsDistances(bucketed, "x", "y", "w").count()
      }
    }
    // k-truss SKEW probe — the measured form of the operator-doc caveat
    // ("support needs the FULL neighbourhood; no degree orientation caps
    // a celebrity node's array"): a hash-random graph (10⁶ edges) plus a
    // degree-10⁵ hub. The hub's adjacency array rides into every
    // incident edge's array_intersect, so the hub's edges concentrate in
    // few tasks — this run puts a number on how much that costs vs the
    // skew-free graph above.
    if (maxEdges >= 1000000L) {
      val m = 1000000L
      val n = m / 10
      val base = spark.range(m).select(
        pmod(xxhash64(col("id")), lit(n)).as("x"),
        pmod(xxhash64(col("id") + 1234567L), lit(n)).as("y"))
      val hub = spark.range(100000L).select(
        lit(n).as("x"), // the celebrity node, adjacent to every id below
        pmod(xxhash64(col("id") + 7L), lit(n)).as("y"))
      val skewed = base.unionAll(hub).localCheckpoint(true)
      val t0 = System.nanoTime()
      val r = graft.graph.Truss.decompose(skewed, "x", "y", 4).count()
      println(f"[graphscale] |E|=${m + 100000L}%8d ktruss4-skew ${(System.nanoTime() - t0) / 1e9}%7.2f s  (result=$r)")
    }
    spark.stop()
  }
}
