package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BETWEENNESS CENTRALITY by pivot sampling (Brandes 2001 for the
  * per-source dependency accumulation; Brandes & Pich 2007 for the
  * pivot estimator) — the shortest-path brokerage score: how many
  * shortest paths between OTHER vertex pairs pass through v. Exact
  * betweenness needs a single-source shortest-path pass from EVERY
  * vertex — O(n·m), hopeless at corpus scale — but the per-source
  * dependencies δ_s(v) are an additive decomposition, so a uniform
  * pivot subset S gives the unbiased estimator
  * `BC(v) ≈ (n/|S|)·½·Σ_{s∈S} δ_s(v)`: sampling trades a provable
  * variance bound for a |S|/n cost cut, and |S| = n IS exact Brandes.
  *
  * Spark shape: all pivots advance TOGETHER — BFS state is one
  * DataFrame keyed by (pivot, node) carrying (dist, σ), so a round is
  * one frontier×edges join + one (pivot, node) aggregate regardless of
  * pivot count, and the σ counts sum map-side. The backward pass walks
  * BFS layers deepest-first, each layer one join against the layer
  * below (δ(v) = Σ_{w∈succ(v)} σ_v/σ_w·(1+δ_w)). Rounds are bounded by
  * the DIAMETER both ways, and every round's state `localCheckpoint`s —
  * K rounds never stack K join plans (the qg9 lineage lesson). Total
  * state is |S|·n rows max; at 100 TB-scale graphs |S| is the knob that
  * keeps it executor-resident, and the estimator's error shrinks as
  * O(1/√|S|) (Brandes-Pich), independent of n.
  *
  * Oracle gate: qg21_betweenness replays the EXACT all-pivots form in
  * SQL without the backward pass — a layered σ (path-count) DP plus the
  * pair-sum identity B(v) = ½·Σ_{s≠v≠t} σ_st(v)/σ_st with
  * σ_st(v) = σ_sv·σ_vt when d(s,t) = d(s,v)+d(v,t) — validated against
  * an independent Brandes in BetweennessSpec. The sampled form stays
  * spec-pinned: the estimator's UNBIASEDNESS is exact (averaging the
  * singleton-pivot estimates over all n vertices reproduces exact
  * betweenness).
  *
  * Reference: no analog (the reference's graph tier is routing only);
  * beyond-reference graph-analytics mandate, closing the BACKLOG's
  * betweenness item.
  */
object Betweenness {

  /** Betweenness per vertex: `(node, betweenness)` — undirected,
    * unweighted, unnormalized, endpoints excluded, each unordered pair
    * counted once (the directed-dependency sum halved). `pivots <= 0`
    * or ≥ n runs every vertex as a source (EXACT Brandes); otherwise
    * the pivot set is the `pivots` smallest vertices by
    * `xxhash64(node, seed)` — a deterministic uniform subset, so runs
    * replay bit-identically. Input may contain duplicates, both
    * orientations, and self-loops — canonicalized first. Isolated
    * vertices don't appear (no edges → no paths → betweenness 0).
    */
  def run(
      edges: DataFrame, aCol: String, bCol: String,
      pivots: Int = 0, seed: Long = 42L): DataFrame =
    core(edges, aCol, bCol, nodes =>
      if (pivots <= 0) nodes.select(col("v").as("p"))
      else nodes
        .orderBy(xxhash64(col("v"), lit(seed)), col("v"))
        .limit(pivots)
        .select(col("v").as("p")))

  /** [[run]] with an EXPLICIT pivot set (deduplicated; ids that aren't
    * vertices are ignored) — for stratified pivot choices, and for
    * pinning the estimator's defining property in specs: averaging the
    * singleton-pivot estimates over ALL vertices reproduces exact
    * betweenness, which is what "unbiased" means with the n/k scale.
    */
  def runPivots(
      edges: DataFrame, aCol: String, bCol: String,
      pivotIds: Seq[Long]): DataFrame = {
    require(pivotIds.nonEmpty, "pivotIds must be non-empty")
    core(edges, aCol, bCol,
      nodes => nodes.filter(col("v").isin(pivotIds.distinct: _*))
        .select(col("v").as("p")))
  }

  private def core(
      edges: DataFrame, aCol: String, bCol: String,
      choosePivots: DataFrame => DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val e = edges
      .select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // eager + size-partitioned (the KCore.decompose shape): the BFS and
    // dependency loops probe ed every round
    val ed0 = e.select(col("a").as("v"), col("b").as("w"))
      .unionAll(e.select(col("b").as("v"), col("a").as("w")))
      .localCheckpoint(true)
    val edParts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      ed0.count() / 100000L + 1L)).toInt
    val ed = ed0.coalesce(edParts)
    val nodes = ed.select(col("v")).distinct()
    val n = nodes.count()
    if (n == 0L) {
      return spark.range(0).select(col("id").as("node"),
        lit(0.0).as("betweenness"))
    }
    val pivotSet = choosePivots(nodes)
    val k = pivotSet.count()
    require(k > 0L, "pivot set selected no graph vertices")

    // forward multi-source BFS: (p, v, dist, sigma = #shortest s→v paths)
    var bfs = pivotSet
      .select(col("p"), col("p").as("v"), lit(0).as("dist"), lit(1L).as("sigma"))
      .localCheckpoint(true)
    var d = 0
    var grewBy = 1L
    var bfsCount = bfs.count()
    while (grewBy > 0L) {
      val frontier = bfs.filter(col("dist") === d)
      val next = frontier
        .join(ed, Seq("v"))
        .select(col("p"), col("w").as("v"), col("sigma"))
        // paths through DIFFERENT predecessors to the same w add up
        .groupBy("p", "v").agg(sum(col("sigma")).as("sigma"))
        .join(bfs.select("p", "v"), Seq("p", "v"), "left_anti")
        .select(col("p"), col("v"), lit(d + 1).as("dist"), col("sigma"))
      val grown = bfs.unionAll(next).localCheckpoint(true)
      // carry the previous round's count instead of re-counting the old
      // checkpoint — one action per round, not two
      val grownCount = grown.count()
      grewBy = grownCount - bfsCount
      bfsCount = grownCount
      bfs = grown
      d += 1
    }
    val maxD = bfs.agg(max(col("dist"))).head().getInt(0)

    // backward dependency accumulation, deepest layer first:
    // δ(v) = Σ over successors w (dist(w) = dist(v)+1, edge v–w) of
    // σ_v/σ_w · (1 + δ_w); the deepest layer has no successors (δ = 0)
    var below = bfs.filter(col("dist") === maxD)
      .select(col("p"), col("v"), col("sigma"), lit(0.0).as("delta"))
      .localCheckpoint(true)
    var acc = below
    var layerD = maxD - 1
    while (layerD >= 0) {
      val layer = bfs.filter(col("dist") === layerD)
      val contrib = layer
        .join(ed, Seq("v"))
        .join(
          below.select(col("p"), col("v").as("w"),
            col("sigma").as("__sw"), col("delta").as("__dw")),
          Seq("p", "w"))
        .groupBy("p", "v")
        .agg(sum(col("sigma").cast("double") / col("__sw") * (lit(1.0) + col("__dw")))
          .as("__contrib"))
      val layerDelta = layer
        .join(contrib, Seq("p", "v"), "left_outer")
        .select(col("p"), col("v"), col("sigma"),
          coalesce(col("__contrib"), lit(0.0)).as("delta"))
        .localCheckpoint(true)
      acc = acc.unionAll(layerDelta)
      below = layerDelta
      layerD -= 1
    }
    // endpoints excluded (v = p is the dist-0 row); halve the directed
    // sum (each unordered pair counted from both ends in an undirected
    // graph), scale the pivot estimate by n/k
    val scale = n.toDouble / k.toDouble / 2.0
    val out = acc
      .filter(col("v") =!= col("p"))
      .groupBy(col("v"))
      .agg((coalesce(sum(col("delta")), lit(0.0)) * lit(scale)).as("betweenness"))
      .select(col("v").as("node"), col("betweenness"))
      .localCheckpoint(true)
    out
  }

  /** WEIGHTED betweenness (Brandes 2001 over COST shortest paths, the
    * pivot estimator as [[run]]): brokerage under the cost metric the
    * engine's road graph actually carries — on a weighted graph the
    * hop-count form routes "shortest paths" that no traveler takes
    * (the qg32 rationale, applied to the brokerage question).
    *
    * Three keyed-join fixpoints, each localCheckpointed per round with
    * exact convergence detection (fused into the round's single
    * aggregate/plan — one checkpoint + one cached count per round; σ
    * uses the exact monotone (count, Σσ) integer signature):
    *
    *  1. DISTANCES from the pivot set — the [[Bfs.sssp]] min-plus
    *     frontier fold keyed by (pivot, node).
    *  2. PATH COUNTS σ over the shortest-path DAG: DAG edge u→v iff
    *     `d(u) + w(u,v) = d(v)` (bit-exact for INTEGER-VALUED weights —
    *     all sums stay exact doubles; fractional weights can split a
    *     true tie across ulps, so σ is contract-exact for integer
    *     costs, documented). σ iterates `σ(v) = Σ_{u→v} σ(u)` from
    *     σ(pivot) = 1 — round t holds paths of ≤ t hops, monotone
    *     exact Longs, stable at DAG depth.
    *  3. DEPENDENCIES δ backward: per-DAG-edge ratio r = σ_v/σ_w is
    *     computed ONCE, then `δ(v) = Σ_{v→w} r·(1 + δ(w))` iterates
    *     from 0 — each value recomputes bit-identically once its
    *     successors settle, so FP changed-row compare is exact.
    *
    * Weights must be strictly positive (a zero-weight cycle has
    * infinitely many equal-cost paths — σ diverges). Output and
    * estimator contract as [[run]]: undirected, unnormalized,
    * endpoints excluded, unordered pairs once, n/k pivot scale.
    */
  def runWeighted(
      edges: DataFrame, aCol: String, bCol: String, wCol: String,
      pivots: Int = 0, seed: Long = 42L, maxRounds: Int = 128): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = edges.sparkSession
    val e0 = edges
      .select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"),
        col(wCol).cast("double").as("__w"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("__w").isNotNull)
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(min(col("__w")).as("__w"))
    // eager + size-partitioned (the KCore.decompose shape): phases 1-3
    // probe ed across their rounds
    val ed0 = e0.select(col("a").as("v"), col("b").as("t"), col("__w"))
      .unionAll(e0.select(col("b").as("v"), col("a").as("t"), col("__w")))
      .localCheckpoint(true)
    val edParts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      ed0.count() / 100000L + 1L)).toInt
    val ed = ed0.coalesce(edParts)
    val minW = ed.agg(min(col("__w"))).head()
    if (!minW.isNullAt(0) && minW.getDouble(0) <= 0.0) {
      throw new IllegalArgumentException(
        "runWeighted requires strictly positive weights: min weight " +
          s"${minW.getDouble(0)} ≤ 0 (a zero-weight tie gives infinitely " +
          "many equal-cost paths — σ diverges; negative forms a cycle)")
    }
    val nodes = ed.select(col("v")).distinct()
    val n = nodes.count()
    if (n == 0L) {
      return spark.range(0).select(col("id").as("node"),
        lit(0.0).as("betweenness"))
    }
    val pivotSet =
      (if (pivots <= 0) nodes
       else nodes.orderBy(xxhash64(col("v"), lit(seed)), col("v")).limit(pivots))
        .select(col("v").as("p"))
    val k = pivotSet.count()

    // 1. cost distances from every pivot (min-plus frontier fold) —
    // FUSED round (the Bfs.sssp shape): one tagged min aggregate merges
    // candidates with the old table AND recovers the old distance, so
    // "improved" is a column; one exchange + one checkpoint + one cached
    // count per round, bit-identical values (IEEE min is order-free)
    var dist = pivotSet
      .select(col("p"), col("p").as("v"), lit(0.0).as("dist"))
      .localCheckpoint(true)
    var frontier = dist
    var rounds = 0
    var improving = true
    while (improving) {
      rounds += 2 // two relax applications per materialized round
      if (rounds > maxRounds)
        throw new IllegalStateException(
          s"runWeighted distances still improving after maxRounds=$maxRounds")
      // DOUBLE-STEPPED (r16, the Bfs.sssp rationale): two lazy
      // relax+merge steps per checkpoint+count; __imp flags the SECOND
      // step, whose empty improvement set is the single-step stop
      // condition verbatim — values bit-identical (order-free IEEE min)
      def relaxMerge(d: DataFrame, f: DataFrame): DataFrame = {
        val cand = f
          .join(ed, Seq("v"))
          .select(col("p"), col("t").as("v"), (col("dist") + col("__w")).as("dist"))
        d
          .select(col("p"), col("v"), col("dist"), lit(false).as("__cand"))
          .unionAll(cand.select(col("p"), col("v"), col("dist"), lit(true).as("__cand")))
          .groupBy(col("p"), col("v"))
          .agg(
            min(col("dist")).as("dist"),
            min(when(!col("__cand"), col("dist"))).as("__old"))
          .select(col("p"), col("v"), col("dist"),
            (col("__old").isNull || col("dist") < col("__old")).as("__imp"))
      }
      val m1 = relaxMerge(dist, frontier)
      val merged = relaxMerge(
          m1.select(col("p"), col("v"), col("dist")),
          m1.filter(col("__imp")).select(col("p"), col("v"), col("dist")))
        .localCheckpoint(true)
      improving = merged.filter(col("__imp")).count() > 0L
      frontier = merged.filter(col("__imp")).select(col("p"), col("v"), col("dist"))
      dist = merged.select(col("p"), col("v"), col("dist"))
    }

    // shortest-path DAG edges per pivot: u→v iff d(u) + w = d(v)
    val dagE = dist.select(col("p"), col("v").as("__u"), col("dist").as("__du"))
      .join(ed.select(col("v").as("__u"), col("t").as("__v"), col("__w")), Seq("__u"))
      .join(dist.select(col("p"), col("v").as("__v"), col("dist").as("__dv")),
        Seq("p", "__v"))
      .filter(col("__du") + col("__w") === col("__dv"))
      .select(col("p"), col("__u"), col("__v"))
      .localCheckpoint(true)

    // 2. σ fixpoint over the DAG (exact Longs, monotone in hop rounds).
    // Convergence by the (count, Σσ) signature instead of a per-round
    // join against the previous table: σ_t(v) is NONDECREASING in t
    // (round t counts shortest paths of ≤ t hops) and the reached set
    // only grows, so equal count AND equal exact-integer sum imply no
    // row changed — the signature is exact, not heuristic (the
    // Dag.longestPathLayer argument; DECIMAL(38,0) so huge path counts
    // can't overflow the sum). One cheap cached aggregate replaces the
    // n²-row join per round.
    val seedSig = pivotSet.select(col("p"), col("p").as("v"), lit(1L).as("sigma"))
    var sig = seedSig.localCheckpoint(true)
    // The signature's exactness proof needs the Σσ sum to be REAL: a
    // null sum with count > 0 means the DECIMAL(38,0) aggregate
    // overflowed (non-ANSI sum returns null), and coalescing it to zero
    // would conflate "overflowed" with "empty" — two consecutive
    // equal-count overflowed rounds would falsely signal convergence.
    // Fail loudly instead; σ itself stays a Long per node, whose own
    // bound (paths per node < 2⁶³) is the tier's documented contract.
    def sigSignature(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(
        count(lit(1)),
        sum(col("sigma").cast("decimal(38,0)"))).head()
      val n = r.getLong(0)
      val s = r.getDecimal(1)
      if (n > 0 && s == null)
        throw new ArithmeticException(
          "runWeighted σ signature: sum(sigma) overflowed decimal(38,0) " +
            s"over $n rows — path counts too large for the exact signature")
      (n, if (s == null) java.math.BigDecimal.ZERO else s)
    }
    var sigPrev = sigSignature(sig)
    rounds = 0
    var changing = true
    while (changing) {
      rounds += 1
      if (rounds > maxRounds)
        throw new IllegalStateException(
          s"runWeighted σ still changing after maxRounds=$maxRounds")
      val next = seedSig.unionAll(
          dagE.join(sig.select(col("p"), col("v").as("__u"), col("sigma")),
            Seq("p", "__u"))
            .groupBy(col("p"), col("__v"))
            .agg(sum(col("sigma")).as("sigma"))
            .select(col("p"), col("__v").as("v"), col("sigma")))
        .groupBy(col("p"), col("v"))
        .agg(max(col("sigma")).as("sigma"))
        .localCheckpoint(true)
      val cur = sigSignature(next)
      sig = next
      changing = cur != sigPrev
      sigPrev = cur
    }
    // σ(v) at round t counts shortest paths of ≤ t hops: the union's
    // max-merge keeps the newest (largest) count per node; every
    // pivot-seeded DAG is acyclic under positive weights, so the fold
    // is exact and stable at DAG depth

    // 3. per-edge ratio once, then δ backward fixpoint
    val dagR = dagE
      .join(sig.select(col("p"), col("v").as("__u"), col("sigma").as("__su")), Seq("p", "__u"))
      .join(sig.select(col("p"), col("v").as("__v"), col("sigma").as("__sv")), Seq("p", "__v"))
      .select(col("p"), col("__u"), col("__v"),
        (col("__su").cast("double") / col("__sv").cast("double")).as("__r"))
      // EAGER: the old lazy persist was unpersisting dagE before dagR
      // ever computed, so δ round 1 re-ran dagE's two joins from
      // scratch; checkpointed, dagR materializes from dagE's blocks
      // here and both frames free on GC
      .localCheckpoint(true)
    // δ backward fixpoint — FUSED change detection: the previous δ table
    // itself is the left side (its key set IS dist's, invariant across
    // rounds), so the old value rides the same plan as the new one and
    // "changed" is a column; one checkpoint + one cached count per
    // round, was checkpoint + join + count. Arithmetic unchanged —
    // each δ recomputes bit-identically once its successors settle.
    var delta = dist.select(col("p"), col("v"), lit(0.0).as("delta"))
      .localCheckpoint(true)
    rounds = 0
    changing = true
    while (changing) {
      rounds += 1
      if (rounds > maxRounds)
        throw new IllegalStateException(
          s"runWeighted δ still changing after maxRounds=$maxRounds")
      val next = delta.select(col("p"), col("v"), col("delta").as("__od"))
        .join(
          dagR.join(delta.select(col("p"), col("v").as("__v"),
              col("delta").as("__dw")), Seq("p", "__v"))
            .groupBy(col("p"), col("__u"))
            .agg(sum(col("__r") * (lit(1.0) + col("__dw"))).as("__acc"))
            .select(col("p"), col("__u").as("v"), col("__acc")),
          Seq("p", "v"), "left")
        .select(col("p"), col("v"),
          coalesce(col("__acc"), lit(0.0)).as("delta"),
          (coalesce(col("__acc"), lit(0.0)) =!= col("__od")).as("__chg"))
        .localCheckpoint(true)
      val changed = next.filter(col("__chg")).count()
      delta = next.select(col("p"), col("v"), col("delta"))
      changing = changed > 0L
    }

    val scale = n.toDouble / k.toDouble / 2.0
    val out = delta
      .filter(col("v") =!= col("p"))
      .groupBy(col("v"))
      .agg((coalesce(sum(col("delta")), lit(0.0)) * lit(scale)).as("betweenness"))
      .select(col("v").as("node"), col("betweenness"))
      .localCheckpoint(true)
    out
  }
}
