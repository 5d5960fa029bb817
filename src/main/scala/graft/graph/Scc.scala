package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STRONGLY CONNECTED COMPONENTS of a DIRECTED graph — the directed
  * sibling of the min-label connected components the dedup tier runs
  * (`Dedup.connectedComponents`): u and v share a component iff each
  * REACHES the other, the condensation primitive behind cycle
  * detection, dependency collapsing, and link-graph cleanup (a crawl
  * graph's giant SCC vs its IN/OUT tendrils).
  *
  * Algorithm: trim + forward-coloring + backward confinement — the
  * FB/coloring family (Orzan 2004; Slota, Rajamanickam & Madduri 2014),
  * the data-parallel replacement for Tarjan's inherently sequential
  * DFS. Each outer round:
  *
  *  1. TRIM to fixpoint: a node with no in-edge or no out-edge among
  *     the unassigned subgraph can't sit on a cycle — it is its own
  *     singleton SCC. Peeling repeats (removing a layer exposes the
  *     next), which alone dissolves any DAG region.
  *  2. COLOR: the forward min-label fixpoint F(v) = min({v} ∪
  *     {F(u) : u→v}) — F(v) is the least unassigned node that reaches
  *     v. Labels only decrease, so the (count, Σ F) signature detects
  *     the fixpoint (the HyperBall mass idiom).
  *  3. CONFINE: within each color class, the nodes that reach their
  *     root r = F(r) = r through SAME-COLOR vertices are EXACTLY
  *     SCC(r) (if v→*r and F(v) = r then r→*v, mutual; conversely a
  *     v ∈ SCC(r) has F(v) = r — a smaller ancestor of v would be a
  *     smaller ancestor of r — and its path back to r stays inside
  *     SCC(r), which is monochrome). Those nodes assign scc = r and
  *     leave the graph.
  *
  * Every color class retires at least its root's SCC per round, so
  * progress is guaranteed; rounds ≈ the longest chain of SCCs sharing
  * a color. Self-loops drop (they never change membership); nodes
  * appearing only in self-loops are singletons via trim.
  *
  * Output `(node, scc)`, scc = the component's minimum node id — the
  * same labeling contract as connectedComponents, so downstream
  * cluster logic is interchangeable.
  *
  * Scale shape: state is Θ(n) rows keyed by node; each inner round is
  * one edge-keyed equi-join + one node-keyed aggregate (or a distinct
  * union for the confine set), localCheckpointed so plans never stack
  * (the qg9 lineage lesson). No driver-side graph, no adjacency
  * collect; the only driver values are 1-row signatures. Worst case is
  * a long chain of SCCs (rounds ~ chain length — inherent to the
  * label-propagation family); hash-random and crawl-shaped graphs
  * finish in a handful of rounds (GraphScale pins 10⁶ edges). Throws
  * rather than returning partial labels if `maxRounds` inner rounds
  * don't reach the fixpoint — the connectedComponents contract.
  */
object Scc {

  def run(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 256): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = edges.sparkSession
    import spark.implicits._

    var rounds = 0
    def spend(n: Int = 1): Unit = {
      rounds += n
      if (rounds > maxRounds)
        throw new IllegalStateException(
          s"SCC did not converge within $maxRounds rounds — " +
            "a pathological SCC chain; raise maxRounds")
    }

    // null endpoints (the leakageSafeSplit contract): an edge with a
    // null side is NO EDGE — but its non-null side is still a node
    // (isolated ⇒ singleton via trim). A null never surfaces as a
    // (null, null) output row.
    val typed = edges
      .select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
    var remaining = typed
      .filter(col("s").isNotNull && col("d").isNotNull
        && col("s") =!= col("d"))
      .distinct()
      .localCheckpoint(true)
    // self-loop-only / isolated-in-edge-list nodes still get a row
    var nodes = typed
      .select(col("s").as("node"))
      .unionAll(typed.select(col("d").as("node")))
      .filter(col("node").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val assigned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    var nLeft = nodes.count()
    while (nLeft > 0) {
      // ---- 1. trim to fixpoint: no in-edge or no out-edge => singleton
      var trimming = true
      while (trimming && nLeft > 0) {
        spend()
        val trimmed = nodes
          .join(remaining.select(col("d").as("node")).distinct(),
            Seq("node"), "left_anti")
          .unionAll(nodes.join(
            remaining.select(col("s").as("node")).distinct(),
            Seq("node"), "left_anti"))
          .distinct()
          .localCheckpoint(true)
        val nTrim = trimmed.count()
        if (nTrim == 0) trimming = false
        else {
          assigned += trimmed.select(col("node"), col("node").as("scc"))
          nodes = nodes.join(trimmed, Seq("node"), "left_anti")
            .localCheckpoint(true)
          remaining = remaining
            .join(trimmed.select(col("node").as("s")), Seq("s"), "left_anti")
            .join(trimmed.select(col("node").as("d")), Seq("d"), "left_anti")
            .select(col("s"), col("d"))
            .localCheckpoint(true)
          nLeft -= nTrim
        }
      }
      if (nLeft > 0) {
        // ---- 2. forward min-label coloring to fixpoint
        var f = nodes.select(col("node"), col("node").as("lb"))
          .localCheckpoint(true)
        def sig(df: DataFrame): (Long, Long) = {
          val r = df.agg(count(lit(1)), coalesce(sum(col("lb")), lit(0L))).head()
          (r.getLong(0), r.getLong(1))
        }
        var prev = sig(f)
        var changing = true
        while (changing) {
          spend()
          f = f.unionAll(
              remaining.join(f.withColumnRenamed("node", "s"), Seq("s"))
                .select(col("d").as("node"), col("lb")))
            .groupBy(col("node"))
            .agg(min(col("lb")).as("lb"))
            .localCheckpoint(true)
          val cur = sig(f)
          changing = cur != prev
          prev = cur
        }
        // ---- 3. backward confinement within each color class
        val sameColor = remaining
          .join(f.select(col("node").as("s"), col("lb").as("__fs")), Seq("s"))
          .join(f.select(col("node").as("d"), col("lb").as("__fd")), Seq("d"))
          .filter(col("__fs") === col("__fd"))
          .select(col("s"), col("d"))
          .localCheckpoint(true)
        var reach = f.filter(col("node") === col("lb"))
          .select(col("node"))
          .localCheckpoint(true)
        var nReach = reach.count()
        var growing = true
        while (growing) {
          spend()
          val grown = reach.unionAll(
              sameColor.join(reach.withColumnRenamed("node", "d"), Seq("d"))
                .select(col("s").as("node")))
            .distinct()
            .localCheckpoint(true)
          val n2 = grown.count()
          growing = n2 != nReach
          reach = grown
          nReach = n2
        }
        val members = reach.join(f, Seq("node"))
          .select(col("node"), col("lb").as("scc"))
          .localCheckpoint(true)
        assigned += members
        nodes = nodes.join(members.select(col("node")), Seq("node"), "left_anti")
          .localCheckpoint(true)
        remaining = remaining
          .join(members.select(col("node").as("s")), Seq("s"), "left_anti")
          .join(members.select(col("node").as("d")), Seq("d"), "left_anti")
          .select(col("s"), col("d"))
          .localCheckpoint(true)
        nLeft -= nReach
      }
    }
    if (assigned.isEmpty) spark.emptyDataset[(Long, Long)].toDF("node", "scc")
    else assigned.reduce(_ unionAll _)
  }
}
