package graft.graph

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, greatest, least, lit}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** SINGLE-SOURCE BFS HOP DISTANCE — unweighted shortest-path layers
  * from one source over an undirected graph: the reachability/radius
  * primitive under "how many hops from the seed set?" curation
  * screens and the unweighted twin of the Dijkstra tier
  * (`graph/Routing`), kept separate because hop semantics need no
  * cost model and the layer loop is pure equi-joins.
  *
  * Scale shape: classic frontier expansion — round d joins the
  * CURRENT frontier (nodes first reached at distance d, node-sized at
  * worst) against the adjacency list on the node key, anti-joins the
  * visited set, and the new layer becomes round d+1's frontier. Every
  * join is id-keyed (the edge payload never travels wider than
  * (v, w)); the visited table `localCheckpoint`s per round so D
  * rounds never stack D join plans (the qg9/KCore lineage lesson).
  * Rounds are bounded by the graph's eccentricity from the source,
  * not the vertex count. One `count()` action per round detects the
  * empty frontier.
  *
  * Unreachable nodes emit nothing; the source emits (source, 0) even
  * when isolated (BFS of a seed is defined on the seed).
  */
object Bfs {

  /** Hop distances from `source`: (node, dist), dist 0 at the source.
    * Input edges may contain duplicates, both orientations, and
    * self-loops — canonicalized first. Throws if the frontier is still
    * non-empty after `maxDepth` rounds (a diameter guard, not a
    * truncation — silent cutoffs would mislabel distances).
    */
  def hops(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      source: Long,
      maxDepth: Int = 64): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val spark = edges.sparkSession
    // eager + size-partitioned adjacency (the KCore.decompose shape):
    // the layer loop probes ed every round — checkpoint the canonical
    // edges once, then the doubled adjacency at a data-derived
    // partition count so each round's probe stays data-shaped instead
    // of 2x(shuffle.partitions) KB-block tasks
    val e = edges
      .select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      2L * e.count() / 100000L + 1L)).toInt
    val ed = e.select(col("a").as("v"), col("b").as("w"))
      .unionAll(e.select(col("b").as("v"), col("a").as("w")))
      .coalesce(parts)
      .localCheckpoint(true)

    val schema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("dist", IntegerType, nullable = false)))
    var visited = spark
      .createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(source, 0)), 1), schema)
      .localCheckpoint(true)
    var frontier = visited
    var d = 0
    var grew = true
    while (grew) {
      val next = ed
        .join(frontier.select(col("node").as("v")), Seq("v"))
        .select(col("w").as("node"))
        .distinct()
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(d + 1).as("dist"))
        .coalesce(parts)
        .localCheckpoint(true)
      val n = next.count()
      grew = n > 0L
      if (grew) {
        d += 1
        if (d > maxDepth)
          throw new IllegalStateException(
            s"BFS frontier still growing after maxDepth=$maxDepth rounds; " +
              "raise maxDepth")
        // plain union of already-checkpointed layer leaves: the plan
        // grows one leaf per round (bounded by maxDepth), while
        // re-checkpointing `visited` here would re-materialize every
        // earlier layer each round — O(D·V) writes for a D-round BFS
        visited = visited.unionAll(next)
        frontier = next
      }
    }
    visited
  }

  /** WEIGHTED SINGLE-SOURCE SHORTEST PATHS as a DataFrame min-plus
    * fixpoint — the DISTRIBUTED form of what `graph/Routing`'s
    * broadcast-CSR Dijkstra does on one executor: when the graph
    * itself is cluster-sized (web graphs, citation networks — far past
    * any single executor's CSR), distances have to live as a keyed
    * table and relaxation as joins. Delta-stepping-style frontier
    * Bellman-Ford: each round relaxes only the edges OUT OF nodes
    * whose distance improved last round (the classic label-correcting
    * optimization — settled regions stop generating work), merges
    * candidates into the distance table with one min aggregate, and
    * stops when a round improves nothing.
    *
    * Exactness: costs accumulate left-to-right along the winning path
    * (the relax order) and the merge is `min` — the same operation
    * tree a recursive-CTE Bellman-Ford replays, so distances are
    * bit-identical cross-engine (the qg1 oracle contract); with
    * integer-valued weights they are exact integers.
    *
    * Semantics: undirected by default (`directed = true` keeps edge
    * orientation); parallel edges collapse to their min weight;
    * self-loops drop (they never improve a distance under
    * non-negative weights); null endpoints/weights drop. Unreachable
    * nodes emit nothing; the source emits (source, 0.0). Rounds are
    * bounded by the hop count of the hop-longest optimal path —
    * throws past `maxRounds` (a negative-cycle input can never
    * converge; non-negative weights always do).
    *
    * Scale shape: state is one (node, dist) row per reached node;
    * each round is one edge-keyed equi-join (frontier-sized, not
    * graph-sized), one min aggregate, one min-merge aggregate —
    * localCheckpointed so plans never stack. The one driver value per
    * round is the improved-count.
    */
  def sssp(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      source: Long,
      directed: Boolean = false,
      maxRounds: Int = 128): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = edges.sparkSession
    val typed = edges
      .select(
        col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"),
        col(wCol).cast("double").as("w"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("w").isNotNull)
      .filter(col("a") =!= col("b"))
    // eager + size-partitioned (the KCore.decompose shape): the relax
    // loop joins e every round; checkpointed once and viewed through a
    // data-derived coalesce, each round's probe reads a few cached
    // blocks instead of shuffle.partitions KB-block tasks
    val e0 = (if (directed) typed
             else typed.unionAll(
               typed.select(col("b").as("a"), col("a").as("b"), col("w"))))
      .groupBy(col("a"), col("b"))
      .agg(org.apache.spark.sql.functions.min(col("w")).as("w"))
      .localCheckpoint(true)
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      e0.count() / 100000L + 1L)).toInt
    val e = e0.coalesce(parts)
    // fail fast on negative weights: with directed=false, ONE negative
    // edge is a 2-cycle of negative total — the fixpoint would burn all
    // maxRounds of joins before throwing a generic non-convergence
    // error. One min(w) pass over the (already checkpointed) edge table
    // turns that into an immediate, precise rejection. Directed inputs
    // keep negative edges (label-correcting Bellman-Ford handles them;
    // only a directed negative CYCLE diverges, still caught by
    // maxRounds).
    if (!directed) {
      val minW = e.agg(org.apache.spark.sql.functions.min(col("w"))).head()
      if (!minW.isNullAt(0) && minW.getDouble(0) < 0.0) {
        throw new IllegalArgumentException(
          s"sssp with directed=false requires non-negative weights: " +
            s"min weight ${minW.getDouble(0)} < 0 forms a negative cycle " +
            "with its reverse edge, so no shortest path exists")
      }
    }

    val schema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("dist", org.apache.spark.sql.types.DoubleType, nullable = false)))
    var dist = spark
      .createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(source, 0.0)), 1), schema)
      .localCheckpoint(true)
    var frontier = dist
    var rounds = 0
    var improving = true
    while (improving) {
      rounds += 2 // two relax applications per materialized round
      if (rounds > maxRounds)
        throw new IllegalStateException(
          s"SSSP still improving after maxRounds=$maxRounds rounds — " +
            "either a negative cycle or a longer-than-expected optimal " +
            "path; check weights or raise maxRounds")
      // FUSED round (one exchange + one checkpoint, was three jobs): the
      // relax candidates union the old table under a tag and ONE min
      // aggregate yields the merged distance AND the old distance per
      // node, so "improved" is a column — min(old, cand) is the same
      // IEEE min the separate join+union+min computed, bit-identical;
      // the improved-count reads the checkpointed blocks (no recompute).
      //
      // DOUBLE-STEPPED (r16): TWO lazy relax+merge steps ride each
      // checkpoint — the per-round fixed costs (checkpoint job, count
      // job, driver planning) amortize over two hops of propagation.
      // Values are bit-identical: improvements propagate one hop per
      // relax application either way, so the same candidate multiset
      // meets the same order-free IEEE min. Convergence stays exact:
      // __imp flags the SECOND step's improvements, and "step 2
      // improved nothing" is the single-step stop condition verbatim
      // (step 2 relaxes exactly step 1's improved set; an empty
      // improvement there is the fixpoint regardless of step 1). The
      // step-1 subtree feeds both step-2 branches, but its exchange is
      // canonically identical in each — ReuseExchange computes it once.
      def relaxMerge(d: DataFrame, f: DataFrame): DataFrame = {
        val cand = e
          .join(f.select(col("node").as("a"), col("dist")), Seq("a"))
          .select(col("b").as("node"), (col("dist") + col("w")).as("dist"))
        d
          .select(col("node"), col("dist"), lit(false).as("__cand"))
          .unionAll(cand.select(col("node"), col("dist"), lit(true).as("__cand")))
          .groupBy(col("node"))
          .agg(
            org.apache.spark.sql.functions.min(col("dist")).as("dist"),
            org.apache.spark.sql.functions.min(
              org.apache.spark.sql.functions.when(!col("__cand"), col("dist")))
              .as("__old"))
          .select(col("node"), col("dist"),
            (col("__old").isNull || col("dist") < col("__old")).as("__imp"))
      }
      val m1 = relaxMerge(dist, frontier)
      val merged = relaxMerge(
          m1.select(col("node"), col("dist")),
          m1.filter(col("__imp")).select(col("node"), col("dist")))
        .coalesce(parts)
        .localCheckpoint(true)
      improving = merged.filter(col("__imp")).count() > 0L
      frontier = merged.filter(col("__imp")).select(col("node"), col("dist"))
      dist = merged.select(col("node"), col("dist"))
    }
    dist
  }
}
