package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HITS (Kleinberg 1999) over a weighted edge table — hubs point at
  * good authorities, authorities are pointed at by good hubs: the
  * directed-graph complement of PageRank's stationary-flow rank (qg9).
  * Where PageRank answers "how central is this node to flow", HITS
  * separates the two directed roles — in the trade graph a nation can
  * be a strong BUYER hub without being a SELLER authority at all.
  *
  * Iteration (weighted mutual reinforcement, fixed count):
  * {{{
  *   a_t(v) = Σ_{u→v} w(u,v) · h_{t−1}(u)   then a_t /= max(a_t)
  *   h_t(u) = Σ_{u→v} w(u,v) · a_t(v)       then h_t /= max(h_t)
  * }}}
  * MAX-normalization, not the textbook L2: convergence is identical
  * (any norm works — the iterates converge to the principal
  * eigenvectors of WᵀW / WWᵀ up to scale) but `max` is an EXACT
  * comparison-based aggregate in every engine, while a sum of squares
  * inherits summation-order ulps that a root then smears across every
  * score. The one remaining float slack — the per-node Σ w·h — is the
  * same bounded-fan-in slack qg9 carries, absorbed by the 6-dp output
  * round. Fixed iterations keep the result an exact arithmetic
  * function of the input, replayable as unrolled MATERIALIZED CTEs
  * (the qg11 k-core oracle pattern).
  *
  * Spark shape (the qg9 idioms): parallel edges pre-sum ONCE and
  * persist (the never-changing join side); one half-step = one join of
  * the n-row score vector against the edges + one map-side-combined
  * aggregate; the normalizing max rides back as a broadcast 1-row
  * cross join (no driver action); every new vector repartitions to a
  * size-appropriate partition count and `localCheckpoint`s (eager) —
  * the lineage cut that keeps iteration cost flat (persist alone nests
  * the plan one join deeper per round; see PageRank).
  *
  * Output: (node, hub, authority) for every node, max score 1.0 on
  * each axis; sourceless nodes get authority from in-edges and hub 0,
  * sinkless ones vice versa.
  */
object Hits {

  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = edges.sparkSession

    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("double").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n / 100000L + 1L)).toInt

    def normalized(raw: DataFrame, as: String): DataFrame = {
      val m = raw.agg(max("raw").as("__m"))
      raw.crossJoin(broadcast(m))
        .select(col("node"),
          when(col("__m") > 0.0, col("raw") / col("__m"))
            .otherwise(lit(0.0)).as(as))
        .repartition(parts)
        .localCheckpoint(true)
    }
    // gather along edges: scores flow src→dst (by="src", out by dst)
    // or dst→src; nodes with no contributing edge score 0
    def gather(scores: DataFrame, scoreCol: String, by: String, out: String): DataFrame =
      nodes.join(
        scores.join(e, scores("node") === e(by))
          .groupBy(col(out).as("node"))
          .agg(sum(col("w") * col(scoreCol)).as("raw")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("raw"), lit(0.0)).as("raw"))

    var h = nodes.select(col("node"), lit(1.0).as("h"))
      .repartition(parts).localCheckpoint(true)
    var a: DataFrame = null
    (1 to iterations).foreach { _ =>
      a = normalized(gather(h, "h", by = "src", out = "dst"), "a")
      h = normalized(gather(a, "a", by = "dst", out = "src"), "h")
    }
    val out = h.join(a, Seq("node"))
      .select(col("node"), col("h").as("hub"), col("a").as("authority"))
    e.unpersist(); nodes.unpersist()
    out
  }
}
