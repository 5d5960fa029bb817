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
    val e = edges
      .select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val ed = e.select(col("a").as("v"), col("b").as("w"))
      .unionAll(e.select(col("b").as("v"), col("a").as("w")))
      .persist()

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
    ed.unpersist(blocking = false)
    visited
  }
}
