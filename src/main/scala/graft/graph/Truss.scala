package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-TRUSS DECOMPOSITION (Cohen 2008) — the maximal subgraph in which
  * every edge participates in ≥ k−2 triangles: the EDGE-cohesion
  * sibling of the k-core's vertex degrees, and the standard "community
  * nucleus" extractor (every k-truss is a (k−1)-core, but far denser).
  * Same iterative-peel fixpoint as [[KCore]]: dropping a weak edge
  * destroys triangles of its neighbours, so the peel cascades and must
  * run to a fixpoint, not a fixed depth.
  *
  * Per round, edge support is the [[Triangles]] edge-iterator kernel:
  * per-node adjacency lists (distinct sets) join to each surviving
  * edge's two endpoints and `array_intersect` counts common neighbours
  * inside codegen — two id-keyed joins + one aggregate per round, the
  * surviving edge set `localCheckpoint`ed (the qg9 lineage rule). Scale
  * caveat, stated honestly: support needs the FULL neighbourhood (no
  * degree orientation can cap it like triangle COUNTING), so a
  * celebrity node's adjacency array is its true degree — the known
  * k-truss scale cost; the standard mitigation when that bites is
  * hash-partitioning neighbourhoods, at the price of a second shuffle.
  */
object Truss {

  /** Edges of the k-truss with their within-truss support:
    * `(a, b, support)`, a < b, support ≥ k−2. Input may contain
    * duplicates, both orientations, self-loops. Empty truss → empty
    * frame, same schema.
    */
  def decompose(edges: DataFrame, aCol: String, bCol: String, k: Int): DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    val spark = edges.sparkSession

    def supports(cur: DataFrame): DataFrame = {
      val ed = cur.select(col("a").as("v"), col("b").as("w"))
        .unionAll(cur.select(col("b").as("v"), col("a").as("w")))
      val adj = ed.groupBy(col("v")).agg(collect_list(col("w")).as("nbrs"))
      cur
        .join(adj.select(col("v").as("a"), col("nbrs").as("__na")), Seq("a"))
        .join(adj.select(col("v").as("b"), col("nbrs").as("__nb")), Seq("b"))
        .select(col("a"), col("b"),
          size(array_intersect(col("__na"), col("__nb"))).cast("long").as("support"))
    }

    var cur = edges
      .select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var n = cur.count()
    var converged = n == 0L
    while (!converged) {
      val next = supports(cur)
        .filter(col("support") >= k - 2)
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      val m = next.count()
      converged = m == n
      cur = next
      n = m
    }
    supports(cur)
  }
}
