package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - `bruteForceTopK`: exact cosine top-k against a literal query vector.
  *    One scan + one tree-aggregated top-k (no full sort: `sort_array` never
  *    appears; Spark's TakeOrderedAndProject handles the global k). This is
  *    the correctness baseline.
  *  - `knnJoin`: exact k-NN for EVERY row of a (small, broadcastable) query
  *    set against the corpus — broadcast-nested-loop + per-query window
  *    top-k. At 100 TB the corpus side streams; only queries broadcast.
  *  - `ivfTopK`: IVF-style scale path — corpus pre-clustered by nearest of
  *    `nCentroids` seeded pseudo-centroids (deterministic hyperplane-LSH
  *    cells); the query probes only its own cell ± nProbe neighbors,
  *    cutting the scan by the cell fan-out. Recall < 1.0 by construction;
  *    pair with bruteForceTopK when exactness matters.
  */
object Similarity {

  private def asDouble(c: Column): Column = transform(c, v => v.cast("double"))

  /** Exact top-k by cosine against one literal query vector. */
  def bruteForceTopK(embs: DataFrame, idCol: String, vecCol: String, query: Array[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    embs
      .withColumn("sim", round(VectorFunctions.cosine(col(vecCol), q), 6))
      .select(col(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }

  /** Exact k-NN join: for each row in `queries` (small side), the top-k
    * corpus rows by cosine. Queries are broadcast; corpus is never
    * shuffled — the window partitions by query id AFTER the similarity
    * projection, so the only shuffle is on (query_id, sim) pairs, already
    * reduced to one row per (query, corpus) candidate.
    */
  def knnJoin(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("sim", VectorFunctions.cosine(col(vecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol)).orderBy(desc("sim"), col(idCol))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("sim"), col("rank"))
  }

  /** IVF/LSH-bucketed approximate top-k for one literal query: corpus rows
    * hash to a `bits`-bit hyperplane cell; only rows whose cell is within
    * hamming `nProbe` of the query's cell are scored. The cell projection
    * is a pure column expression, so partition pruning applies if the
    * corpus is written bucketed by cell.
    */
  def ivfTopK(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Double],
      k: Int,
      bits: Int = 8,
      nProbe: Int = 1): DataFrame = {
    val dim = query.length
    val q = array(query.map(lit): _*)
    val cells = embs.withColumn("__cell", VectorFunctions.hyperplaneSignature(col(vecCol), dim, bits))
    // query cell computed the same deterministic way, driver-side constants
    val qCell = VectorFunctions.hyperplaneSignature(q, dim, bits)
    cells
      .filter(bit_count(col("__cell").bitwiseXOR(qCell)) <= nProbe)
      .withColumn("sim", round(VectorFunctions.cosine(col(vecCol), q), 6))
      .select(col(idCol), col("sim"))
      .orderBy(desc("sim"), col(idCol))
      .limit(k)
  }
}
