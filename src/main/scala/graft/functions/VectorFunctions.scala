package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>`/`array<double>` embedding
  * columns. The hot kernels (dot, cosine) are custom codegen Catalyst
  * expressions ([[graft.functions.expressions.DotProduct]] /
  * [[graft.functions.expressions.CosineSimilarity]]) — Spark's array
  * higher-order functions are CodegenFallback (interpreted), which is the
  * wrong tool on a 100 TB ANN scan. The rarely-hot pieces stay declarative.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — fused codegen loop; null if either side is null. */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.dotProduct(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector is all-zero —
    * single fused pass (dot + both norms in one loop).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.cosineSimilarity(a, b)

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane signature for cosine LSH: `bits(v)[i] = sign(v·hᵢ)`
    * packed into a Long. Hyperplanes are generated driver-side from a fixed
    * seed and inlined as literals, so the projection is deterministic and
    * broadcast-free.
    */
  def hyperplaneSignature(v: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    require(bits <= 63, "signature packs into a Long")
    val rnd = new scala.util.Random(seed)
    // gaussian hyperplanes, one per bit
    val planes: Seq[Array[Double]] = Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
    val bitCols = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(v, planeCol) >= 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_))
  }
}
