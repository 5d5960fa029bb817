package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the 2-D Hilbert-curve index — the
  * locality-preserving alternative to the Morton/Z interleave in
  * `Layout.zorder2`. Consecutive Hilbert codes are ALWAYS 4-neighbour
  * grid cells (no Z-shape jumps across half the domain), so range
  * clustering by the Hilbert value packs spatially-adjacent rows into
  * the same file strictly better than Z at the same bit budget — the
  * curve behind Delta Lake's liquid clustering and Iceberg's
  * Hilbert-order rewrite, re-expressed on vanilla Spark.
  *
  * Why a custom Expression and not unrolled builtin columns (the way
  * `Layout.spread16` does Morton): the per-bit Hilbert step REWRITES the
  * (x, y) state — each level's coordinates are a `when()` over the
  * previous level's — so a builtin-column unroll at order k builds an
  * expression tree of size O(2^k) (every reference substitutes the whole
  * prior tree). This node emits the classic O(order) iterative loop
  * (Hilbert 1891; iterative xy2d form as published in Wikipedia's
  * "Hilbert curve" article and Warren's Hacker's Delight) via
  * `doGenCode`, staying inside whole-stage codegen at constant code
  * size. The same arithmetic is replayed by the qy6 oracle as a DuckDB
  * recursive CTE — one iteration per recursion step.
  *
  * Contract: inputs are LONG cell coordinates; only the low `order` bits
  * are used (callers mask/scale first). Output is the Hilbert distance
  * d ∈ [0, 4^order). Null in → null out (BinaryExpression default).
  * `order` ∈ [1, 31] keeps s·s and d in positive Long range.
  */
case class Hilbert2(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  require(order >= 1 && order <= 31, s"hilbert2 order must be in [1,31], got $order")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert2 expects (bigint, bigint), got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertExpressions.xy2d(order, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |long $n = 1L << $order;
         |long $x = $a & ($n - 1L);
         |long $y = $b & ($n - 1L);
         |long $d = 0L;
         |for (long $s = $n >> 1; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $n - 1L - $x; $y = $n - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertExpressions {

  /** Column-facing constructor; inputs are cast to long. */
  def hilbert2(x: Column, y: Column, order: Int): Column =
    ColumnBridge.column(Hilbert2(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")),
      order))

  /** Driver-side xy→d — the same loop the codegen emits (shared by
    * `nullSafeEval`, the range-decomposition walk, and specs).
    */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    val n = 1L << order
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Driver-side d→(x, y) inverse (spec cross-check + interval sanity).
    * Note the rotation here uses the CURRENT level size `s`, not `n` —
    * the published inverse pairs with [[xy2d]] exactly (round-trip is
    * property-pinned in LayoutSpec).
    */
  def d2xy(order: Int, d: Long): (Long, Long) = {
    val n = 1L << order
    var x = 0L
    var y = 0L
    var t = d
    var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
