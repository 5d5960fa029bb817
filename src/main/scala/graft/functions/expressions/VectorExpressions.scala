package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over dense embedding
  * arrays (`array<float>` or `array<double>`, mixed sides allowed).
  *
  * Why an Expression and not `zip_with`/`aggregate` column math: Spark's
  * array higher-order functions are `CodegenFallback` — every element hop
  * is an interpreted expression-tree walk. This node emits a tight fused
  * JVM loop via `doGenCode` (one pass computes dot, |a|², |b|²), keeping
  * the ANN scan inside whole-stage codegen. Preference order per
  * SURVEY §7.3: compose built-ins (done where cheap) → custom Expression
  * (this) → custom physical operator (not needed here).
  *
  * Null semantics: null array → null result (BinaryExpression default);
  * elements are assumed non-null (embedding contract). Unequal lengths
  * compare the common prefix. All-zero vector → 0.0.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.$lGet($i);
         |  double $yi = (double) $b.$rGet($i);
         |  $dot += $xi * $yi;
         |  $nx += $xi * $xi;
         |  $ny += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused dot product — same rationale and contracts as [[CosineSimilarity]]. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += (if (lf) x.getFloat(i).toDouble else x.getDouble(i)) *
        (if (rf) y.getFloat(i).toDouble else y.getDouble(i))
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Top-`p` nearest seed cells for a vector against a small driver-side
  * codebook — the coarse-quantizer assignment step of IVF/mutual-kNN
  * candidate generation, fused into ONE codegen loop. Replaces the
  * boxed Scala UDF form: at n·nCells·dim scale (the probe cost grows
  * with the cell count that keeps occupancy constant) the UDF's
  * per-row Seq boxing dominated the whole operator (measured: qs14 at
  * sf1 spent most of its 43 s in the probe; this kernel runs the same
  * 4·10⁸ FLOPs inside whole-stage codegen).
  *
  * Semantics pinned to [[graft.operators.Similarity]]'s pqEncode/probe
  * contract: L2² distances rounded to 6 dp (floor(d·1e6 + 0.5)/1e6),
  * ties broken toward the LOWEST cell index, output = the p best cell
  * indices in (rounded distance, index) order. Null vector → null; a
  * null ELEMENT throws (the embedding contract is dense — parquet
  * arrays arrive as containsNull = true, so the type check can't reject
  * them statically, and silently reading a null slot as 0.0 would
  * corrupt the L2 distance, unlike the old Seq[Double] UDF path which
  * errored on deserialization).
  */
case class NearestCells(child: Expression, seeds: Array[Array[Double]], p: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells expects array<float|double>, got $t")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val f = isFloat // hoisted: the dataType pattern match must not run per element
    // null-element pre-scan: ONE pass per vector, not per (vector, seed)
    var g = 0
    val nv = v.numElements()
    while (g < nv) {
      if (v.isNullAt(g))
        throw new IllegalArgumentException(
          s"nearest_cells: null element at index $g in input vector")
      g += 1
    }
    val bestD = Array.fill(p)(Double.PositiveInfinity)
    val bestI = Array.fill(p)(-1)
    var c = 0
    while (c < seeds.length) {
      val cent = seeds(c)
      val n = math.min(cent.length, v.numElements())
      var d = 0.0
      var j = 0
      while (j < n) {
        val xj = if (f) v.getFloat(j).toDouble else v.getDouble(j)
        val diff = xj - cent(j)
        d += diff * diff
        j += 1
      }
      val rd = math.floor(d * 1e6 + 0.5) / 1e6
      // strict < at each slot keeps the earlier (lower) index on ties
      var k = 0
      while (k < p && !(rd < bestD(k))) k += 1
      if (k < p) {
        var m = p - 1
        while (m > k) { bestD(m) = bestD(m - 1); bestI(m) = bestI(m - 1); m -= 1 }
        bestD(k) = rd
        bestI(k) = c
      }
      c += 1
    }
    val out = bestI.takeWhile(_ >= 0)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.map(_.asInstanceOf[Any]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("seeds", seeds, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val bestD = ctx.freshName("bestD")
      val bestI = ctx.freshName("bestI")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      val rd = ctx.freshName("rd")
      val cent = ctx.freshName("cent")
      val nEl = ctx.freshName("nEl")
      val diff = ctx.freshName("diff")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val g = ctx.freshName("g")
      s"""
         |for (int $g = 0; $g < $v.numElements(); $g++) {
         |  if ($v.isNullAt($g)) {
         |    throw new IllegalArgumentException(
         |      "nearest_cells: null element at index " + $g + " in input vector");
         |  }
         |}
         |double[] $bestD = new double[$p];
         |int[] $bestI = new int[$p];
         |java.util.Arrays.fill($bestD, Double.POSITIVE_INFINITY);
         |java.util.Arrays.fill($bestI, -1);
         |for (int $c = 0; $c < $cbRef.length; $c++) {
         |  double[] $cent = $cbRef[$c];
         |  int $nEl = java.lang.Math.min($cent.length, $v.numElements());
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $nEl; $j++) {
         |    double $diff = ((double) $v.$get($j)) - $cent[$j];
         |    $d += $diff * $diff;
         |  }
         |  double $rd = java.lang.Math.floor($d * 1e6 + 0.5) / 1e6;
         |  int $k = 0;
         |  while ($k < $p && !($rd < $bestD[$k])) $k++;
         |  if ($k < $p) {
         |    for (int $m = $p - 1; $m > $k; $m--) {
         |      $bestD[$m] = $bestD[$m - 1];
         |      $bestI[$m] = $bestI[$m - 1];
         |    }
         |    $bestD[$k] = $rd;
         |    $bestI[$k] = $c;
         |  }
         |}
         |int $cnt = 0;
         |while ($cnt < $p && $bestI[$cnt] >= 0) $cnt++;
         |Object[] $out = new Object[$cnt];
         |for (int $m = 0; $m < $cnt; $m++) $out[$m] = (Object) (Integer) $bestI[$m];
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-facing constructors. */
  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def nearestCells(v: Column, seeds: Array[Array[Double]], p: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(v), seeds, p))
}
