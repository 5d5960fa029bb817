package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text-hashing kernel shared by the UDF tier (`operators.Dedup`)
  * and the native codegen expressions below. One implementation — the
  * Expression path and the UDF path are bit-identical by construction, so
  * the DuckDB oracle replay contracts (FNV-1a over UTF-16 code units,
  * xor-fold finalizer, seeded mod-(2^31-1) permutations) hold for both.
  *
  * Static-forwarder friendly: a top-level Scala object with no companion
  * class compiles to static methods on `TextHashKernel`, so generated
  * whole-stage-codegen Java calls `TextHashKernel.minHashSignature(...)`
  * directly — no MODULE$ indirection in the hot loop's call site.
  */
object TextHashKernel {

  val Prime = 2147483647L // 2^31 - 1

  /** Null-safe tokenizer: null/empty text yields the single empty token
    * (matches the historical UDF behavior — a null doc gets a real
    * signature rather than a null, so LSH still buckets it).
    */
  def tokenize(text: String): Array[String] = {
    if (text == null) return Array("")
    // Locale.ROOT: default-locale toLowerCase diverges from SQL lower()
    // under tr/az JVM locales ('I' → dotless ı)
    val t = text.trim.toLowerCase(java.util.Locale.ROOT)
    if (t.isEmpty) Array("") else t.split("\\s+")
  }

  /** Distinct word n-gram shingles in first-occurrence order. */
  def wordShingleSet(text: String, n: Int): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) Array(toks.mkString(" "))
    else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      while (i + n <= toks.length) {
        val sb = new StringBuilder
        var j = i
        while (j < i + n) {
          if (j > i) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        out += sb.result()
        i += 1
      }
      out.toArray
    }
  }

  /** Sorted distinct word n-gram shingle array as Catalyst ArrayData
    * (UTF8String elements in their binary order — what `array_sort`
    * uses for strings): the one-pass kernel behind
    * [[SortedShingleSetExpr]]. Fewer than n tokens → empty array
    * (callers filter `size ≥ 1`; contrast [[wordShingleSet]]'s
    * whole-text fallback, which serves the MinHash path where every
    * doc must keep a signature).
    */
  def sortedShingleSet(text: String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = tokenize(text)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      set.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      set.toArray(Array.empty[AnyRef]))
  }

  /** Order-preserving set-membership filter over a string array: keep
    * the elements present in `keep` (a hash set built ONCE per
    * expression instance, not per row — the reason this exists instead
    * of `array_intersect(col, lit(bigArray))`, whose right-side set
    * rebuilds every evaluation). Elements are CLONED out of the
    * incoming (possibly unsafe-backed) array so the result survives
    * row-buffer reuse.
    */
  def retainIn(
      arr: org.apache.spark.sql.catalyst.util.ArrayData,
      keep: java.util.HashSet[UTF8String]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    if (arr == null) return null
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (keep.contains(s)) out.add(s.clone())
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(Array.empty[AnyRef]))
  }

  /** 64-bit FNV-1a over UTF-16 code units + one xor-fold finalizer.
    * See `operators.Dedup.hash64` scaladoc for the full replay contract
    * (this is the same function; Dedup delegates here).
    */
  def hash64(s: String): Long = {
    var h = -3750763034362895579L // 14695981039346656037 as signed 64-bit
    var i = 0
    while (i < s.length) {
      h = (h ^ s.charAt(i).toLong) * 1099511628211L
      i += 1
    }
    h ^ (h >>> 32)
  }

  /** Seeded universal-hash permutation coefficients (a ∈ [1, P-1], b ∈ [0, P-1]). */
  def minHashCoefs(numHashes: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)((rnd.nextInt(Prime.toInt - 1) + 1L, rnd.nextInt(Prime.toInt).toLong))
  }

  /** MinHash signature: one pass over the shingle set. `coefA`/`coefB` are
    * the split halves of [[minHashCoefs]] (primitive arrays so generated
    * code passes them without boxing).
    */
  def minHashSignature(text: String, shingleSize: Int, coefA: Array[Long], coefB: Array[Long]): Array[Long] = {
    val numHashes = coefA.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val shingles = wordShingleSet(text, shingleSize)
    var s = 0
    while (s < shingles.length) {
      val h = java.lang.Math.floorMod(hash64(shingles(s)), Prime)
      var k = 0
      while (k < numHashes) {
        val v = java.lang.Math.floorMod(coefA(k) * h + coefB(k), Prime)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      s += 1
    }
    mins
  }

  /** WINNOWING fingerprints (the qt51/qd24 contract compiled to one JVM
    * loop): word k-grams → first 56 bits of md5 (big-endian bytes 0–6 ≡
    * `conv(substring(md5_hex, 1, 14), 16, 10)` ≡ DuckDB's
    * `CAST('0x' || substr(md5, 1, 14) AS BIGINT)`) → w-window minima →
    * distinct, in first-occurrence order. Fewer grams than the window →
    * the single global min; fewer tokens than k → one whole-doc gram
    * (both match the SQL oracle's clamped slices). One MessageDigest
    * per document, reused across its grams; O(n·w) min scan (w is
    * single-digit — a deque buys nothing at that width).
    */
  def winnowFingerprints(text: String, k: Int, w: Int): Array[Long] = {
    val toks = tokenize(text)
    val md = java.security.MessageDigest.getInstance("MD5")
    val nGrams = math.max(toks.length - k + 1, 1)
    val hs = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + k, toks.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hs(i) = ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) |
        ((d(2) & 0xffL) << 32) | ((d(3) & 0xffL) << 24) |
        ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) | (d(6) & 0xffL)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]
    if (nGrams < w) {
      var m = Long.MaxValue
      var x = 0
      while (x < nGrams) { if (hs(x) < m) m = hs(x); x += 1 }
      out.add(m)
    } else {
      var s = 0
      while (s <= nGrams - w) {
        var m = Long.MaxValue
        var x = s
        while (x < s + w) { if (hs(x) < m) m = hs(x); x += 1 }
        out.add(m)
        s += 1
      }
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var r = 0
    while (it.hasNext) { res(r) = it.next(); r += 1 }
    res
  }

  /** SimHash: 64-bit signature, bit i = sign of the per-bit vote over
    * token hashes.
    */
  def simHash64(text: String): Long = {
    val votes = new Array[Int](64)
    val toks = tokenize(text)
    var t = 0
    while (t < toks.length) {
      val h = hash64(toks(t))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }
}

/** Native codegen `Expression` for MinHash signatures — the "next rung"
  * the Dedup scaladoc promised above the compiled UDF: same kernel, but
  * the call site lives INSIDE whole-stage codegen, so there is no ScalaUDF
  * wrapper (no InternalRow→external-Row conversion, no encoder round-trip,
  * no per-row closure dispatch) between the parquet scan and the signature
  * loop. The signature lands directly in an `UnsafeArrayData` (one
  * primitive-array copy, zero element boxing).
  *
  * Null contract (deliberate, matches the UDF tier): null text hashes like
  * the empty document — output is NEVER null (`nullable = false`), so LSH
  * banding still buckets null docs instead of dropping them.
  */
case class MinHashSignatureExpr(child: Expression, shingleSize: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"minhash_signature expects string, got ${child.dataType}")

  @transient private lazy val (coefA, coefB) = {
    val cs = TextHashKernel.minHashCoefs(numHashes, seed)
    (cs.map(_._1), cs.map(_._2))
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val s = if (v == null) null else v.asInstanceOf[UTF8String].toString
    UnsafeArrayData.fromPrimitiveArray(TextHashKernel.minHashSignature(s, shingleSize, coefA, coefB))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val aRef = ctx.addReferenceObj("minhashCoefA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("minhashCoefB", coefB, "long[]")
    val javaType = CodeGenerator.javaType(dataType)
    val resultCode =
      code"""
         |${childGen.code}
         |$javaType ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.functions.expressions.TextHashKernel.minHashSignature(
         |    ${childGen.isNull} ? null : ${childGen.value}.toString(), $shingleSize, $aRef, $bRef));
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Native codegen SimHash — same rationale and null contract as
  * [[MinHashSignatureExpr]]; emits a primitive long, so the downstream
  * 16-bit block-banding arithmetic stays in the same codegen stage.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash64 expects string, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    TextHashKernel.simHash64(if (v == null) null else v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
         |${childGen.code}
         |long ${ev.value} = graft.functions.expressions.TextHashKernel.simHash64(
         |  ${childGen.isNull} ? null : ${childGen.value}.toString());
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Native codegen SORTED DISTINCT WORD-SHINGLE SET: one pass from raw
  * text to the binary-sorted distinct n-gram array, replacing the
  * interpreted `transform(sequence, …concat_ws(element_at×n)…)` →
  * `array_distinct` → `array_sort` chain (every link CodegenFallback;
  * measured 9.8 → 3.4 s on the qd17 sf1 collapse). Semantics are
  * IDENTICAL to that chain: tokens = `split(lower(trim(text)), "\\s+")`,
  * fewer than n tokens → EMPTY array (the caller's `size ≥ 1` filter
  * drops the doc, as `size(toks) ≥ n` did), dedup + UTF8-binary sort
  * (java.util.TreeSet over UTF8String — the same ordering `array_sort`
  * applies to strings).
  */
case class SortedShingleSetExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sorted_shingle_set"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"sorted_shingle_set expects string, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    TextHashKernel.sortedShingleSet(if (v == null) null else v.asInstanceOf[UTF8String].toString, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val resultCode =
      code"""
         |${childGen.code}
         |$javaType ${ev.value} = graft.functions.expressions.TextHashKernel.sortedShingleSet(
         |  ${childGen.isNull} ? null : ${childGen.value}.toString(), $n);
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `retain_in(arr, keepSet)` — keep the array elements that belong to a
  * driver-known string set, preserving order. The set rides the expression
  * as a reference object (one `java.util.HashSet[UTF8String]`, built lazily
  * per instance, shared by every row the task evaluates), so membership is
  * O(1)/element with zero per-row set construction — the in-array Apriori
  * prune for [[graft.operators.TextAnalysis.assocPairs]], where the
  * frequent-item vocabulary is contract-bounded (≤ total incidences /
  * minSupport) but far too large to unroll into a literal `isin`.
  */
case class ArrayRetainInExpr(child: Expression, keep: Array[String]) extends UnaryExpression {

  @transient private lazy val keepSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](keep.length * 2)
    keep.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "retain_in"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"retain_in expects array<string>, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else TextHashKernel.retainIn(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], keepSet)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("retainInSet", keepSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextHashKernel.retainIn($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Native codegen WINNOWING — the whole per-document qt51 pipeline
  * (tokenize → k-gram → 56-bit md5 prefix → w-window minima → distinct)
  * as ONE kernel call inside whole-stage codegen. The higher-order-
  * function formulation paid ~11 µs per gram in interpreted ArrayTransform/
  * ArrayAggregate land (per-element struct + array-concat allocation);
  * this loop pays nanoseconds — measured 8.2 s → sub-second at sf0.1 on
  * the qt51 gate, identical output by construction (same tokenize, same
  * md5 prefix, same clamp rules — the SQL oracle is unchanged).
  *
  * Null contract: null text → null array (callers filter nulls first —
  * unlike MinHash there is no LSH-bucketing reason to hash a null doc).
  */
case class WinnowFingerprintsExpr(child: Expression, k: Int, window: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  require(window >= 1, s"window must be >= 1, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      TextHashKernel.winnowFingerprints(
        v.asInstanceOf[UTF8String].toString, k, window))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.functions.expressions.TextHashKernel.winnowFingerprints(
         |    $c.toString(), $k, $window));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object TextHashExpressions {
  /** Column-facing constructors. */
  def minHashSignature(text: Column, shingleSize: Int, numHashes: Int, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSignatureExpr(ColumnBridge.expression(text), shingleSize, numHashes, seed))

  def winnowFingerprints(text: Column, k: Int, window: Int): Column =
    ColumnBridge.column(WinnowFingerprintsExpr(ColumnBridge.expression(text), k, window))

  def simHash64(text: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(text)))

  def sortedShingleSet(text: Column, n: Int): Column =
    ColumnBridge.column(SortedShingleSetExpr(ColumnBridge.expression(text), n))

  def retainIn(arr: Column, keep: Array[String]): Column =
    ColumnBridge.column(ArrayRetainInExpr(ColumnBridge.expression(arr), keep))
}
