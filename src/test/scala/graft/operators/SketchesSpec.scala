package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Sketch contracts: KMV exactness below k and estimator sanity above
  * it, the k-min merge algebra (sketch of a union == merged sketches —
  * what makes set ops computable from summaries alone), count-min's
  * one-sided error, and bit-identical determinism across runs.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "sketches-spec")
  import spark.implicits._

  test("kmv: below k the sketch IS the distinct set — exact counts") {
    val df = (1 to 10).flatMap(i => Seq(("g", s"v$i"), ("g", s"v$i")))
      .toDF("k", "v")
    val out = Sketches.kmvDistinct(df, "k", "v", k = 32).collect().head
    assert(out.getLong(1) == 10L && out.getDouble(2) == 10.0)
  }

  test("kmv: above k the estimate lands within the ~1/sqrt(k) error band") {
    val n = 5000
    val df = (1 to n).map(i => ("g", s"value_$i")).toDF("k", "v")
    val est = Sketches.kmvDistinct(df, "k", "v", k = 256).collect().head.getDouble(2)
    // 3 standard errors at k=256 is ~19%
    assert(math.abs(est - n) / n < 0.19, s"est=$est for n=$n")
  }

  test("kmv: deterministic — same input, same estimate, any partitioning") {
    val df = (1 to 1000).map(i => ("g", s"value_$i")).toDF("k", "v")
    val a = Sketches.kmvDistinct(df.repartition(1), "k", "v", 16).collect().head.getDouble(2)
    val b = Sketches.kmvDistinct(df.repartition(7), "k", "v", 16).collect().head.getDouble(2)
    assert(a == b)
  }

  test("kmv set ops: merged sketches equal the sketch of the union") {
    // KMV algebra: k-min(A union B) = k-min(k-min(A) union k-min(B)) —
    // so est_union from kmvSetOps must equal kmvDistinct over the
    // concatenated slices relabelled to one group
    val a = (1 to 300).map(i => ("a", s"v$i"))
    val b = (200 to 500).map(i => ("b", s"v$i"))
    val df = (a ++ b).toDF("k", "v")
    val ops = Sketches.kmvSetOps(df, "k", "v", k = 16).collect().head
    val direct = Sketches.kmvDistinct(
      df.withColumn("k", lit("u")), "k", "v", k = 16).collect().head.getDouble(2)
    assert(ops.getDouble(2) == direct)
    // inclusion-exclusion arithmetic: estA + estB - estU, in that order
    val estA = Sketches.kmvDistinct(df.filter($"k" === "a"), "k", "v", 16)
      .collect().head.getDouble(2)
    val estB = Sketches.kmvDistinct(df.filter($"k" === "b"), "k", "v", 16)
      .collect().head.getDouble(2)
    assert(ops.getDouble(3) ==
      math.rint(((estA + estB) - ops.getDouble(2)) * 1e6) / 1e6)
  }

  test("count-min: estimates are exact or OVER, never under; absent term is >= 0") {
    val docs = (Seq.fill(40)("alpha beta") ++ Seq.fill(7)("beta gamma"))
      .toDF("text")
    val est = Sketches.countMinEstimate(
      docs, "text", Seq("alpha", "beta", "gamma", "nope"), depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 40L && est("beta") >= 47L && est("gamma") >= 7L)
    assert(est("nope") >= 0L)
    // with w=64 and only 3 distinct tokens, collisions are unlikely in
    // all 4 rows at once — the min should recover the exact counts
    assert(est("alpha") == 40L && est("beta") == 47L && est("gamma") == 7L)
  }

  test("hll: estimate lands within the ~1.04/sqrt(m) error band; registers bounded") {
    val n = 5000
    val df = (1 to n).map(i => ("g", s"value_$i")).toDF("k", "v")
    val out = Sketches.hllDistinct(df, "k", "v", p = 8).collect().head
    assert(out.getLong(1) <= 256L) // never more rows than registers
    val est = out.getDouble(2)
    // 3 standard errors at m=256 is ~20%
    assert(math.abs(est - n) / n < 0.20, s"est=$est for n=$n")
  }

  test("hll: small-range linear-counting branch is exact-ish and engaged") {
    // 10 distinct into 256 registers: raw estimate falls below 2.5m with
    // empty registers, so the m*ln(m/V) correction must fire — for V
    // this close to m it is near-exact
    val df = (1 to 10).map(i => ("g", s"v$i")).toDF("k", "v")
    val est = Sketches.hllDistinct(df, "k", "v", p = 8).collect().head.getDouble(2)
    assert(math.abs(est - 10.0) < 2.0, s"est=$est for n=10")
  }

  test("hll: deterministic — same input, same estimate, any partitioning") {
    val df = (1 to 1000).map(i => ("g", s"value_$i")).toDF("k", "v")
    val a = Sketches.hllDistinct(df.repartition(1), "k", "v", 4).collect().head.getDouble(2)
    val b = Sketches.hllDistinct(df.repartition(7), "k", "v", 4).collect().head.getDouble(2)
    assert(a == b)
  }

  test("hll set ops: union of registers equals the sketch of the union") {
    // the lossless merge: elementwise register max over A and B rebuilds
    // exactly the sketch of A ∪ B, so est_union must equal hllDistinct
    // over the concatenated slices relabelled to one group
    val a = (1 to 300).map(i => ("a", s"v$i"))
    val b = (200 to 500).map(i => ("b", s"v$i"))
    val df = (a ++ b).toDF("k", "v")
    val ops = Sketches.hllSetOps(df, "k", "v", p = 4).collect().head
    val direct = Sketches.hllDistinct(
      df.withColumn("k", lit("u")), "k", "v", p = 4).collect().head.getDouble(2)
    assert(ops.getDouble(2) == direct)
    val estA = Sketches.hllDistinct(df.filter($"k" === "a"), "k", "v", 4)
      .collect().head.getDouble(2)
    val estB = Sketches.hllDistinct(df.filter($"k" === "b"), "k", "v", 4)
      .collect().head.getDouble(2)
    assert(ops.getDouble(3) ==
      math.rint(((estA + estB) - ops.getDouble(2)) * 1e6) / 1e6)
  }

  test("hll: empty input produces no groups; nulls are dropped") {
    assert(Sketches.hllDistinct(Seq.empty[(String, String)].toDF("k", "v"),
      "k", "v", 4).isEmpty)
    val df = Seq(("g", "x"), ("g", null)).toDF("k", "v")
    val one = Sketches.hllDistinct(df, "k", "v", 4).collect().head
    assert(one.getLong(1) == 1L)
  }

  test("histogram quantile: hand-computed interpolation and edge-bin clamping") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val out = Sketches.histogramQuantile(df, "k", "v", 0.0, 100.0, 10,
        Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // q=0.5: target 50; bins 0..4 hold 9+10+10+10+10 = 49, bin 5 (cnt
    // 10, values 50..59) reaches it -> est = (5 + 1/10) * 10 = 51
    assert(out(0.5) == 51.0)
    // q=1.0: v=100 clamps into bin 9 (cnt 11) -> est = (9 + 1) * 10
    assert(out(1.0) == 100.0)
    // out-of-range values clamp into edge bins and still count
    val clamped = Sketches.histogramQuantile(
      Seq(("g", -5.0), ("g", 5.0), ("g", 150.0)).toDF("k", "v"),
      "k", "v", 0.0, 100.0, 10, Seq(0.5))
      .collect().head.getDouble(2)
    // bin 0 holds {-5, 5}: target 1.5 -> est = (0 + 1.5/2) * 10 = 7.5
    assert(clamped == 7.5)
  }

  test("histogram quantile: estimate within one bin width of the exact quantile") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 3000).map(_ => ("g", rnd.nextDouble() * 80.0 + 10.0)).toDF("k", "v")
    val vals = df.collect().map(_.getDouble(1)).sorted
    val est = Sketches.histogramQuantile(df, "k", "v", 0.0, 100.0, 64, Seq(0.9))
      .collect().head.getDouble(2)
    val exact = vals((0.9 * 3000).toInt - 1)
    assert(math.abs(est - exact) <= 100.0 / 64 + 1e-9, s"est=$est exact=$exact")
  }

  test("kmv: empty input produces no groups; empty-string values still hash") {
    assert(Sketches.kmvDistinct(Seq.empty[(String, String)].toDF("k", "v"),
      "k", "v", 16).isEmpty)
    val one = Sketches.kmvDistinct(Seq(("g", "")).toDF("k", "v"), "k", "v", 16)
      .collect().head
    assert(one.getLong(1) == 1L && one.getDouble(2) == 1.0)
  }
}
