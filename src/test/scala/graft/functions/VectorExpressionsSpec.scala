package graft.functions

import graft.GraftSession
import graft.functions.expressions.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(2, "vec-expr-spec")

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  test("codegen cosine matches the declarative HOF form on float embeddings") {
    import spark.implicits._
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = array((0 until 64).map(i => lit(math.sin(i + 1.0))): _*)
    val asD = transform(col("embedding"), v => v.cast("double"))
    val both = embs
      .select(
        col("vec_id"),
        VectorExpressions.cosineSimilarity(col("embedding"), q).as("fast"),
        hofCosine(asD, q).as("slow"))
      .collect()
    both.foreach(r => assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12))
  }

  test("dot/cosine edge cases: zero vector, mixed types, nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0f, 0f), Array(1.0, 2.0)),
      (2L, Array(1f, 2f), Array(3.0, 4.0))
    ).toDF("id", "f", "d")
    val rows = df
      .select(
        col("id"),
        VectorExpressions.cosineSimilarity(col("f"), col("d")).as("cos"),
        VectorExpressions.dotProduct(col("f"), col("d")).as("dot"))
      .orderBy("id")
      .collect()
    assert(rows(0).getDouble(1) == 0.0) // zero vector → 0
    assert(math.abs(rows(1).getDouble(2) - 11.0) < 1e-12)
    val withNull = df.select(VectorExpressions.cosineSimilarity(lit(null).cast("array<double>"), col("d"))).collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("nearestCells: null vector -> null row; null ELEMENT throws in " +
      "both eval paths (silent 0.0 would corrupt the L2 distance)") {
    import spark.implicits._
    val seeds = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    // null vector: expression is null-safe, row carries null
    val nv = Seq(Tuple1(Option.empty[Array[Double]])).toDF("v")
      .select(VectorExpressions.nearestCells(col("v"), seeds, 1)).collect()
    assert(nv.forall(_.isNullAt(0)))
    // null element: loud failure, not a silent 0.0 contribution
    val bad = Seq(Tuple1(Array(Option(1.0), Option.empty[Double]))).toDF("v")
    def assertThrows(df: org.apache.spark.sql.DataFrame): Unit = {
      val e = intercept[Exception] { df.collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("null element")))
    }
    // codegen path
    assertThrows(bad.select(VectorExpressions.nearestCells(col("v"), seeds, 1)))
    // interpreted path (wholestage off forces nullSafeEval)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assertThrows(bad.select(VectorExpressions.nearestCells(col("v"), seeds, 1)))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // well-formed vectors still assign to the nearest seed
    val ok = Seq(Tuple1(Array(9.5, 9.5))).toDF("v")
      .select(VectorExpressions.nearestCells(col("v"), seeds, 1)).as[Seq[Int]]
      .collect().head
    assert(ok == Seq(1))
  }

  test("type check rejects non-array inputs") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("id", "s")
    val e = intercept[Exception] {
      df.select(VectorExpressions.cosineSimilarity(col("s"), col("s"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine") || e.getMessage.contains("DATATYPE"))
  }
}
