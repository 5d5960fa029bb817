package graft.operators

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(2, "textanalysis-spec")

  test("tf-idf: hand-computed scores, rank order, and k-cut") {
    import spark.implicits._
    // N=2. df(a)=2 -> idf=ln(1)=0; df(b)=df(c)=1 -> idf=ln(2)
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    val ln2 = BigDecimal(math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Array(
      (1L, "b", ln2, 1L), // tf=1 · ln(2/1)
      (1L, "a", 0.0, 2L), // tf=2 · ln(2/2) = 0
      (2L, "c", ln2, 1L),
      (2L, "a", 0.0, 2L)))
  }

  test("bigram LM score: hand-computed smoothed log-probs, in-domain > OOV") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // train bigrams: (a,b)×2, (b,a)×1 ⇒ c1(a)=2, c1(b)=1; V=2 (a,b)
    val train = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "a b"), // seen bigram: ln((2+1)/(2+2)) = ln(3/4)
      (3L, "q z")) // fully OOV: ln((0+1)/(0+2)) = ln(1/2)
    .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == (r6(math.log(0.75)), 1L))
    assert(out(3L) == (r6(math.log(0.5)), 1L))
    assert(out(1L)._1 > out(3L)._1) // in-domain text scores higher
    // a 1-token doc has no bigrams and is absent
    val single = TextAnalysis.bigramLmScore(
      train, Seq((5L, "a")).toDF("doc_id", "text"), "doc_id", "text")
    assert(single.filter(col("doc_id") === 5L).count() == 0)
  }

  test("tf-idf: k-cut keeps exactly k terms per doc with deterministic ties") {
    import spark.implicits._
    // all terms unique within the doc and globally -> identical tfidf;
    // ranking must fall back to term order
    val docs = Seq((1L, "z y x w")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getString(1), r.getLong(3))).sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq("w", "x", "y")) // alphabetical tie-break, z cut
  }

  test("dot-product top-k ranks by inner product with id tie-break") {
    import spark.implicits._
    val embs = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(2f, 0f)),
      (3L, Array(0f, 5f)), // orthogonal to the query -> dot 0
      (4L, Array(1f, 0f)) // ties with id 1
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopKDot(embs, "vec_id", "embedding", Array(1.0, 0.0), 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.toSeq == Seq((2L, 2.0), (1L, 1.0), (4L, 1.0)))
  }
}
