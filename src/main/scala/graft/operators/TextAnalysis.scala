package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text analytics for training-data pipelines (beyond the
  * reference's surface — the §"training-data pipeline operators" mandate):
  * term statistics that need the WHOLE corpus, not just one row, unlike
  * the per-document kernels in `functions/TextFunctions`.
  *
  * Scale shape: tokenization is a generator (`explode`) so it never
  * materializes per-doc arrays driver-side; term frequencies are one
  * hash-shuffle on (doc, term) with map-side partial combine; document
  * frequencies one more on term. The doc count rides as a broadcast
  * 1-row frame (no driver action, stays one lazy plan). The per-doc
  * top-k window partitions by doc — at 100 TB that shuffle is bounded by
  * the distinct (doc, term) pairs, already aggregated, never raw tokens.
  */
object TextAnalysis {

  /** Bigram language-model scoring (the KenLM-perplexity quality filter of
    * CCNet/Gopher pipelines, reduced to a bigram model so it is exactly
    * replayable): train add-1-smoothed bigram probabilities on `train`,
    * score each `eval` doc by its mean log-probability
    * `avg(ln((c(w1,w2)+1) / (c(w1)+V)))`, where `c(w1)` is w1's count as
    * a bigram history (Σ_w2 c(w1,w2)) and V the distinct-unigram vocab
    * size. Low (very negative) scores = text unlike the training corpus.
    * Docs with < 2 tokens have no bigrams and are not scored.
    *
    * Scale shape: bigram extraction is the codegen-friendly
    * slice+arrays_zip+explode (no CodegenFallback HOF); model counts are
    * two hash aggregations with map-side combine; scoring is two
    * equi-joins on (w1,w2)/(w1) — shuffle-bound by distinct bigrams, not
    * corpus size. V rides as a broadcast 1-row frame.
    */
  def bigramLmScore(train: DataFrame, eval: DataFrame, idCol: String, textCol: String): DataFrame = {
    def bigrams(df: DataFrame): DataFrame = df
      .withColumn("__toks", split(lower(trim(col(textCol))), "\\s+"))
      .withColumn("__h", expr("slice(__toks, 1, size(__toks) - 1)"))
      .withColumn("__t", expr("slice(__toks, 2, size(__toks) - 1)"))
      .select(col(idCol), explode(arrays_zip(col("__h"), col("__t"))).as("__p"))
      .select(col(idCol), col("__p.__h").as("w1"), col("__p.__t").as("w2"))
    val tb = bigrams(train).groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val tu = tb.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = train
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("__v"))
    bigrams(eval)
      .join(tb, Seq("w1", "w2"), "left")
      .join(tu, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn(
        "__lp",
        log((coalesce(col("c12"), lit(0L)) + 1.0) / (coalesce(col("c1"), lit(0L)) + col("__v"))))
      .groupBy(col(idCol))
      .agg(round(avg(col("__lp")), 6).as("lm_score"), count(lit(1)).as("n_bigrams"))
  }

  /** TF-IDF: top-`k` terms per document, `tfidf = tf · ln(N / df)`.
    * Whitespace tokenization on the lowercased, trimmed text (matching
    * `TextFunctions.tokenCount` semantics). Scores are rounded to 6
    * decimals BEFORE ranking so the ordering (and the k-boundary cut) is
    * deterministic across engines and partitionings; ties break on term.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    // document frequency as a WINDOW over tf, not a groupBy+self-join:
    // tf's keys ARE the distinct (doc, term) pairs, and the window keeps
    // the plan one linear chain — a tf-vs-dfreq join canonicalizes to two
    // separate scan+explode subtrees that ReuseExchange does NOT dedupe
    // (verified via explain), i.e. the corpus would be tokenized twice
    val wTerm = Window.partitionBy(col("term"))
    val n = docs.agg(count(lit(1)).cast("double").as("__n"))
    val w = Window.partitionBy(col(idCol)).orderBy(desc("tfidf"), col("term"))
    tf.withColumn("df", count(lit(1)).over(wTerm).cast("double"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("__n") / col("df")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tfidf"), col("rk"))
  }
}
