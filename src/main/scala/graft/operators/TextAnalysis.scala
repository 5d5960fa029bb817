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
