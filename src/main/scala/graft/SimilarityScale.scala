package graft

import org.apache.spark.sql.functions._

/** Scale measurement for the ANN tier's all-pairs-shaped operator
  * (the GraphScale pattern applied to Similarity): deterministic
  * hash-random 64-dim vectors at 10⁴ / 10⁵ rows, wall times on
  * local[32] for [[operators.Similarity.mutualKnn]] bucketed
  * (multi-probe seed cells, nCells scaled ≈ n/256) vs the brute
  * n²-cosine twin. Run: `sbt "runMain graft.SimilarityScale [maxRows]"`.
  *
  * The point is the CURVE, not one number: brute is Θ(n²) cosines
  * behind a full-corpus broadcast (10⁴ → 10⁸ cosines; 10⁵ → 10¹⁰,
  * not runnable), while the bucketed form's candidate count is
  * ~(nProbe·n/nCells)²·nCells — with nCells ∝ n that is LINEAR in n
  * per cell-occupancy target, so 10× the vectors ≈ 10× the wall.
  * Measured (this machine, 2026-08, single runs incl. warmup):
  * 10⁴ → brute 22.2 s vs bucketed 7.2 s (18948 vs 18192 pairs — 96%
  * recall at 2 probes); 10⁵ → bucketed 56.3 s where brute is ~100×
  * its 10⁴ run (~2200 s). See ENGINE.md §ANN.
  */
object SimilarityScale {
  def main(args: Array[String]): Unit = {
    val maxRows = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = GraftSession.local(32, "similarity-scale")
    Seq(10000L, 100000L).filter(_ <= maxRows).foreach { rows =>
      // deterministic pseudo-random unit-ish vectors: 64 hash lanes
      val df = spark.range(rows).select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)), i =>
          (pmod(xxhash64(col("id") * 64 + i.cast("long")), lit(2000L))
            .cast("double") / 1000.0 - 1.0).cast("float")).as("embedding"))
        .localCheckpoint(true)
      def time(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[simscale] rows=$rows%7d $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (pairs=$r)")
      }
      val cells = math.max(16, (rows / 256L).toInt)
      time(s"bucketed c=$cells") {
        operators.Similarity
          .mutualKnn(df, "vec_id", "embedding", k = 5, nCells = cells, nProbe = 2)
          .count()
      }
      if (rows <= 10000L) time("brute") {
        operators.Similarity.mutualKnnBrute(df, "vec_id", "embedding", k = 5).count()
      }
      // DBSCAN at occupancy-constant bits: 2^bits grows with n so the
      // bucket pair stage stays Θ(n·occupancy), never Θ(n²/constant) —
      // the wall should track rows when bits tracks log2(rows)
      val bits = math.min(30,
        math.max(8, (math.log(rows / 64.0) / math.log(2.0)).ceil.toInt))
      time(s"dbscan b=$bits") {
        operators.Similarity
          .dbscanCosine(df, "vec_id", "embedding", dim = 64,
            simThreshold = 0.6, minPts = 2, bits = bits)
          .count()
      }
    }
    spark.stop()
  }
}
