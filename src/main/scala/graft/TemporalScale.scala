package graft

import org.apache.spark.sql.functions._

/** Scale measurement for the keyed time-series tier (the GraphScale
  * pattern applied to Temporal): deterministic hash-random series at
  * 10⁶ / 10⁷ rows, 1000 observations per key (the bounded-series
  * contract every keyed temporal op carries), wall times on local[32].
  * Run: `sbt "runMain graft.TemporalScale [maxRows]"`. The point is
  * the SHAPE — one key-partitioned exchange each, per-key work linear
  * (gapFill, twap, zscore) or n·k (lttb) — so wall should track rows,
  * not keys² or rows².
  */
object TemporalScale {
  def main(args: Array[String]): Unit = {
    val maxRows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = GraftSession.local(32, "temporal-scale")
    Seq(1000000L, 10000000L).filter(_ <= maxRows).foreach { rows =>
      val keys = rows / 1000L // 1000 observations per key
      val df = spark.range(rows).select(
        pmod(xxhash64(col("id")), lit(keys)).as("k"),
        // ~37 s global spacing with deterministic jitter → per-key
        // observation spacing ≈ keys·37 s ≈ 10 h; 1-day buckets below
        // give each key a mix of multi-obs buckets and short gaps
        expr("timestamp_micros(id * 37000000 + pmod(xxhash64(id + 99), 1000000))")
          .as("ts"),
        col("id").as("tie"),
        (pmod(xxhash64(col("id") + 7L), lit(1000000L)).cast("double") / 1000.0)
          .as("v"))
        .localCheckpoint(true)
      def time(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[temporalscale] rows=$rows%9d $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (result=$r)")
      }
      time("gapfill") {
        operators.Temporal.gapFill(df, "k", "ts", "tie", "v",
          bucketSec = 86400L, maxGapBuckets = 8).count()
      }
      time("lttb50") {
        operators.Temporal.lttb(df, "k", "ts", "tie", "v", k = 50).count()
      }
      time("holt") {
        operators.Temporal.holt(df, "k", "ts", "tie", "v",
          alpha = 0.5, beta = 0.25).count()
      }
      time("twap") {
        operators.Temporal.twap(df, "k", "ts", "tie", "v", 86400L).count()
      }
      time("zscore50") {
        operators.Temporal.rollingZscore(df, "k", "ts", "tie", "v",
          lookback = 50, threshold = 3.0).count()
      }
      time("ewma") {
        operators.Temporal.ewma(df, "k", "ts", "tie", "v", alpha = 0.25)
          .count()
      }
      // DTW (qe53): Θ(pairs × maxLen²) BY CONTRACT — the probe bounds
      // the pair set to 64 keys (2016 pairs, 100² DP cells each inside
      // one task; no shuffle beyond the series build), the blocking-
      // stage discipline the operator doc demands at corpus scale
      time("dtw64x100") {
        operators.Temporal.dtwDistances(
          df.filter(col("k") < 64L), "k", "ts", "tie", "v", maxLen = 100)
          .count()
      }
      // lagged xcorr (qe54): Θ(K²·span·lags) BY CONTRACT (K is a
      // CATEGORY count — event types, channels, experiment arms); 32
      // remapped categories over the full row volume, daily buckets
      time("xcorr32") {
        operators.Temporal.laggedCrossCorrelation(
          df.select(pmod(col("k"), lit(32L)).as("k"), col("ts")),
          "k", "ts", bucketSeconds = 86400L, maxLag = 3).count()
      }
    }
    spark.stop()
  }
}
