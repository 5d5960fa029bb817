package graft

import org.apache.spark.sql.functions._

/** Scale measurement for the quantile-sketch tier (the TemporalScale
  * pattern applied to Sketches.quantileSketch): deterministic
  * hash-random values at 10⁶ / 10⁷ / 10⁸ rows, single group (the
  * worst case for any per-key selection), wall times on local[32].
  * Run: `sbt "runMain graft.SketchScale [maxRows]"`.
  *
  * What to look for: the sketch is ONE aggregation pass (per-(key,tz)
  * counts → 33-row window → sample filter) whose cost tracks the scan;
  * the exact path ([[operators.Relational.kthSmallest]]) is a
  * range-partitioned selection that re-scans per bisection round. The
  * crossover argument for 100 TB profiling: one sketch pass answers
  * EVERY quantile of EVERY key at once with ≤ k values per key of
  * state, while the exact path pays its scan(s) per rank probed — at
  * q quantiles × g groups the sketch amortizes q·g-fold.
  */
object SketchScale {
  def main(args: Array[String]): Unit = {
    val maxRows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = GraftSession.local(32, "sketch-scale")
    def time(rows: Long, label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[sketchscale] rows=$rows%10d $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (result=$r)")
    }
    Seq(1000000L, 10000000L, 100000000L).filter(_ <= maxRows).foreach { rows =>
      val df = spark.range(rows).select(
        lit("g").as("k"),
        (pmod(xxhash64(col("id")), lit(1000000000L)).cast("double") / 1000.0)
          .as("v"),
        col("id").cast("string").as("rid"))
      // deliberately NOT checkpointed: a 10⁸-row string projection
      // pinned in memory evicts the operators' own working set (the
      // 10⁸ run OOMed with it); spark.range regenerates in codegen for
      // less than the cache write cost, so each op pays generation —
      // identical on both sides of the comparison
      time(rows, "sketch_k4096") {
        operators.Sketches.quantileSketch(df, "k", "v", "rid",
          k = 4096, qs = Seq(0.25, 0.5, 0.75, 0.95)).count()
      }
      // tz-ONCE variant (the r13 VERDICT ask): persist the (key, v,
      // id, tz) projection so the level aggregate and the sample join
      // read it instead of each recomputing the md5 from the scan —
      // trades one full-width materialization (memory/disk pressure)
      // for one md5 pass
      time(rows, "sketch_tzonce") {
        val base = operators.Sketches.tzBase(df, "k", "v", "rid")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try operators.Sketches.quantileAnswers(
          operators.Sketches.levelSampleFrom(base, 4096, broadcastLevels = true),
          "k", Seq(0.25, 0.5, 0.75, 0.95)).count()
        finally base.unpersist(blocking = false)
      }
      time(rows, "exact_median") {
        operators.Relational.kthSmallest(df, "v", (rows + 1L) / 2L)
      }
      // error readout at this scale: values are ~uniform on [0, 1e6),
      // so the true q-quantile is ~q*1e6 — print the sketch's relative
      // rank displacement for the median
      val med = operators.Sketches.quantileSketch(df, "k", "v", "rid",
        k = 4096, qs = Seq(0.5)).collect().head.getDouble(5)
      println(f"[sketchscale] rows=$rows%10d median_est=$med%.3f (uniform true ~500000; rel rank err ~${math.abs(med - 500000.0) / 1000000.0}%.5f)")
    }
    spark.stop()
  }
}
