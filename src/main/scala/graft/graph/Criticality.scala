package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G7 — leave-one-out criticality (reference
  * `scripts/criticality/criticality.js:70-121` scoring, `:197-306` per-way).
  *
  * For each way: remove it, recompute the OD cost matrix, compare to the
  * benchmark. Spark layout: benchmark computed once and broadcast with the
  * graph; ways fan out over executors (embarrassingly parallel — the
  * reference ran 5-concurrent with a full OSRM copy + re-contract per way;
  * here a "scenario" is just a wayFactor closure, zero setup cost).
  *
  * Per-way stats follow the JS exactly (`criticality.js:232-303`):
  *  - pair unroutable in scenario → unroutablePairs++
  *  - deltaT = time − benchmark; ≥0 → collected, >0 → impactedPairs++,
  *    <0 → treated as unroutable (the JS "negative time" workaround)
  *  - avgTimeNonZero = Σdeltas / count(delta ≠ 0), 0 if no nonzero (`|| 0`)
  * Score (`criticality.js:93-110`):
  *  - avgMaxTime = max over ways of (unroutable+impacted)·avgTimeNonZero
  *  - maxUnroutable = max over ways of unroutablePairs
  *  - score = (0.4·timeScore||0 + 0.6·unroutableScore||0) · 100
  */
object Criticality {

  case class WayStats(
      wayId: Long,
      name: String,
      maxTime: Double,
      avgTime: Double,
      avgTimeNonZero: Double,
      unroutablePairs: Int,
      impactedPairs: Int)

  def waysStats(spark: SparkSession, g: CsrGraph, odNodes: Array[Int]): DataFrame = {
    import spark.implicits._
    val benchmark = Routing.routeMatrixLocal(g, odNodes)
    val sc = spark.sparkContext
    val bg = sc.broadcast(g)
    val bBench = sc.broadcast(benchmark)
    val nWays = g.ways.length
    sc.parallelize(0 until nWays, math.min(nWays, 256))
      .map { w =>
        val graph = bg.value
        val bench = bBench.value
        val result = Routing.routeMatrixLocal(graph, odNodes, wayFactor = i => if (i == w) Double.PositiveInfinity else 1.0)
        var unroutable = 0
        var impacted = 0
        val deltas = scala.collection.mutable.ArrayBuffer[Double]()
        var k = 0
        while (k < result.length) {
          val o = result(k)
          // benchmark rows share the scenario's upper-triangle ordering
          val b = bench(k)
          if (!o.routable) unroutable += 1
          else {
            val deltaT = o.ruc.get - b.ruc.getOrElse(0.0)
            if (deltaT >= 0) deltas += deltaT
            if (deltaT > 0) impacted += 1
            if (deltaT < 0) unroutable += 1
          }
          k += 1
        }
        val way = graph.ways(w)
        val sum = deltas.sum
        val nonZero = deltas.count(_ != 0.0)
        WayStats(
          way.osmId,
          way.name,
          maxTime = if (deltas.isEmpty) Double.NegativeInfinity else deltas.max,
          avgTime = if (deltas.isEmpty) 0.0 else sum / deltas.length,
          avgTimeNonZero = if (nonZero == 0) 0.0 else sum / nonZero,
          unroutablePairs = unroutable,
          impactedPairs = impacted)
      }
      .toDF()
  }

  /** Full scored indicator: way_id, score ∈ [0,100]. */
  def scores(spark: SparkSession, g: CsrGraph, odNodes: Array[Int]): DataFrame =
    scoreStats(waysStats(spark, g, odNodes))

  /** Scoring stage alone (criticality.js:93-110) over a stats frame with
    * columns (name, unroutablePairs, impactedPairs, avgTimeNonZero) —
    * split out so the normalization formula is property-testable without
    * running the routing sweep.
    */
  def scoreStats(stats: DataFrame): DataFrame = {
    val norms = stats.agg(
      max((col("unroutablePairs") + col("impactedPairs")) * col("avgTimeNonZero")).as("avgMaxTime"),
      max(col("unroutablePairs")).as("maxUnroutable"))
    stats
      .crossJoin(broadcast(norms))
      .withColumn(
        "timeScore",
        coalesce(
          (col("unroutablePairs") + col("impactedPairs")) * col("avgTimeNonZero") / col("avgMaxTime"),
          lit(0.0)))
      .withColumn(
        "unroutableScore",
        when(col("maxUnroutable") === 0, 0.0).otherwise(col("unroutablePairs").cast("double") / col("maxUnroutable")))
      .withColumn(
        "timeScore", when(isnan(col("timeScore")), 0.0).otherwise(col("timeScore")))
      .withColumn("score", (col("timeScore") * 0.4 + col("unroutableScore") * 0.6) * 100)
      .select(col("name").as("way_id"), col("score"), col("unroutablePairs"), col("impactedPairs"), col("avgTimeNonZero"))
  }
}
