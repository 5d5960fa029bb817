package graft

import org.apache.spark.sql.SparkSession

/** G5 decision harness (round 8): measure plain-Dijkstra routing at
  * 10⁵–10⁶ ways to settle whether contraction hierarchies / bidirectional
  * search are needed (`/root/reference/script-eaul/routing-algorithms.md`
  * discusses CH; SURVEY G5). Emits one JSON line per network size:
  * broadcast graph bytes, per-Dijkstra ms, route-matrix wall, sampled
  * leave-one-out criticality wall + the full-sweep extrapolation.
  *
  * Usage: sbt "runMain graft.RoutingScale 224 708"  (2n(n-1) ways each)
  */
object RoutingScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt) else Array(100, 224, 708)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    sizes.foreach { n =>
      val (g, od) = graph.DemoNetwork.grid(n)
      val nWays = g.ways.length
      // broadcast payload: java-serialized CSR size (what executors receive)
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(g); oos.close()
      val graphBytes = bos.size()

      // per-Dijkstra cost (median of 5 sources, warm)
      g.dijkstra(od(0)) // warm JIT
      val dijkstraMs = (1 to 5).map { i =>
        val t0 = System.nanoTime()
        g.dijkstra(od(i % od.length))
        (System.nanoTime() - t0) / 1e6
      }.sorted.apply(2)

      // distributed route matrix over the 5-node OD set
      val bg = sc.broadcast(g)
      val t1 = System.nanoTime()
      val mrows = plans.RouteMatrixPlan.routeMatrix(spark, g, od).count()
      val matrixSec = (System.nanoTime() - t1) / 1e9

      // sampled leave-one-out criticality: K scenarios, each a full OD
      // matrix with one way severed — the exact per-way unit of G7
      val k = math.min(nWays, math.max(256, 4000000 / math.max(1, n * n / 100)))
      val sample = (0 until nWays by math.max(1, nWays / k)).toArray
      val t2 = System.nanoTime()
      sc.parallelize(sample.toIndexedSeq, math.min(sample.length, 256))
        .map { w => graph.Routing.routeMatrixLocal(bg.value, od, i => if (i == w) Double.PositiveInfinity else 1.0).length }
        .count()
      val sweepSec = (System.nanoTime() - t2) / 1e9
      val fullSweepSec = sweepSec * nWays.toDouble / sample.length

      println(
        s"""{"metric":"routing_scale","grid_n":$n,"nodes":${n * n},"ways":$nWays,""" +
          s""""graph_broadcast_mb":${graphBytes / 1e6},"dijkstra_ms":$dijkstraMs,""" +
          s""""route_matrix_sec":$matrixSec,"sampled_ways":${sample.length},""" +
          s""""sampled_sweep_sec":$sweepSec,"extrapolated_full_sweep_sec":$fullSweepSec}""")
      bg.destroy()
    }
    spark.stop()
  }
}
