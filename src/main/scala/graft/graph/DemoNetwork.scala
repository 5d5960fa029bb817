package graft.graph

/** Deterministic synthetic road network for exercising the routing
  * operators through the driver contract (SparkEntry qg* queries). An n×n
  * grid at the equator: every horizontal/vertical neighbor pair is one way
  * with a seeded pseudo-random RUC, OD points at the four corners + center.
  *
  * Network size is intentionally sf-independent: routing work scales with
  * the road network and scenario count, not the table scale factor (the
  * reference's network is likewise a fixed input, SURVEY.md §0).
  */
object DemoNetwork {

  private val D = 0.008983158 // ~1 km in degrees at the equator

  def grid(n: Int): (CsrGraph, Array[Int]) = {
    def nodeId(i: Int, j: Int) = i * n + j
    val coords = for (i <- 0 until n; j <- 0 until n) yield (j * D, i * D)
    val wayDefs = scala.collection.mutable.ArrayBuffer[(Int, Int, Double)]() // src, dst, ruc
    for (i <- 0 until n; j <- 0 until n) {
      def ruc(a: Int, b: Int) = 0.5 + ((a * 31 + b * 17) % 100) / 100.0
      if (j + 1 < n) wayDefs += ((nodeId(i, j), nodeId(i, j + 1), ruc(i, j)))
      if (i + 1 < n) wayDefs += ((nodeId(i, j), nodeId(i + 1, j), ruc(j, i)))
    }
    val ways = wayDefs.zipWithIndex.map { case ((_, _, ruc), idx) =>
      Way(idx, idx.toLong, s"w$idx", ruc, 1000.0, if (idx % 3 == 0) "paved" else "unpaved", "secondary")
    }.toArray
    val edges = wayDefs.zipWithIndex.map { case ((s, d, ruc), idx) =>
      // ~1 km edges; cost = RUC · length_km (G3 cost model)
      (s, d, idx, ruc * 0.99888)
    }.toSeq
    val g = RoadGraph.compile(
      n * n,
      edges,
      ways,
      coords.map(_._1).toArray,
      coords.map(_._2).toArray)
    val od = Array(nodeId(0, 0), nodeId(0, n - 1), nodeId(n - 1, 0), nodeId(n - 1, n - 1), nodeId(n / 2, n / 2))
    (g, od)
  }

  /** Flood stats severing a deterministic subset of ways at high return
    * periods (golden-fixture shape: monotone with RP).
    */
  def floodStats(g: CsrGraph): Eaul.FloodStats = {
    val rps = Eaul.FloodReturnPeriods
    def perRp(m: Map[Int, Double]) = rps.map(rp => rp -> m.getOrElse(rp, 0.0)).toMap
    val depth = g.ways.map { w =>
      val flooded = w.idx % 7 == 0
      w.name -> perRp(if (flooded) Map(500 -> 2.0, 1000 -> 2.5) else Map.empty)
    }.toMap
    val len = g.ways.map { w =>
      w.name -> perRp(if (w.idx % 7 == 0) Map(500 -> 50.0, 1000 -> 100.0) else Map.empty)
    }.toMap
    Eaul.FloodStats(depth, len)
  }

  def yearlyTraffic(nOd: Int): Array[Array[Double]] = Array.fill(nOd, nOd)(100.0 * 365)
}
