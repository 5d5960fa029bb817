package graft.graph

/** The reference's 10-segment golden road network, reconstructed from the
  * documented fixture (`/root/reference/tests/README.md:1-61`,
  * `tests/fixtures/roadnetwork.osm`, `od.geojson`, `traffic.json`,
  * `roadnetwork_stats-{max,percent}.json`):
  *
  *  - 9 nodes on a ~1km grid at the equator; 10 ways with RUC/length per
  *    the README table;
  *  - 3 OD points A(node 0,0) B(0.026949474,0) C(0.017966316,0.004491579);
  *  - floods: ways "2","3" depth 20 at RP 500+1000 (50%/100% flooded),
  *    way "5" depth 20 at RP 1000 (100%);
  *  - traffic 100/day each direction on all pairs.
  *
  * Expected (prose spec, tests/README.md:23-61): A-B routes cost
  * 3.75 (1-2-3), 4.25 (1-4-5-6), 4.45 (1-7-8-9); A-C/B-C unroutable at
  * RP 500+1000; EAUL invariants per segment.
  */
object GoldenNetwork {

  private val D = 0.008983158 // ≈1 km in degrees at the equator

  // node id → (lon, lat)
  val nodeCoords: Vector[(Double, Double)] = Vector(
    (0.0, 0.0), // 0 = A
    (D, 0.0), // 1
    (2 * D, 0.0), // 2
    (3 * D, 0.0), // 3 = B
    (D, -D), // 4
    (3 * D, -D), // 5
    (D, D), // 6
    (3 * D, D), // 7
    (2 * D, D / 2) // 8 = C
  )

  // name, (srcNode, dstNode), lengthM, ruc
  val wayDefs: Vector[(String, (Int, Int), Double, Double)] = Vector(
    ("1", (0, 1), 1000, 1.25),
    ("2", (1, 2), 1000, 1.25),
    ("3", (2, 3), 1000, 1.25),
    ("4", (1, 4), 1000, 0.75),
    ("5", (4, 5), 2000, 0.75),
    ("6", (5, 3), 1000, 0.75),
    ("7", (1, 6), 1000, 0.8),
    ("8", (6, 7), 2000, 0.8),
    ("9", (7, 3), 1000, 0.8),
    ("10", (8, 2), 500, 0.8))

  def graph: CsrGraph = {
    val ways = wayDefs.zipWithIndex.map { case ((name, _, lenM, ruc), i) =>
      Way(i, i + 1L, name, ruc, lenM, "unpaved", "tertiary")
    }.toArray
    val edges = wayDefs.zipWithIndex.map { case ((_, (s, d), lenM, ruc), i) =>
      (s, d, i, ruc * lenM / 1000.0)
    }
    RoadGraph.compile(
      nodeCoords.length,
      edges,
      ways,
      nodeCoords.map(_._1).toArray,
      nodeCoords.map(_._2).toArray)
  }

  val odNodes: Array[Int] = Array(0, 3, 8) // A, B, C

  private val rps = Eaul.FloodReturnPeriods
  private def perRp(vals: Map[Int, Double]): Map[Int, Double] =
    rps.map(rp => rp -> vals.getOrElse(rp, 0.0)).toMap

  val floodStats: Eaul.FloodStats = Eaul.FloodStats(
    depth = Map(
      "2" -> perRp(Map(500 -> 20.0, 1000 -> 20.0)),
      "3" -> perRp(Map(500 -> 20.0, 1000 -> 20.0)),
      "5" -> perRp(Map(1000 -> 20.0))
    ).withDefaultValue(perRp(Map.empty)),
    lengthPct = Map(
      "2" -> perRp(Map(500 -> 50.0, 1000 -> 100.0)),
      "3" -> perRp(Map(500 -> 50.0, 1000 -> 100.0)),
      "5" -> perRp(Map(1000 -> 100.0))
    ).withDefaultValue(perRp(Map.empty)))

  /** yearly traffic per OD index pair: (100 + 100) · 365 everywhere. */
  val yearlyTraffic: Array[Array[Double]] =
    Array.fill(3, 3)(200.0 * 365)

  val noTraffic: Set[(Int, Int)] = Set.empty
}
