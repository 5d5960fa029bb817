package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** F15 verification. The transverse-Mercator series is checked against
  * INDEPENDENT math, not against itself: the meridian-arc integral is
  * re-derived by adaptive Simpson quadrature of the ellipsoid's meridian
  * radius (the defining integral, no series), anchor points follow from
  * the projection definition (central meridian → x = FE exactly), and
  * the scale factor on the central meridian must equal k0 by definition.
  * Round-trips then pin forward/inverse consistency to sub-1e-9°.
  */
class CrsSpec extends AnyFunSuite {
  import Crs._

  /** ∫ a(1−e²)/(1−e² sin²t)^{3/2} dt from 0 to phi — the meridian arc by
    * Simpson quadrature (defining integral; shares nothing with the
    * Snyder series under test).
    */
  private def meridianArcNumeric(phi: Double, steps: Int = 20000): Double = {
    def f(t: Double): Double = {
      val s = math.sin(t)
      A * (1 - E2) / math.pow(1 - E2 * s * s, 1.5)
    }
    val h = phi / steps
    var sum = f(0) + f(phi)
    var i = 1
    while (i < steps) {
      sum += (if (i % 2 == 1) 4.0 else 2.0) * f(i * h)
      i += 1
    }
    sum * h / 3
  }

  test("meridianArc series matches the defining integral to < 1 cm") {
    for (latDeg <- Seq(-80.0, -25.9, -15.0, -0.001, 10.0, 45.0, 70.0)) {
      val phi = math.toRadians(latDeg)
      assert(math.abs(meridianArc(phi) - meridianArcNumeric(phi)) < 0.01,
        s"meridian arc at $latDeg°")
    }
  }

  test("central-meridian anchors: x = FE exactly, y = k0·M + FN vs integral") {
    val p36s = utmZone(36, south = true)
    for (latDeg <- Seq(-25.9, -15.0, -11.0)) {
      val (x, y) = tmForward(33.0, latDeg, p36s)
      assert(math.abs(x - 500000.0) < 1e-6, "on-meridian easting is the false easting")
      val yWant = 0.9996 * meridianArcNumeric(math.toRadians(latDeg)) + 1e7
      assert(math.abs(y - yWant) < 0.01, s"northing at $latDeg°")
    }
    // northern-hemisphere zone: FN = 0, equator → (FE, 0)
    val (x0, y0) = tmForward(-75.0, 0.0, utmZone(18, south = false))
    assert(math.abs(x0 - 500000.0) < 1e-6 && math.abs(y0) < 1e-6)
  }

  test("scale factor on the central meridian equals k0") {
    val p = utmZone(36, south = true)
    val (_, y1) = tmForward(33.0, -15.0, p)
    val (_, y2) = tmForward(33.0, -15.0 + 1e-4, p)
    val arc = meridianArcNumeric(math.toRadians(-15.0 + 1e-4)) -
      meridianArcNumeric(math.toRadians(-15.0))
    assert(math.abs((y2 - y1) / arc - 0.9996) < 1e-7)
  }

  test("round-trip across the zone stays under 5e-9 degrees (~0.5 mm)") {
    // the e⁶/A⁶-truncated series round-trips to ~2e-9° at the ±3° zone
    // edge and <1e-9° inside — 3 orders under the 1e-6° ingest contract
    val p = utmZone(36, south = true)
    for {
      lon <- Seq(30.1, 31.5, 33.0, 34.7, 35.9)
      lat <- Seq(-26.5, -20.0, -15.0, -11.2, -0.5)
    } {
      val (x, y) = tmForward(lon, lat, p)
      val (lon2, lat2) = tmInverse(x, y, p)
      assert(math.abs(lon2 - lon) < 5e-9 && math.abs(lat2 - lat) < 5e-9,
        s"round-trip ($lon, $lat)")
    }
  }

  test("inverse puts UTM 36S coordinates in the right cell (coarse geo anchor)") {
    // Maputo is ~(32.57E, 25.97S): its UTM 36S easting must sit WEST of
    // the 500 km central-meridian easting, northing below 10 000 km FN
    val p = utmZone(36, south = true)
    val (x, y) = tmForward(32.57, -25.97, p)
    assert(x > 400000 && x < 500000)
    assert(y > 7000000 && y < 7200000) // ~25.97° of arc south of FN
    val (lon, lat) = tmInverse(x, y, p)
    assert(math.abs(lon - 32.57) < 1e-9 && math.abs(lat - -25.97) < 1e-9)
  }

  private val Utm36sWkt =
    """PROJCS["WGS 84 / UTM zone 36S",GEOGCS["WGS 84",DATUM["WGS_1984",
      |SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],
      |UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],
      |PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",33],
      |PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],
      |PARAMETER["false_northing",10000000],UNIT["metre",1]]""".stripMargin

  test("parsePrj: UTM PROJCS, GEOGCS identity, unsupported projection throws") {
    parsePrj(Utm36sWkt) match {
      case ProjectedTm(p) =>
        assert(p == TmParams(33.0, 0.0, 0.9996, 500000.0, 10000000.0))
      case other => fail(s"expected ProjectedTm, got $other")
    }
    assert(parsePrj("""GEOGCS["WGS 84",DATUM["WGS_1984"]]""") == Geographic)
    val err = intercept[IllegalArgumentException] {
      parsePrj("""PROJCS["x",GEOGCS["WGS 84"],PROJECTION["Lambert_Conformal_Conic_2SP"]]""")
    }
    assert(err.getMessage.contains("Lambert_Conformal_Conic_2SP"))
  }

  test("parsePrj defaults: missing parameters → 0, scale_factor → 1") {
    parsePrj("""PROJCS["p",GEOGCS["g"],PROJECTION["Transverse_Mercator"]]""") match {
      case ProjectedTm(p) => assert(p == TmParams(0.0, 0.0, 1.0, 0.0, 0.0))
      case other => fail(s"expected ProjectedTm, got $other")
    }
  }
}
