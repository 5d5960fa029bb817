package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** F15 — general CRS reprojection (reference reprojects every source
  * shapefile with `ogr2ogr -t_srs EPSG:4326`, `scripts/base-network.sh:98-99`,
  * and pyproj for raster CRS, `scripts/imgstats/img-stats.py:60-73`).
  *
  * Implements the ellipsoidal transverse-Mercator forward/inverse series
  * (Snyder 1987, USGS Professional Paper 1395, eqs. 3-21, 8-9..8-17 and
  * 8-18..8-25 — the same truncated Krüger series PROJ's `tmerc` uses) on
  * the WGS-84 ellipsoid. That covers every UTM zone — in particular
  * 36S/37S, the zones real Mozambique shapefiles ship in — plus any
  * custom `Transverse_Mercator` PROJCS. Series accuracy inside a UTM
  * zone's ±3° is sub-millimetre, far inside the 1e-6° (~0.1 m) contract.
  *
  * The `.prj` sidecar (OGC WKT) is parsed by [[Crs.parsePrj]]:
  * `GEOGCS`-only means already-geographic (identity), a
  * `Transverse_Mercator` PROJCS yields its [[TmParams]], and any OTHER
  * projection throws — a loud failure at ingest beats silently keeping
  * projected metres as "degrees".
  *
  * Scale shape: pure per-row scalar math (no state, no shuffle), applied
  * inside the Shapefile reader's per-file flatMap or as a UDF column.
  */
object Crs {

  /** WGS-84 defining parameters (public EPSG:4326 / NGA definition). */
  val A = 6378137.0
  val F = 1.0 / 298.257223563
  val E2 = F * (2.0 - F) // first eccentricity squared
  val Ep2 = E2 / (1.0 - E2) // second eccentricity squared

  /** Transverse-Mercator projection parameters (the PARAMETER entries of
    * a `Transverse_Mercator` PROJCS, all in degrees/metres).
    */
  case class TmParams(
      centralMeridianDeg: Double,
      latitudeOfOriginDeg: Double,
      scaleFactor: Double,
      falseEasting: Double,
      falseNorthing: Double)

  /** Standard UTM zone parameters: lon0 = zone·6 − 183, k0 = 0.9996,
    * FE = 500 000, FN = 10 000 000 for the southern hemisphere.
    */
  def utmZone(zone: Int, south: Boolean): TmParams = {
    require(zone >= 1 && zone <= 60, s"UTM zone must be 1..60, got $zone")
    TmParams(zone * 6.0 - 183.0, 0.0, 0.9996, 500000.0, if (south) 10000000.0 else 0.0)
  }

  /** Meridian arc length from the equator to latitude `phi` (radians):
    * Snyder eq. 3-21, the e⁶ truncation.
    */
  def meridianArc(phi: Double): Double = {
    val e2 = E2; val e4 = e2 * e2; val e6 = e4 * e2
    A * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
      - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
      + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
      - (35 * e6 / 3072) * math.sin(6 * phi))
  }

  /** Forward transverse Mercator: lon/lat degrees → projected (x, y)
    * metres (Snyder eqs. 8-9..8-17).
    */
  def tmForward(lonDeg: Double, latDeg: Double, p: TmParams): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val lam0 = math.toRadians(p.centralMeridianDeg)
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = A / math.sqrt(1 - E2 * sinP * sinP)
    val t = tanP * tanP
    val c = Ep2 * cosP * cosP
    val a1 = (lam - lam0) * cosP
    val m = meridianArc(phi)
    val m0 = meridianArc(math.toRadians(p.latitudeOfOriginDeg))
    val a2 = a1 * a1; val a3 = a2 * a1; val a4 = a3 * a1; val a5 = a4 * a1; val a6 = a5 * a1
    val x = p.scaleFactor * n * (a1 + (1 - t + c) * a3 / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * Ep2) * a5 / 120) + p.falseEasting
    val y = p.scaleFactor * (m - m0 + n * tanP * (a2 / 2 +
      (5 - t + 9 * c + 4 * c * c) * a4 / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * Ep2) * a6 / 720)) + p.falseNorthing
    (x, y)
  }

  /** Inverse transverse Mercator: projected (x, y) metres → lon/lat
    * degrees (Snyder eqs. 8-18..8-25, footpoint-latitude form).
    */
  def tmInverse(x: Double, y: Double, p: TmParams): (Double, Double) = {
    val m0 = meridianArc(math.toRadians(p.latitudeOfOriginDeg))
    val m = m0 + (y - p.falseNorthing) / p.scaleFactor
    val e2 = E2; val e4 = e2 * e2; val e6 = e4 * e2
    val mu = m / (A * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    val sq = math.sqrt(1 - e2)
    val e1 = (1 - sq) / (1 + sq)
    val e1_2 = e1 * e1; val e1_3 = e1_2 * e1; val e1_4 = e1_3 * e1
    val phi1 = mu + (3 * e1 / 2 - 27 * e1_3 / 32) * math.sin(2 * mu) +
      (21 * e1_2 / 16 - 55 * e1_4 / 32) * math.sin(4 * mu) +
      (151 * e1_3 / 96) * math.sin(6 * mu) +
      (1097 * e1_4 / 512) * math.sin(8 * mu)
    val sinP1 = math.sin(phi1); val cosP1 = math.cos(phi1); val tanP1 = math.tan(phi1)
    val c1 = Ep2 * cosP1 * cosP1
    val t1 = tanP1 * tanP1
    val oneMinus = 1 - e2 * sinP1 * sinP1
    val n1 = A / math.sqrt(oneMinus)
    val r1 = A * (1 - e2) / (oneMinus * math.sqrt(oneMinus))
    val d = (x - p.falseEasting) / (n1 * p.scaleFactor)
    val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d; val d5 = d4 * d; val d6 = d5 * d
    val phi = phi1 - (n1 * tanP1 / r1) * (d2 / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * Ep2) * d4 / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * Ep2 - 3 * c1 * c1) * d6 / 720)
    val lam = math.toRadians(p.centralMeridianDeg) + (d - (1 + 2 * t1 + c1) * d3 / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * Ep2 + 24 * t1 * t1) * d5 / 120) / cosP1
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  /** The CRS transform a parsed `.prj` implies for reader-side
    * normalization to EPSG:4326.
    */
  sealed trait PrjCrs
  /** Already geographic lon/lat (GEOGCS-only .prj) — identity. */
  case object Geographic extends PrjCrs
  /** Projected transverse Mercator — apply [[tmInverse]] on ingest. */
  final case class ProjectedTm(params: TmParams) extends PrjCrs

  private val ParamRe =
    """(?i)PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-+0-9.eE]+)\s*\]""".r
  private val ProjectionRe = """(?i)PROJECTION\s*\[\s*"([^"]+)"""".r

  /** Parse an ESRI/OGC WKT `.prj`. GEOGCS-only → [[Geographic]];
    * `Transverse_Mercator` PROJCS → [[ProjectedTm]] with its parameters
    * (missing parameters default per the WKT spec: 0 except
    * scale_factor = 1); anything else throws `IllegalArgumentException`.
    */
  def parsePrj(wkt: String): PrjCrs = {
    val s = wkt.trim
    if (s.isEmpty || s.regionMatches(true, 0, "GEOGCS", 0, 6)) Geographic
    else if (s.regionMatches(true, 0, "PROJCS", 0, 6)) {
      val proj = ProjectionRe.findFirstMatchIn(s).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"PROJCS without PROJECTION in .prj: ${s.take(80)}"))
      if (!proj.equalsIgnoreCase("Transverse_Mercator") &&
          !proj.equalsIgnoreCase("Gauss_Kruger"))
        throw new IllegalArgumentException(
          s"unsupported PROJECTION '$proj' in .prj (supported: Transverse_Mercator; " +
            "reproject externally or extend Crs)")
      val params = ParamRe.findAllMatchIn(s)
        .map(m => m.group(1).toLowerCase -> m.group(2).toDouble).toMap
      ProjectedTm(TmParams(
        centralMeridianDeg = params.getOrElse("central_meridian", 0.0),
        latitudeOfOriginDeg = params.getOrElse("latitude_of_origin", 0.0),
        scaleFactor = params.getOrElse("scale_factor", 1.0),
        falseEasting = params.getOrElse("false_easting", 0.0),
        falseNorthing = params.getOrElse("false_northing", 0.0)))
    } else throw new IllegalArgumentException(
      s"unrecognized .prj WKT root (expected GEOGCS or PROJCS): ${s.take(80)}")
  }

  /** UDF form: project UTM (x, y) metres to [lon, lat] degrees. */
  def utmToLonLatUdf(zone: Int, south: Boolean): UserDefinedFunction = {
    val p = utmZone(zone, south)
    udf { (x: Double, y: Double) =>
      val (lon, lat) = tmInverse(x, y, p); Seq(lon, lat)
    }
  }

  /** UDF form: [lon, lat] degrees to UTM (x, y) metres. */
  def lonLatToUtmUdf(zone: Int, south: Boolean): UserDefinedFunction = {
    val p = utmZone(zone, south)
    udf { (lon: Double, lat: Double) =>
      val (x, y) = tmForward(lon, lat, p); Seq(x, y)
    }
  }
}
