package graft.geo

/** F21 CRS auto-detection parity (geoJson_slope_etl_view.py:36-44,
  * 312-354): probe a sample coordinate against candidate projections and
  * accept the first whose inverse lands inside Rwanda's bounds. The
  * reference delegates to pyproj; offline we carry a self-contained
  * transverse-Mercator inverse (Snyder series) — for bounds-probing the
  * sub-meter datum differences between WGS84 and the Arc datums are
  * irrelevant, but the correct ellipsoids are used anyway.
  *
  * The `sourceEpsg` override parameter survives in the API (SURVEY.md
  * §7.4: near-boundary data can mis-detect).
  */
object CrsDetect {

  val RwandaLonMin = 28.6; val RwandaLonMax = 31.0
  val RwandaLatMin = -3.1; val RwandaLatMax = -0.8

  final case class Ellipsoid(a: Double, f: Double)
  val Wgs84: Ellipsoid = Ellipsoid(6378137.0, 1 / 298.257223563)
  val Clarke1880: Ellipsoid = Ellipsoid(6378249.145, 1 / 293.465)

  /** UTM parameters per candidate EPSG (southern zones 35/36). */
  final case class Utm(epsg: Int, lon0Deg: Double, ell: Ellipsoid)
  val candidates: Seq[Utm] = Seq(
    Utm(32735, 27.0, Wgs84), Utm(32736, 33.0, Wgs84),
    Utm(20935, 27.0, Clarke1880), Utm(20936, 33.0, Clarke1880),
    Utm(26335, 27.0, Clarke1880), Utm(26336, 33.0, Clarke1880))

  private val K0 = 0.9996
  private val FalseEasting = 500000.0
  private val FalseNorthingSouth = 10000000.0

  /** Inverse transverse Mercator (southern-hemisphere UTM) → (lon, lat) degrees. */
  def utmInverse(easting: Double, northing: Double, lon0Deg: Double,
      ell: Ellipsoid): (Double, Double) = {
    import math._
    val a = ell.a; val f = ell.f
    val e2 = f * (2 - f)
    val ep2 = e2 / (1 - e2)
    val m = (northing - FalseNorthingSouth) / K0
    val mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
    val e1 = (1 - sqrt(1 - e2)) / (1 + sqrt(1 - e2))
    val phi1 = mu +
      (3 * e1 / 2 - 27 * pow(e1, 3) / 32) * sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * pow(e1, 4) / 32) * sin(4 * mu) +
      (151 * pow(e1, 3) / 96) * sin(6 * mu) +
      (1097 * pow(e1, 4) / 512) * sin(8 * mu)
    val sinP = sin(phi1); val cosP = cos(phi1); val tanP = tan(phi1)
    val c1 = ep2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = a / sqrt(1 - e2 * sinP * sinP)
    val r1 = a * (1 - e2) / pow(1 - e2 * sinP * sinP, 1.5)
    val d = (easting - FalseEasting) / (n1 * K0)
    val lat = phi1 - (n1 * tanP / r1) * (
      d * d / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * pow(d, 4) / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * pow(d, 6) / 720)
    val lon = toRadians(lon0Deg) + (
      d - (1 + 2 * t1 + c1) * pow(d, 3) / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * pow(d, 5) / 120) / cosP
    (toDegrees(lon), toDegrees(lat))
  }

  /** Forward transverse Mercator (for tests/round-trips). */
  def utmForward(lonDeg: Double, latDeg: Double, lon0Deg: Double,
      ell: Ellipsoid): (Double, Double) = {
    import math._
    val a = ell.a; val f = ell.f
    val e2 = f * (2 - f)
    val ep2 = e2 / (1 - e2)
    val phi = toRadians(latDeg)
    val lam = toRadians(lonDeg); val lam0 = toRadians(lon0Deg)
    val sinP = sin(phi); val cosP = cos(phi); val tanP = tan(phi)
    val n = a / sqrt(1 - e2 * sinP * sinP)
    val t = tanP * tanP
    val c = ep2 * cosP * cosP
    val bigA = (lam - lam0) * cosP
    val m = a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * pow(e2, 3) / 256) * phi -
      (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * pow(e2, 3) / 1024) * sin(2 * phi) +
      (15 * e2 * e2 / 256 + 45 * pow(e2, 3) / 1024) * sin(4 * phi) -
      (35 * pow(e2, 3) / 3072) * sin(6 * phi))
    val x = K0 * n * (bigA + (1 - t + c) * pow(bigA, 3) / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * ep2) * pow(bigA, 5) / 120) + FalseEasting
    val y = K0 * (m + n * tanP * (bigA * bigA / 2 +
      (5 - t + 9 * c + 4 * c * c) * pow(bigA, 4) / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * ep2) * pow(bigA, 6) / 720)) + FalseNorthingSouth
    (x, y)
  }

  def looksLikeDegrees(x: Double, y: Double): Boolean =
    x >= -180 && x <= 180 && y >= -90 && y <= 90

  def inRwandaBounds(lon: Double, lat: Double): Boolean =
    lon >= RwandaLonMin && lon <= RwandaLonMax &&
      lat >= RwandaLatMin && lat <= RwandaLatMax

  /** `_pick_source_epsg` parity: 4326 when the sample already looks like
    * in-bounds degrees, else the first candidate whose inverse lands in
    * Rwanda; None when nothing matches (caller should require
    * `sourceEpsg`).
    */
  def detect(sampleX: Double, sampleY: Double): Option[Int] = {
    if (looksLikeDegrees(sampleX, sampleY) && inRwandaBounds(sampleX, sampleY))
      Some(4326)
    else candidates.collectFirst {
      case u if {
        val (lon, lat) = utmInverse(sampleX, sampleY, u.lon0Deg, u.ell)
        inRwandaBounds(lon, lat)
      } => u.epsg
    }
  }

  // WKT1 writes AUTHORITY["EPSG","32735"]; WKT2 writes ID["EPSG",32735]
  // — one alternation covers both (codes quoted or bare)
  private val AuthorityRe =
    "(?:AUTHORITY|ID)\\s*\\[\\s*\"EPSG\"\\s*,\\s*\"?(\\d+)\"?\\s*\\]".r
  // WKT2 parameter values may carry a trailing unit node before ']' —
  // stop at the number, don't require the bracket
  private val CentralMeridianRe =
    "PARAMETER\\s*\\[\\s*\"(?:CENTRAL_MERIDIAN|LONGITUDE OF NATURAL ORIGIN)\"\\s*,\\s*(-?\\d+(?:\\.\\d+)?)".r
  private val UtmZoneNameRe = "UTM\\s*[_ ]?ZONE[_ ]?(3[56])\\s*S".r
  // Southern-hemisphere marker must be the FALSE_NORTHING parameter's own
  // value — a bare substring test would misfire on any other 10000000 in
  // the WKT (a 10000000 false easting, a remark)
  private val FalseNorthingRe =
    "PARAMETER\\s*\\[\\s*\"(?:FALSE_NORTHING|FALSE NORTHING)\"\\s*,\\s*(-?\\d+(?:\\.\\d+)?)".r

  /** `.prj` sidecar WKT → EPSG, the reference's
    * `_detect_shapefile_crs` step (SlopeGeoJsonUploadView.py:157-162:
    * `CRS.from_wkt` BEFORE any probing — pyproj accepts WKT1 and WKT2;
    * both dialects parse here: AUTHORITY/ID nodes, PROJCS/PROJCRS and
    * GEOGCS/GEOGCRS roots, Central_Meridian / "Longitude of natural
    * origin" parameter spellings). Recognizes exactly the reference's
    * candidate space — WGS84 geographic plus the six southern-UTM
    * candidates — and returns None on anything else or on garbage, so
    * callers fall back to the probe ladder / `sourceEpsg`.
    *
    * Resolution order: (1) the OUTERMOST `AUTHORITY["EPSG",n]` node
    * (outermost = only `]`/`,`/whitespace follow it in well-formed WKT1)
    * wins verbatim; (2) otherwise the datum + central-meridian (or
    * UTM-zone name) pair selects a candidate — WGS84→327xx,
    * Arc 1950→209xx, Arc 1960→263xx, zone 35S↔27°E / 36S↔33°E; bare
    * GEOGCS with a WGS84 datum → 4326. Northern-zone or unrecognized
    * datums return None rather than guess.
    */
  def fromPrjWkt(wkt0: String): Option[Int] = {
    val wkt = Option(wkt0).getOrElse("").trim
    if (wkt.isEmpty) return None
    val up = wkt.toUpperCase
    // WKT1 roots PROJCS/GEOGCS; WKT2 roots PROJCRS/GEOGCRS (and the
    // 2015-draft PROJECTEDCRS/GEODCRS spellings)
    val isProj = up.startsWith("PROJCS") || up.startsWith("PROJCRS") ||
      up.startsWith("PROJECTEDCRS")
    val isGeog = up.startsWith("GEOGCS") || up.startsWith("GEOGCRS") ||
      up.startsWith("GEODCRS")
    if (!isProj && !isGeog) return None

    // (1) an explicit outermost authority node
    val outermost = AuthorityRe.findAllMatchIn(up).toSeq.lastOption.filter { m =>
      up.substring(m.end).forall(c => c == ']' || c == ',' || c.isWhitespace)
    }
    outermost match {
      case Some(m) =>
        val code = m.group(1).toInt
        if (code == 4326 || candidates.exists(_.epsg == code)) Some(code)
        else None
      case None if isGeog =>
        if (up.contains("WGS")) Some(4326) else None
      case None =>
        // (2) datum + zone from the parameters / the PROJCS name
        val zone: Option[Int] =
          CentralMeridianRe.findFirstMatchIn(up).map(_.group(1).toDouble) match {
            case Some(27.0) => Some(35)
            case Some(33.0) => Some(36)
            case Some(_) => None
            case None => UtmZoneNameRe.findFirstMatchIn(up).map(_.group(1).toInt)
          }
        // southern hemisphere required (all candidates are ...S) —
        // anchored to the FALSE_NORTHING value itself, never a substring
        val southern =
          FalseNorthingRe.findFirstMatchIn(up)
            .exists(_.group(1).toDouble == 10000000.0) ||
          UtmZoneNameRe.findFirstMatchIn(up).isDefined
        val datumBase: Option[Int] =
          if (up.contains("ARC_1950") || up.contains("ARC 1950")) Some(20900)
          else if (up.contains("ARC_1960") || up.contains("ARC 1960")) Some(26300)
          else if (up.contains("WGS")) Some(32700)
          else None
        for {
          z <- zone if southern
          base <- datumBase
          epsg = base + z
          u <- candidates.find(_.epsg == epsg)
        } yield u.epsg
    }
  }
}
