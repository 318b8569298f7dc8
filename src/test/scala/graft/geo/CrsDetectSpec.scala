package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import CrsDetect._

class CrsDetectSpec extends AnyFunSuite {

  test("forward/inverse transverse Mercator round-trips to sub-mm") {
    for {
      lon <- Seq(28.8, 29.5, 30.06, 30.9)
      lat <- Seq(-2.9, -1.95, -1.0)
      (lon0, ell) <- Seq((27.0, Wgs84), (33.0, Wgs84), (27.0, Clarke1880))
    } {
      val (e, n) = utmForward(lon, lat, lon0, ell)
      val (lon2, lat2) = utmInverse(e, n, lon0, ell)
      assert(math.abs(lon2 - lon) < 1e-8, s"lon $lon -> $lon2 (lon0=$lon0)")
      assert(math.abs(lat2 - lat) < 1e-8, s"lat $lat -> $lat2 (lon0=$lon0)")
    }
  }

  test("UTM coordinates land in plausible ranges") {
    // Kigali ~(30.06E, 1.95S) in zone 36S (lon0 33E): west of central meridian
    val (e36, n36) = utmForward(30.06, -1.95, 33.0, Wgs84)
    assert(e36 > 100000 && e36 < 500000)
    assert(n36 > 9700000 && n36 < 9900000)
  }

  test("detect: degrees in bounds -> 4326") {
    assert(detect(30.06, -1.95).contains(4326))
  }

  test("detect: projected UTM 35S coordinates -> 32735 (first matching candidate)") {
    val (e, n) = utmForward(29.5, -2.0, 27.0, Wgs84)
    assert(detect(e, n).contains(32735))
  }

  test("detect: projected UTM 36S coordinates -> 32736") {
    // zone-36 easting for west-of-meridian Rwanda is far from zone-35 range,
    // so 32735's inverse falls outside the bounds and 32736 matches
    val (e, n) = utmForward(30.5, -1.5, 33.0, Wgs84)
    assert(detect(e, n).contains(32736))
  }

  test("detect: nothing matches -> None (caller requires source_epsg)") {
    assert(detect(5000000.0, 5000000.0).isEmpty)
    // degrees but far outside Rwanda: not 4326, and no UTM candidate lands
    assert(detect(2.35, 48.85).isEmpty) // Paris lon/lat
  }

  // ---- .prj WKT parsing (the reference's CRS.from_wkt-first order) ----

  private val Wgs84GeogWkt =
    """GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",
      |SPHEROID["WGS_1984",6378137.0,298.257223563]],
      |PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""
      .stripMargin.replace("\n", "")

  private val Utm35SWkt =
    """PROJCS["WGS_1984_UTM_Zone_35S",GEOGCS["GCS_WGS_1984",
      |DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],
      |PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],
      |PROJECTION["Transverse_Mercator"],
      |PARAMETER["False_Easting",500000.0],
      |PARAMETER["False_Northing",10000000.0],
      |PARAMETER["Central_Meridian",27.0],
      |PARAMETER["Scale_Factor",0.9996],
      |PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]"""
      .stripMargin.replace("\n", "")

  test("fromPrjWkt: outermost AUTHORITY wins verbatim") {
    val wkt = """PROJCS["WGS 84 / UTM zone 36S",GEOGCS["WGS 84",
      |DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563,
      |AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],
      |PRIMEM["Greenwich",0],UNIT["degree",0.01745329251994328],
      |AUTHORITY["EPSG","4326"]],PROJECTION["Transverse_Mercator"],
      |PARAMETER["central_meridian",33],PARAMETER["false_northing",10000000],
      |UNIT["metre",1],AUTHORITY["EPSG","32736"]]"""
      .stripMargin.replace("\n", "")
    assert(fromPrjWkt(wkt).contains(32736))
    // the INNER GEOGCS authority (4326) must NOT be mistaken for the root:
    // strip the outer authority and the parameters still resolve 32736
    val inner = wkt.replace(",AUTHORITY[\"EPSG\",\"32736\"]", "")
    assert(fromPrjWkt(inner).contains(32736))
  }

  test("fromPrjWkt: ESRI-style WKT without authorities, both zones + WGS84") {
    assert(fromPrjWkt(Utm35SWkt).contains(32735))
    assert(fromPrjWkt(Utm35SWkt.replace("35S", "36S").replace("27.0]", "33.0]"))
      .contains(32736))
    assert(fromPrjWkt(Wgs84GeogWkt).contains(4326))
  }

  test("fromPrjWkt: WKT2 dialect — PROJCRS/GEOGCRS roots, ID nodes, long parameter names") {
    // QGIS-style WKT2 with a trailing ID node
    val wkt2 = """PROJCRS["WGS 84 / UTM zone 35S",
      |BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",
      |ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
      |PRIMEM["Greenwich",0],ID["EPSG",4326]],
      |CONVERSION["UTM zone 35S",METHOD["Transverse Mercator",ID["EPSG",9807]],
      |PARAMETER["Longitude of natural origin",27,ANGLEUNIT["degree",0.0174532925199433]],
      |PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1]],
      |PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],
      |PARAMETER["False northing",10000000,LENGTHUNIT["metre",1]]],
      |CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],
      |LENGTHUNIT["metre",1],ID["EPSG",32735]]"""
      .stripMargin.replace("\n", "")
    assert(fromPrjWkt(wkt2).contains(32735))
    // same WKT2 without the outer ID: parameters resolve it (long
    // parameter-name spelling, WKT2 unit nodes after the value)
    val noId = wkt2.replace(",ID[\"EPSG\",32735]", "")
    assert(fromPrjWkt(noId).contains(32735))
    // WKT2 geographic root
    assert(fromPrjWkt(
      """GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",
        |ELLIPSOID["WGS 84",6378137,298.257223563]],
        |PRIMEM["Greenwich",0],CS[ellipsoidal,2]]"""
        .stripMargin.replace("\n", "")).contains(4326))
  }

  test("fromPrjWkt: Arc datums select the 209xx/263xx candidates") {
    val arc50 = Utm35SWkt
      .replace("WGS_1984_UTM_Zone_35S", "Arc_1950_UTM_Zone_35S")
      .replace("GCS_WGS_1984", "GCS_Arc_1950")
      .replace("D_WGS_1984", "D_Arc_1950")
      .replace("SPHEROID[\"WGS_1984\",6378137.0,298.257223563]",
        "SPHEROID[\"Clarke_1880_Arc\",6378249.145,293.466307656]")
    assert(fromPrjWkt(arc50).contains(20935))
    val arc60z36 = arc50.replace("1950", "1960")
      .replace("Central_Meridian\",27.0", "Central_Meridian\",33.0")
    assert(fromPrjWkt(arc60z36).contains(26336))
  }

  test("fromPrjWkt: garbage, unknown CRSes and northern zones -> None (probe fallback)") {
    assert(fromPrjWkt(null).isEmpty)
    assert(fromPrjWkt("").isEmpty)
    assert(fromPrjWkt("this is not wkt at all").isEmpty)
    // recognizable structure, unrecognized datum: no guess
    assert(fromPrjWkt(Utm35SWkt.replace("WGS_1984", "Unknown_Datum")
      .replace("GCS_WGS_1984", "GCS_X").replace("D_WGS_1984", "D_X")).isEmpty)
    // a NORTHERN UTM zone (false_northing 0) is outside the candidate set
    assert(fromPrjWkt(Utm35SWkt.replace("_35S", "_35N")
      .replace("PARAMETER[\"False_Northing\",10000000.0]",
        "PARAMETER[\"False_Northing\",0.0]")).isEmpty)
    // an out-of-candidate outermost authority: None, never a blind pass
    assert(fromPrjWkt(
      "PROJCS[\"UTM 12N\",PROJECTION[\"Transverse_Mercator\"],AUTHORITY[\"EPSG\",\"32612\"]]")
      .isEmpty)
    // a 10000000 appearing OUTSIDE False_Northing (here a false easting,
    // northing 0 = northern zone) must NOT classify the WKT as southern —
    // the hemisphere test anchors to the False_Northing parameter value
    assert(fromPrjWkt(Utm35SWkt.replace("_35S", "_35N")
      .replace("PARAMETER[\"False_Easting\",500000.0]",
        "PARAMETER[\"False_Easting\",10000000.0]")
      .replace("PARAMETER[\"False_Northing\",10000000.0]",
        "PARAMETER[\"False_Northing\",0.0]")).isEmpty)
  }
}
