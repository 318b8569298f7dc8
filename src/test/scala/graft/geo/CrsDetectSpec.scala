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
}
