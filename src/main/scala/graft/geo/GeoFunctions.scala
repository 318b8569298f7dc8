package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geometry operations over a GeoJSON-shaped polygon encoding:
  * `array<array<array<double>>>` = rings → points → [lon, lat]
  * (ring 0 = exterior, others = holes), mirroring the reference's
  * GeoJSON-dict processing (SURVEY.md §2.3 F20-F21, §2.5 J3-J5).
  *
  * Everything here is pure `Column` composition over higher-order
  * functions — geometry stays columnar, no UDF/JVM-object round trip.
  * Lambdas only reference their own variables (see TextFunctions.shingles
  * for why that matters).
  */
object GeoFunctions {

  /** F20 vertex-mean centroid of the exterior ring — deliberately the
    * reference's *vertex average*, not a true area centroid
    * (village_admin_boundaries_etl_view.py:299-321), preserved for parity.
    * Returns struct(lon, lat).
    */
  def stCentroidVertexMean(geom: Column): Column = {
    val ring = element_at(geom, 1)
    val n = size(ring)
    val sx = aggregate(ring, lit(0.0), (acc, p) => acc + element_at(p, 1))
    val sy = aggregate(ring, lit(0.0), (acc, p) => acc + element_at(p, 2))
    struct((sx / n).as("lon"), (sy / n).as("lat"))
  }

  /** Bounding envelope struct(minx, miny, maxx, maxy) of the exterior ring. */
  def stEnvelope(geom: Column): Column = {
    val ring = element_at(geom, 1)
    struct(
      array_min(transform(ring, p => element_at(p, 1))).as("minx"),
      array_min(transform(ring, p => element_at(p, 2))).as("miny"),
      array_max(transform(ring, p => element_at(p, 1))).as("maxx"),
      array_max(transform(ring, p => element_at(p, 2))).as("maxy"))
  }

  /** P6 envelope-overlap prefilter — plain range predicates, so Catalyst
    * can push/reorder them like any other comparison (the reference's
    * `prep(bbox).intersects` fast path).
    */
  def stEnvelopeIntersects(a: Column, b: Column): Column =
    a.getField("minx") <= b.getField("maxx") && b.getField("minx") <= a.getField("maxx") &&
      a.getField("miny") <= b.getField("maxy") && b.getField("miny") <= a.getField("maxy")

  /** J4/A13 point-in-polygon (even-odd ray casting over every ring, holes
    * subtract). Edge walk is a fold over zipped consecutive vertex pairs.
    */
  def stContainsPoint(geom: Column, x: Column, y: Column): Column = {
    val crossingsPerRing = transform(geom, ring => {
      // consecutive vertex pairs (p[i], p[i+1]); GeoJSON rings repeat the
      // first vertex last, so no wrap-around pair is needed
      val pairs = arrays_zip(
        slice(ring, lit(1), size(ring) - 1),
        slice(ring, lit(2), size(ring) - 1))
      size(filter(pairs, pr => {
        val x1 = element_at(pr.getField("0"), 1)
        val y1 = element_at(pr.getField("0"), 2)
        val x2 = element_at(pr.getField("1"), 1)
        val y2 = element_at(pr.getField("1"), 2)
        // edge straddles the horizontal line through y, and the
        // intersection is strictly right of x
        ((y1 > y) =!= (y2 > y)) &&
          (x < (x2 - x1) * (y - y1) / (y2 - y1) + x1)
      }))
    })
    aggregate(crossingsPerRing, lit(0), (acc, c) => acc + c) % 2 === 1
  }

  /** P7 geometry validity filter: every ring closed (first == last point)
    * with at least 4 points, and a non-degenerate exterior. The reference
    * repairs with shapely `buffer(0)` or skips; parity only needs
    * skip-invalid (SURVEY.md §2.2 P7).
    */
  def stIsValidPolygon(geom: Column): Column = {
    val ringsOk = forall(geom, ring =>
      size(ring) >= 4 &&
        element_at(ring, 1) === element_at(ring, size(ring)))
    size(geom) >= 1 && ringsOk && ringArea(element_at(geom, 1)) > 0
  }

  /** Shoelace area of a ring (absolute value). */
  def ringArea(ring: Column): Column = {
    val pairs = arrays_zip(
      slice(ring, lit(1), size(ring) - 1),
      slice(ring, lit(2), size(ring) - 1))
    abs(aggregate(pairs, lit(0.0), (acc, pr) => {
      val x1 = element_at(pr.getField("0"), 1)
      val y1 = element_at(pr.getField("0"), 2)
      val x2 = element_at(pr.getField("1"), 1)
      val y2 = element_at(pr.getField("1"), 2)
      acc + (x1 * y2 - x2 * y1)
    }) / 2)
  }

  /** Polygon area: exterior ring minus holes. */
  def stArea(geom: Column): Column = {
    val areas = transform(geom, ringArea(_))
    element_at(areas, 1) -
      aggregate(slice(areas, lit(2), greatest(size(areas) - 1, lit(0))),
        lit(0.0), (acc, a) => acc + a)
  }

  /** J3: area of polygon ∩ axis-aligned rectangle via Sutherland–Hodgman
    * clipping of the exterior ring against the 4 half-planes, then
    * shoelace. This is the reference's bbox-extraction intersection
    * (geoJson_slope_etl_view.py:457-555) — rectangle clip only, like the
    * reference's use (its bboxes are axis-aligned).
    */
  def stRectIntersectionArea(geom: Column,
      minx: Column, miny: Column, maxx: Column, maxy: Column): Column =
    // Sutherland–Hodgman clipping rebuilds the ring per half-plane, which
    // doesn't fit pure higher-order functions (the vertex list mutates per
    // edge) — this is the one op implemented as a native Catalyst
    // Expression; see [[GeoClip]] / [[RectClipArea]].
    GeoClip.rectIntersectionArea(geom, minx, miny, maxx, maxy)
}
