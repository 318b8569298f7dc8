package graft.queries

import org.apache.spark.sql.functions._
import graft.geo.{GeoClip, GeoFunctions}
import Qx._

/** Geospatial operator coverage without geo testdata: deterministic
  * geometries are derived from the star-schema tables in both engines.
  * Containment/clipping semantics come from the graft geo layer; the
  * DuckDB mirrors use the equivalent closed-form predicates (rectangle
  * containment = range predicates; axis-aligned clip area = interval
  * overlap product), which independently validates the geometry code.
  */
object GeoQueries {

  val all: Seq[Q] = Seq(

    // ---- A13/J5 zonal statistics: points-in-polygon tag + aggregate -------
    // Points from events (x = value mod 20, y = user_id mod 20); zones are a
    // 2x2 grid of 10x10 rectangle polygons. Ray-casting on rectangles gives
    // half-open [min, max) containment — mirrored as range predicates.
    Q("q45_zonal_stats",
      (s, dir) => {
        val e = t(s, dir, "events")
        val pts = e.select(
          (col("value") % 20.0).as("x"),
          (col("user_id") % 20).cast("double").as("y"),
          col("value").as("v"))
        val zones = s.createDataFrame(Seq(
          ("sw", 0.0, 0.0), ("se", 10.0, 0.0), ("nw", 0.0, 10.0), ("ne", 10.0, 10.0)))
          .toDF("zone", "x0", "y0")
          .select(col("zone"),
            array(array(
              array(col("x0"), col("y0")),
              array(col("x0") + 10.0, col("y0")),
              array(col("x0") + 10.0, col("y0") + 10.0),
              array(col("x0"), col("y0") + 10.0),
              array(col("x0"), col("y0")))).as("geom"))
        // envelope prefilter before the exact ray cast (the reference's
        // prep(bbox) fast path): the range predicates are cheap codegen'd
        // comparisons and AND short-circuits, so the native ray-cast
        // expression only evaluates for envelope survivors
        graft.geo.ContainsPoint.register(s)
        val zonesEnv = zones.withColumn("env", GeoFunctions.stEnvelope(col("geom")))
        pts.join(broadcast(zonesEnv),
          col("x") >= col("env.minx") && col("x") <= col("env.maxx") &&
            col("y") >= col("env.miny") && col("y") <= col("env.maxy") &&
            graft.geo.ContainsPoint(col("geom"), col("x"), col("y")))
          .groupBy("zone")
          .agg(count(lit(1)).as("points"),
            dbl(sum(d12(col("v")))).as("sum_value"),
            min("v").as("min_value"),
            max("v").as("max_value"))
          .orderBy("zone")
      },
      Some("""
        WITH pts AS (
          SELECT value % 20.0 AS x, CAST(user_id % 20 AS DOUBLE) AS y, value AS v
          FROM events),
        zones AS (
          SELECT * FROM (VALUES
            ('sw', 0.0, 0.0), ('se', 10.0, 0.0), ('nw', 0.0, 10.0), ('ne', 10.0, 10.0))
            AS z(zone, x0, y0))
        SELECT zone, COUNT(*) AS points,
          CAST(SUM(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
          MIN(v) AS min_value, MAX(v) AS max_value
        FROM pts JOIN zones
          ON x >= x0 AND x < x0 + 10.0 AND y >= y0 AND y < y0 + 10.0
        GROUP BY 1 ORDER BY 1""")),

    // ---- J3 bbox intersection via the custom Catalyst expression ----------
    // Axis-aligned squares derived from nation keys, clipped to a fixed
    // bbox; the oracle checks the Sutherland-Hodgman + shoelace result
    // against the closed-form interval-overlap product.
    Q("q46_rect_clip_area",
      (s, dir) => {
        GeoClip.register(s)
        val n = t(s, dir, "nation")
        val cx = (col("n_nationkey") % 5).cast("double") * 2.0
        val cy = expr("n_nationkey div 5").cast("double") * 2.0
        val geom = array(array(
          array(cx - 1.5, cy - 1.5), array(cx + 1.5, cy - 1.5),
          array(cx + 1.5, cy + 1.5), array(cx - 1.5, cy + 1.5),
          array(cx - 1.5, cy - 1.5)))
        n.select(col("n_nationkey"),
          GeoFunctions.stRectIntersectionArea(geom,
            lit(2.0), lit(2.0), lit(8.0), lit(8.0)).as("clip_area"))
          .orderBy("n_nationkey")
      },
      Some("""
        WITH sq AS (
          SELECT n_nationkey,
            CAST(n_nationkey % 5 AS DOUBLE) * 2.0 AS cx,
            CAST(n_nationkey // 5 AS DOUBLE) * 2.0 AS cy
          FROM nation)
        SELECT n_nationkey,
          greatest(0.0, least(8.0, cx + 1.5) - greatest(2.0, cx - 1.5)) *
          greatest(0.0, least(8.0, cy + 1.5) - greatest(2.0, cy - 1.5)) AS clip_area
        FROM sq ORDER BY 1""")),

    // ---- F20/A12: centroid + envelope + area over derived polygons --------
    Q("q47_geometry_stats",
      (s, dir) => {
        val n = t(s, dir, "nation")
        val cx = (col("n_nationkey") % 5).cast("double") * 2.0
        val cy = expr("n_nationkey div 5").cast("double") * 2.0
        val geom = array(array(
          array(cx - 1.5, cy - 1.5), array(cx + 1.5, cy - 1.5),
          array(cx + 1.5, cy + 1.5), array(cx - 1.5, cy + 1.5),
          array(cx - 1.5, cy - 1.5)))
        val withGeom = n.select(col("n_nationkey"), col("n_regionkey"), geom.as("geom"))
        withGeom.select(col("n_regionkey"),
          GeoFunctions.stArea(col("geom")).as("area"),
          GeoFunctions.stCentroidVertexMean(col("geom")).getField("lon").as("c_lon"),
          GeoFunctions.stEnvelope(col("geom")).getField("maxx").as("maxx"))
          .groupBy("n_regionkey")
          .agg(count(lit(1)).as("polys"),
            dbl(sum(d12(col("area")))).as("total_area"),
            dbl(sum(d12(col("c_lon")))).as("sum_c_lon"),
            max("maxx").as("max_maxx"))
          .orderBy("n_regionkey")
      },
      Some("""
        WITH sq AS (
          SELECT n_nationkey, n_regionkey,
            CAST(n_nationkey % 5 AS DOUBLE) * 2.0 AS cx,
            CAST(n_nationkey // 5 AS DOUBLE) * 2.0 AS cy
          FROM nation),
        g AS (
          SELECT n_regionkey,
            9.0 AS area,
            -- vertex mean over the 5 ring vertices (closing vertex repeated)
            (5 * cx - 1.5) / 5 AS c_lon,
            cx + 1.5 AS maxx
          FROM sq)
        SELECT n_regionkey, COUNT(*) AS polys,
          CAST(SUM(CAST(area AS DECIMAL(12,2))) AS DOUBLE) AS total_area,
          CAST(SUM(CAST(c_lon AS DECIMAL(12,2))) AS DOUBLE) AS sum_c_lon,
          MAX(maxx) AS max_maxx
        FROM g GROUP BY 1 ORDER BY 1"""))
  )
}
