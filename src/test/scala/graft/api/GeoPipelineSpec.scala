package graft.api

import graft.SparkSpec

class GeoPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double) =
    Seq(Seq(Seq(x0, y0), Seq(x1, y0), Seq(x1, y1), Seq(x0, y1), Seq(x0, y0)))

  test("zonalSlopeStats: per-boundary stats + slope class") {
    val boundaries = Seq(
      ("flat_zone", rect(0, 0, 10, 10)),
      ("steep_zone", rect(10, 0, 20, 10))).toDF("boundary_id", "geom")
    val samples = Seq(
      (1.0, 1.0, 2.0), (2.0, 2.0, 4.0),          // flat zone: mean 3.0
      (11.0, 1.0, 20.0), (12.0, 2.0, 40.0),      // steep zone: mean 30.0
      (50.0, 50.0, 99.0)                          // outside all zones
    ).toDF("x", "y", "value")
    val r = GeoPipeline.zonalSlopeStats(boundaries, samples).collect()
      .map(x => x.getAs[String]("boundary_id") ->
        (x.getAs[Long]("slope_points_used"), x.getAs[Double]("mean_slope"),
          x.getAs[String]("slope_class"))).toMap
    assert(r("flat_zone") == ((2L, 3.0, "Flat")))
    assert(r("steep_zone") == ((2L, 30.0, "Very Steep")))
    assert(r.size == 2)
  }

  test("tagAdmin: centroid-based admin tagging with left join for misses") {
    val features = Seq(
      ("f1", rect(1, 1, 3, 3)),    // centroid (2±, 2±) -> in west
      ("f2", rect(11, 1, 13, 3)),  // centroid -> in east
      ("f3", rect(91, 91, 93, 93)) // centroid outside all admin polys
    ).toDF("feature_id", "geom")
    val admin = Seq(
      ("D-west", "S1", rect(0, 0, 10, 10)),
      ("D-east", "S2", rect(10, 0, 20, 10))).toDF("district", "sector", "admin_geom")
    val r = GeoPipeline.tagAdmin(features, admin).collect()
      .map(x => x.getAs[String]("feature_id") ->
        Option(x.getAs[String]("associated_district"))).toMap
    assert(r == Map("f1" -> Some("D-west"), "f2" -> Some("D-east"), "f3" -> None))
  }

  test("enrichBoundaries: area + decimal-scaled centroid columns") {
    val b = Seq(("v1", rect(0, 0, 4, 2))).toDF("boundary_id", "geom")
    val r = GeoPipeline.enrichBoundaries(b).head()
    assert(r.getAs[Double]("area") == 8.0)
    assert(r.getAs[java.math.BigDecimal]("centroid_lat").doubleValue() == 0.8) // vertex mean incl closing pt
    assert(r.getAs[java.math.BigDecimal]("centroid_lon").doubleValue() == 1.6)
  }

  test("run: tracked merge emits reference stages, stats, and saved output") {
    val boundaries = Seq(
      ("flat_zone", rect(0, 0, 10, 10)),
      ("steep_zone", rect(10, 0, 20, 10)),
      ("empty_zone", rect(30, 30, 40, 40))).toDF("boundary_id", "geom")
    val samples = Seq(
      (1.0, 1.0, 2.0), (2.0, 2.0, 4.0),
      (11.0, 1.0, 20.0), (12.0, 2.0, 40.0),
      (50.0, 50.0, 99.0)).toDF("x", "y", "value").repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("geo_run").toString + "/merged"
    val id = ProgressTracker.createProcess()

    val (merged, stats) = GeoPipeline.run(spark, boundaries, samples,
      processId = Some(id), outDir = Some(dir))
    // left join keeps pointless boundaries with null stats
    assert(merged.count() == 3)
    assert(stats == GeoPipeline.MergeStats(
      totalBoundaryFeatures = 3, processedFeatures = 2, slopePointsUsed = 4))
    assert(spark.read.parquet(dir).count() == 3)

    val fin = ProgressTracker.getStatus(id)
    assert(fin.completed && fin.stage == "completed" && fin.progress == 100)
    assert(fin.message == "Processing completed with WGS84 coordinates!")
    assert(fin.processingTimeSeconds.exists(_ > 0))
    val events = ProgressTracker.history(id)
    assert(events.map(_._1).distinct
      .containsSlice(Seq("validation", "processing", "merging", "completed")),
      s"stages: ${events.map(_._1).distinct}")
    events.groupBy(e => (e._1, e._2)).foreach { case (span, evs) =>
      val ps = evs.map(_._3)
      assert(ps == ps.sorted, s"non-monotone percents in $span: $ps")
    }
    // batch_processor message vocabulary rides the tracked spans
    assert(events.exists(_._2 == "Processing slope analysis in WGS84..."))
    assert(events.exists(_._2 == "Saving WGS84 results..."))
    merged.unpersist()
  }

  test("run: schema gate rejects with an error status like the CRS-fix gate") {
    val bad = Seq(("b1", 1)).toDF("boundary_id", "not_geom")
    val samples = Seq((1.0, 1.0, 2.0)).toDF("x", "y", "value")
    val id = ProgressTracker.createProcess()
    val e = intercept[IllegalArgumentException](
      GeoPipeline.run(spark, bad, samples, processId = Some(id)))
    assert(e.getMessage.contains("boundaries.geom"))
    val st = ProgressTracker.getStatus(id)
    assert(st.completed && st.error.exists(_.contains("CRS/Overlap fix failed")))
  }

  test("zonalSlopeStatsIndexed matches the nested-loop variant") {
    val boundaries = Seq(
      ("flat_zone", rect(0, 0, 10, 10)),
      ("steep_zone", rect(10, 0, 20, 10))).toDF("boundary_id", "geom")
    val samples = Seq(
      (1.0, 1.0, 2.0), (2.0, 2.0, 4.0),
      (11.0, 1.0, 20.0), (12.0, 2.0, 40.0),
      (50.0, 50.0, 99.0)).toDF("x", "y", "value")
    val a = GeoPipeline.zonalSlopeStats(boundaries, samples).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(5))).toSet
    val b = GeoPipeline.zonalSlopeStatsIndexed(boundaries, samples).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(5))).toSet
    assert(a == b)
  }
}
