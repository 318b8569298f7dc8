package graft.geo

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialIndexJoinSpec extends SparkSpec {
  import spark.implicits._

  private def cellPoly(cx: Int, cy: Int): Seq[Seq[Seq[Double]]] = Seq(Seq(
    Seq(cx.toDouble, cy.toDouble), Seq(cx + 1.0, cy.toDouble),
    Seq(cx + 1.0, cy + 1.0), Seq(cx.toDouble, cy + 1.0),
    Seq(cx.toDouble, cy.toDouble)))

  test("grid-indexed join matches the nested-loop result on a 400-polygon grid") {
    // 20x20 grid of unit-square polygons over [0,20)^2
    val polys = (for (cx <- 0 until 20; cy <- 0 until 20)
      yield (s"z${cx}_$cy", cellPoly(cx, cy))).toDF("zone", "geom")
    val points = (0 until 5000)
      .map(i => ((i % 220) * 0.1, (i % 199) * 0.1, i.toLong))
      .toDF("x", "y", "id")

    val indexed = SpatialIndexJoin.join(points, polys, "x", "y", "geom")
      .select("id", "zone").collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val bnlj = points.join(polys,
      GeoFunctions.stContainsPoint(col("geom"), col("x"), col("y")))
      .select("id", "zone").collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(indexed == bnlj)
    assert(indexed.nonEmpty)
    // points beyond the polygon extent (x >= 20) were dropped by both
    assert(indexed.map(_._1).forall(i => (i % 220) * 0.1 < 20.0))
  }

  test("holes and ties behave like the expression semantics") {
    val holed = Seq(Seq(
      Seq(0.0, 0.0), Seq(4.0, 0.0), Seq(4.0, 4.0), Seq(0.0, 4.0), Seq(0.0, 0.0)),
      Seq(Seq(1.0, 1.0), Seq(2.0, 1.0), Seq(2.0, 2.0), Seq(1.0, 2.0), Seq(1.0, 1.0)))
    val polys = Seq(("outer", holed)).toDF("zone", "geom")
    val pts = Seq((0.5, 0.5, 1L), (1.5, 1.5, 2L), (3.0, 3.0, 3L)).toDF("x", "y", "id")
    val r = SpatialIndexJoin.join(pts, polys, "x", "y", "geom")
      .select("id").as[Long].collect().toSet
    assert(r == Set(1L, 3L)) // point 2 is inside the hole
  }
}
