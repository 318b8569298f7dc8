package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S3/S12: GeoJSON FeatureCollection ⇄ DataFrame codec. The reference
  * passes FeatureCollections around as Python dicts (shapefile→GeoJSON
  * conversion, slope polygon export); here a FeatureCollection document
  * explodes into a typed feature DataFrame and reassembles with
  * `to_json(collect_list(struct(...)))` — both directions columnar.
  *
  * Geometry coordinates land in the engine's polygon encoding
  * (`array<array<array<double>>>`, see graft.geo) for Polygon — the only
  * geometry type the reference's geo pipelines carry. Features of other
  * geometry rank (Point, LineString, MultiPolygon) keep their
  * `geometry_type` and properties but parse with a null `geom` (the
  * coordinates field doesn't match the polygon rank); ingest them via a
  * rank-specific schema if they ever matter.
  */
object GeoJson {

  val geometrySchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", ArrayType(ArrayType(ArrayType(DoubleType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("geometry", geometrySchema),
    StructField("properties", MapType(StringType, StringType))))

  val collectionSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(featureSchema))))

  /** Explode FeatureCollection JSON documents (one per row in `jsonCol`)
    * into one row per feature: geometry type, polygon coordinates, and
    * string-valued properties map.
    */
  def explodeFeatures(df: DataFrame, jsonCol: String): DataFrame =
    df.select(posexplode(from_json(col(jsonCol), collectionSchema).getField("features")))
      .select(
        col("pos").as("feature_index"),
        col("col.geometry.type").as("geometry_type"),
        col("col.geometry.coordinates").as("geom"),
        col("col.properties").as("properties"))

  /** Reassemble a feature DataFrame into a single FeatureCollection JSON
    * string (the reference's export endpoint shape,
    * geospatial_merger/views.py:212-246). Features are emitted in
    * `orderBy` order (default: the `feature_index` explodeFeatures
    * produced) — a bare collect_list gathers in partition-arrival order,
    * which scrambles the export run-to-run on multi-partition frames.
    */
  def toFeatureCollection(features: DataFrame, geometryType: Column,
      geom: Column, properties: Column,
      orderBy: Column = col("feature_index")): Column = {
    val keyed = collect_list(struct(
      orderBy.as("_o"),
      struct(
        lit("Feature").as("type"),
        struct(geometryType.as("type"), geom.as("coordinates")).as("geometry"),
        properties.as("properties")).as("_f")))
    // array_sort with an explicit _o comparator: sort_array needs an
    // orderable element type, and the feature struct carries a map
    val sorted = array_sort(keyed, (a, b) =>
      when(a.getField("_o") < b.getField("_o"), -1)
        .when(a.getField("_o") > b.getField("_o"), 1)
        .otherwise(0))
    to_json(struct(
      lit("FeatureCollection").as("type"),
      transform(sorted, x => x.getField("_f")).as("features")))
  }
}
