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
  * (`array<array<array<double>>>`, see graft.geo) for Polygon; other types
  * keep their raw JSON for round-tripping.
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
    * geospatial_merger/views.py:212-246).
    */
  def toFeatureCollection(features: DataFrame, geometryType: Column,
      geom: Column, properties: Column): Column =
    to_json(struct(
      lit("FeatureCollection").as("type"),
      collect_list(struct(
        lit("Feature").as("type"),
        struct(geometryType.as("type"), geom.as("coordinates")).as("geometry"),
        properties.as("properties"))).as("features")))
}
