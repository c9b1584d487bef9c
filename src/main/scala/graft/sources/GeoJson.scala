package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's GeoJSON preprocessing path (entry point 3,
  * lambda_geojson_processor.py:9-49) as one Spark plan: multiLine JSON
  * scan → explode(features) → WKT LINESTRING via codegen'd array
  * expressions — replacing the Lambda + S3 + crawler handoff with a
  * single engine lifecycle (SURVEY §3.3).
  *
  * The reference's row-at-a-time Python loop becomes `explode` (a
  * Catalyst Generator) + higher-order functions; origin/dest come from
  * element_at(coords, 1) / element_at(coords, -1) exactly like the
  * lambda's coords[0] / coords[-1].
  *
  * Compat note (SURVEY §0 bug 1): the lambda writes end_lat into BOTH
  * dest columns (`writer.writerow([..., end_lat, end_lat, wkt])`,
  * lambda_geojson_processor.py:40), which silently breaks the
  * downstream route join. `compatEndLatBug = true` replicates that for
  * byte-level comparisons against lambda output; default is correct.
  *
  * Scale: multiLine JSON files are NOT splittable (one file = one task)
  * — fine for config-sized route files; for bulk GeoJSON use JSONL.
  * Everything after the scan is per-row → linear.
  */
object GeoJson {

  /** GeoJSON FeatureCollection of LineStrings, explicit schema — never
    * infer schemas at scale (footerless JSON inference double-scans). */
  val geoJsonSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("properties", StructType(Seq(
        StructField("route_id", StringType)))),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", ArrayType(ArrayType(DoubleType))))))))))))

  /** routes.geojson → (origin_lat, origin_long, dest_lat, dest_long,
    * shape_wkt), the lambda's output schema (lambda:22-24). */
  def routes(spark: SparkSession, path: String,
      compatEndLatBug: Boolean = false): DataFrame = {
    val raw = spark.read.schema(geoJsonSchema)
      .option("multiLine", true).json(path)
    val feats = raw.select(explode(col("features")).as("f"))
      .select(
        col("f.properties.route_id").as("route_id"),
        col("f.geometry.coordinates").as("coords"))
    // GeoJSON positions are [long, lat] (RFC 7946 §3.1.1); the lambda
    // reads coord[1] as lat, coord[0] as long (lambda:33-34).
    val origin = element_at(col("coords"), 1)
    val dest = element_at(col("coords"), -1)
    val wkt = concat(
      lit("LINESTRING("),
      array_join(
        transform(col("coords"), c =>
          concat_ws(" ", c.getItem(0), c.getItem(1))), ", "),
      lit(")"))
    feats.select(
      col("route_id"),
      origin.getItem(1).as("origin_lat"),
      origin.getItem(0).as("origin_long"),
      dest.getItem(1).as("dest_lat"),
      (if (compatEndLatBug) dest.getItem(1) else dest.getItem(0)).as("dest_long"),
      wkt.as("shape_wkt"))
  }

  /** The fact↔route composite join key the reference builds from 4
    * coordinates (glue_master_etl.py:296-299). */
  def routeKey(df: DataFrame): DataFrame =
    df.withColumn("route_key_composite",
      concat_ws("_", col("origin_lat"), col("origin_long"),
        col("dest_lat"), col("dest_long")))
}
