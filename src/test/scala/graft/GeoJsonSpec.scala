package graft

import graft.sources.GeoJson
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GeoJSON→WKT route path (reference entry point 3) against a
  * fixture mirroring the lambda's input shape. */
class GeoJsonSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private lazy val path =
    getClass.getResource("/routes.geojson").getPath

  test("flattens features to one row each with correct endpoints") {
    val df = GeoJson.routes(spark, path)
    val rows = df.collect().sortBy(_.getAs[String]("route_id"))
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getAs[Double]("origin_lat") == 41.85)
    assert(r1.getAs[Double]("origin_long") == -87.65)
    assert(r1.getAs[Double]("dest_lat") == 42.27)
    assert(r1.getAs[Double]("dest_long") == -89.4)
    assert(r1.getAs[String]("shape_wkt") ==
      "LINESTRING(-87.65 41.85, -88.1 41.9, -89.4 42.27)")
    // single-point degenerate: origin == dest
    val r3 = rows(2)
    assert(r3.getAs[Double]("origin_lat") == r3.getAs[Double]("dest_lat"))
    assert(r3.getAs[String]("shape_wkt") == "LINESTRING(10.0 53.55)")
  }

  test("compat mode replicates the lambda's end_lat-twice bug") {
    val buggy = GeoJson.routes(spark, path, compatEndLatBug = true)
      .where(col("route_id") === "R2").head()
    assert(buggy.getAs[Double]("dest_long") == buggy.getAs[Double]("dest_lat"))
  }

  test("routeKey builds the 4-coordinate composite join key") {
    val df = GeoJson.routeKey(GeoJson.routes(spark, path))
    val r2 = df.where(col("route_id") === "R2").head()
    assert(r2.getAs[String]("route_key_composite") == "37.77_-122.42_37.33_-121.89")
  }
}
