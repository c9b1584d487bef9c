package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion, the reference's rawdata entry (S1: Glue-crawled CSV
  * catalog scan, glue_master_etl.py:100-103) and the lambda's CSV output
  * (S7, lambda_geojson_processor.py:22-40) — Spark-native.
  *
  * Always an EXPLICIT schema: the reference leans on crawler inference
  * (README.md:116-121); at 100 TB inference means an extra full pass
  * and silently drifting types. `permissive` keeps the reference's
  * tolerance for malformed rows but surfaces them in a corrupt-record
  * column instead of dropping them silently.
  */
object Csv {

  val corruptCol = "_corrupt_record"

  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, "string"))
      .option("header", header)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  def write(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.option("header", header).mode("overwrite").csv(path)
}
