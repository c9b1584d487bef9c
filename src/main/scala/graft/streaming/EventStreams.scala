package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's declared-but-never-built streaming surface
  * (ref: documentation/Project_Report.pdf p.2 — order/shipping JSON event
  * streams for "real-time operational dashboards and alerts"; SURVEY.md
  * §2.9), built on Structured Streaming.
  *
  * The transform is shared with the batch path (same DataFrame code runs
  * under read or readStream) — the Spark way to keep batch/stream parity.
  * Watermarking bounds state: at scale, state store size is
  * O(open windows × key cardinality), independent of stream length.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window aggregation — works on both batch and streaming
    * inputs (stream requires the watermark for append-mode output). */
  def windowedCounts(events: DataFrame, watermark: Boolean): DataFrame = {
    val src = if (watermark) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("total_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"), col("approx_users"))
  }

  /** Streaming read of the events table (parquet source used as the
    * replayable stream in tests; swap format for kafka/json in prod). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Stream-static join: enrich a value-threshold alert stream with a
    * static dimension — the report's "late-shipment alert" shape. The
    * static side is re-planned per micro-batch and broadcast. */
  def highValueAlerts(events: DataFrame, users: DataFrame): DataFrame =
    events.where(col("value") > 100.0)
      .join(broadcast(users), Seq("user_id"), "left")
}
