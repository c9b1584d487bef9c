package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Config-switched stream source seam (SURVEY §2.9): the reference
  * *declares* its event feeds as JSON streams (ref:
  * documentation/Project_Report.pdf p.2) without naming a transport; in
  * production that transport is Kafka, in tests it is a replayable
  * file/memory source. Every graft stream reader goes through
  * [[StreamSources.read]], so switching a deployment from file staging
  * to a Kafka topic is a CONFIG change ([[FileSource]] → [[KafkaSource]])
  * — the downstream plan (watermarks, stateful ops, foreachBatch
  * staging) is identical either way.
  *
  * The Kafka branch is built entirely through the stringly-typed
  * `DataStreamReader.format("kafka")` API, so this file compiles against
  * spark-sql core alone; the `spark-sql-kafka-0-10` provider jar is
  * resolved only at `load()` time on a cluster that ships it. The wire
  * decode (Kafka's fixed binary `value` column → typed rows) is a plain
  * batch-compatible projection, unit-tested in StreamSourcesSpec without
  * a broker.
  */
object StreamSources {

  /** Where a stream comes from. The downstream transform never cares. */
  sealed trait StreamSource

  /** Replayable file-backed stream — the test/backfill default.
    * `maxFilesPerTrigger` bounds micro-batch size (and, in tests, forces
    * multiple micro-batches from a multi-file dir). */
  final case class FileSource(dir: String, format: String = "parquet",
      maxFilesPerTrigger: Int = 1) extends StreamSource

  /** Kafka topic carrying one JSON event per record in `value` — the
    * declared production wire shape. `startingOffsets` defaults to
    * "earliest" (reprocess-from-retention on first start; resumed runs
    * follow the checkpoint, which always wins over this option).
    * `maxOffsetsPerTrigger` is the micro-batch rate limiter — at 100 TB
    * feed rates, leaving it unset lets one catch-up batch swallow the
    * whole backlog. `extraOptions` passes through any further
    * `kafka.`-prefixed client config (TLS, groupIdPrefix, …). */
  final case class KafkaSource(bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      extraOptions: Map[String, String] = Map.empty) extends StreamSource

  /** One reader for every source kind: schema + source config → typed
    * streaming DataFrame with the given schema's columns. */
  def read(spark: SparkSession, schema: StructType,
      source: StreamSource): DataFrame = source match {
    case FileSource(dir, fmt, n) =>
      val r = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", n.toString)
      fmt match {
        case "parquet" => r.parquet(dir)
        case "json"    => r.json(dir)
        case other => throw new IllegalArgumentException(
          s"unsupported file stream format: $other (parquet|json)")
      }
    case k: KafkaSource => decodeJsonWire(kafkaRaw(spark, k), schema)
  }

  /** The raw Kafka reader: fixed source schema (key/value binary, topic,
    * partition, offset, timestamp, timestampType) defined by the
    * provider, so no `.schema()` call is allowed here. */
  private def kafkaRaw(spark: SparkSession, k: KafkaSource): DataFrame = {
    val base = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", k.bootstrapServers)
      .option("subscribe", k.topic)
      .option("startingOffsets", k.startingOffsets)
    val limited = k.maxOffsetsPerTrigger
      .fold(base)(n => base.option("maxOffsetsPerTrigger", n.toString))
    k.extraOptions.foldLeft(limited) { case (r, (key, v)) => r.option(key, v) }
      .load()
  }

  /** Kafka wire rows → typed rows: `value` holds one UTF-8 JSON event.
    * A malformed or schema-mismatched record yields nulls (from_json's
    * PERMISSIVE default) rather than killing the query — poison-pill
    * records on a production topic must not wedge the stream; the intake
    * quality gate downstream drops null-text rows anyway. Pure
    * projection over a `value` column, so it runs (and is tested) on
    * batch frames too. */
  def decodeJsonWire(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(from_json(col("value").cast(StringType), schema).as("r"))
      .select(col("r.*"))
}
