package graft

import graft.streaming.{DocStreams, EventStreams, StreamSources}
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The config-switched stream-source seam: the Kafka wire decode is a
  * plain projection provable on batch frames (no broker needed), and the
  * Kafka branch itself is exercised up to the provider-lookup boundary —
  * the exact point where a cluster that ships spark-sql-kafka takes
  * over. */
class StreamSourcesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** A batch frame with Kafka's fixed source shape: binary key/value +
    * transport metadata, value = one JSON event per record. */
  private def kafkaShaped(rows: Seq[String]) = {
    import spark.implicits._
    rows.toDF("json").select(
      lit(null).cast(BinaryType).as("key"),
      col("json").cast(BinaryType).as("value"),
      lit("events").as("topic"),
      lit(0).as("partition"),
      monotonically_increasing_id().as("offset"))
  }

  test("decodeJsonWire round-trips events through the Kafka wire shape") {
    val events = Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":7,"event_type":"click","value":1.5,"props":"a"}""",
      """{"event_id":2,"ts":"2024-01-01T01:30:00Z","user_id":8,"event_type":"purchase","value":99.0,"props":null}""")
    val out = StreamSources
      .decodeJsonWire(kafkaShaped(events), EventStreams.eventSchema)
      .orderBy("event_id")
    assert(out.schema.fieldNames.toSeq ===
      EventStreams.eventSchema.fieldNames.toSeq)
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows(0).getString(3) === "click")
    assert(rows(1).getDouble(4) === 99.0)
    assert(rows(0).getTimestamp(1).toInstant.toString ===
      "2024-01-01T00:00:00Z")
  }

  test("decodeJsonWire survives poison-pill records as null rows") {
    val out = StreamSources.decodeJsonWire(
      kafkaShaped(Seq("""not json at all""",
        """{"doc_id":3,"ingest_ts":"2024-01-01T00:00:00Z","text":"t","lang":"en","source":"s"}""")),
      DocStreams.docSchema)
    val rows = out.orderBy(col("doc_id").asc_nulls_last).collect()
    assert(rows.length === 2)          // the bad record is kept, nulled…
    assert(rows(0).getLong(0) === 3L)  // …and the good one decodes
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(2))
  }

  test("FileSource seam builds the same typed stream as the direct readers") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-seam").toFile
    tmp.deleteOnExit()
    val dir = tmp.getAbsolutePath
    graft.sources.Tables.load(spark, SharedSpark.sf0001, "events")
      .limit(10).write.mode("overwrite").parquet(dir)
    val viaSeam = EventStreams.readEventStream(
      spark, StreamSources.FileSource(dir))
    assert(viaSeam.isStreaming)
    assert(viaSeam.schema === EventStreams.eventSchema)
  }

  test("FileSource rejects an unknown format eagerly") {
    val e = intercept[IllegalArgumentException] {
      StreamSources.read(spark, EventStreams.eventSchema,
        StreamSources.FileSource("/tmp/nowhere", format = "csv"))
    }
    assert(e.getMessage.contains("unsupported file stream format"))
  }

  test("KafkaSource reaches the provider-lookup boundary without a broker") {
    // This sandbox does not ship spark-sql-kafka: the seam must build
    // the full reader config and fail ONLY at DataSource provider
    // resolution — proving the branch compiles and wires against
    // spark-sql core alone, exactly the jar boundary the scaladoc
    // claims. On a cluster with the provider jar, the same call
    // proceeds to the broker.
    val e = intercept[AnalysisException] {
      StreamSources.read(spark, DocStreams.docSchema,
        StreamSources.KafkaSource("broker:9092", "docs",
          maxOffsetsPerTrigger = Some(10000L),
          extraOptions = Map("kafka.security.protocol" -> "PLAINTEXT")))
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }
}
