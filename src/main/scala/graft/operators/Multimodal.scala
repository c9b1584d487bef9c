package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) handled as
  * opaque `binary` payloads with typed metadata, the standard shape for
  * multimodal training-data pipelines.
  *
  * The Spark-side architecture is real and tested — schema, typed
  * Dataset encoders, per-partition batched processing — while the actual
  * media decode is STUBBED with a deterministic fake (this container has
  * no image/audio codecs): `FakeCodec` derives "features" from the
  * payload bytes. Swapping in a real decoder is a one-function change
  * inside `decodePartition`.
  *
  * Scale design: decode runs in `mapPartitions` so codec init happens
  * once per partition (not per row), payloads never pass through the
  * driver, and the decode stage pipelines with the parquet scan.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** Deterministic fake "decoded features" for a payload. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: Long,
      thumb_w: Int,
      thumb_h: Int,
      frames_sampled: Int)

  /** STUB decode: a real implementation would call an image/audio codec
    * here (once-per-partition init, batch decode). The fake derives
    * every output deterministically from the bytes so the plumbing is
    * fully testable. */
  object FakeCodec {
    def init(): FakeCodec.type = this // codec handle placeholder
    def decode(r: MediaRow): MediaFeatures = {
      var cs = 0L
      var i = 0
      while (i < r.payload.length) { cs = cs * 31 + (r.payload(i) & 0xff); i += 1 }
      MediaFeatures(
        media_id = r.media_id,
        media_type = r.media_type,
        n_bytes = r.payload.length.toLong,
        checksum = cs,
        thumb_w = math.max(1, r.width / 4),
        thumb_h = math.max(1, r.height / 4),
        frames_sampled = if (r.media_type == "video") 8 else 1)
    }
  }

  /** The decode stage: partition-batched, codec initialized once per
    * partition — the exact shape a real decoder needs. */
  def decodePartition(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = FakeCodec.init()
      rows.map(codec.decode)
    }
  }

  // ---------------------------------------------------------------------
  // m01 — binary-column metadata extraction, graded against DuckDB: text
  // payloads cast to binary, then byte length / header hex / digest —
  // the (codec-free) subset of decode that is engine-agnostic. Exercises
  // BinaryType columns end-to-end through scan → expression → parquet.
  // ---------------------------------------------------------------------
  private def m01(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        col("text").cast(BinaryType).as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).cast(LongType).as("n_bytes"),
        lower(hex(substring(col("payload"), 1, 8))).as("header_hex"),
        md5(col("payload")).as("digest"))
      .orderBy(col("doc_id"))
  private val m01Sql =
    """SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  lower(substr(hex(CAST(text AS BLOB)), 1, 16)) AS header_hex,
      |  md5(text) AS digest
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("m01_binary_metadata", m01, Some(m01Sql)))
}
