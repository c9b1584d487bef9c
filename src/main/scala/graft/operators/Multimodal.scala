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

  // ---------------------------------------------------------------------
  // m02 — frame sampling: the video-pipeline shape (payload → k sampled
  // frames → per-frame rows with features) with a codec-free sampler
  // both engines can reproduce: the payload is sliced into 4 equal byte
  // ranges ("frames") and each frame row carries its digest. Exercises
  // the explode-per-media fan-out — the row-multiplying step real frame
  // extraction needs — as pure codegen'd expressions: per-row work, no
  // shuffle, output grain = frames. A real codec replaces the slice+md5
  // with decode+embed inside the same plan shape.
  // ---------------------------------------------------------------------
  // Frames are addressed as byte ranges but digested via the payload's
  // hex encoding (DuckDB has no BLOB substring; hex(blob) is identical
  // in both engines, so slicing 2·chunk hex chars == slicing chunk
  // bytes).
  private def m02(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        hex(col("text").cast(BinaryType)).as("hexp"),
        length(col("text").cast(BinaryType)).cast(LongType).as("len"))
      .withColumn("chunk", greatest(expr("len div 4"), lit(1L)))
      .select(col("media_id"), col("hexp"), col("len"), col("chunk"),
        explode(sequence(lit(0L), lit(3L))).as("frame_idx"))
      .where(col("frame_idx") * col("chunk") < col("len"))
      .select(
        col("media_id"), col("frame_idx"),
        md5(expr("substring(hexp, CAST(frame_idx * chunk * 2 + 1 AS INT), CAST(chunk * 2 AS INT))"))
          .as("frame_digest"),
        col("chunk").as("frame_bytes"))
      .orderBy(col("media_id"), col("frame_idx"))
  private val m02Sql =
    """WITH m AS (
      |  SELECT doc_id AS media_id, hex(CAST(text AS BLOB)) AS hexp,
      |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS len,
      |    CAST(greatest(octet_length(CAST(text AS BLOB)) // 4, 1) AS BIGINT) AS chunk
      |  FROM documents)
      |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  md5(substring(hexp, CAST(frame_idx * chunk * 2 + 1 AS INT), CAST(chunk * 2 AS INT))) AS frame_digest,
      |  chunk AS frame_bytes
      |FROM m, range(0, 4) r(frame_idx)
      |WHERE frame_idx * chunk < len
      |ORDER BY media_id, frame_idx""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("m01_binary_metadata", m01, Some(m01Sql)),
    QueryDef("m02_frame_sample", m02, Some(m02Sql)))
}
