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
  * Image payloads are REALLY decoded via the JDK's built-in
  * `javax.imageio` (PNG/JPEG/GIF/BMP need no external codecs): actual
  * pixel dimensions and an ARGB pixel checksum. Audio payloads are
  * REALLY decoded via the JDK's `javax.sound.sampled` (WAV/AIFF/AU PCM):
  * sample rate, channels, frame count, and a PCM checksum. Video
  * decode — for which this container genuinely has no codecs — stays
  * behind the deterministic `FakeCodec` fallback, which also catches
  * payloads the real codecs cannot parse (truncated/garbage bytes) so a
  * bad file degrades to byte-level features instead of failing the job.
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

  /** Decoded features. `decoded` = 1 when a real codec parsed the
    * payload — images carry thumb dims from ACTUAL pixel dimensions and
    * an ARGB checksum; audio carries sample_rate/channels/pcm_frames and
    * a PCM checksum. 0 = byte-level fallback (zeroed typed fields). */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: Long,
      thumb_w: Int,
      thumb_h: Int,
      frames_sampled: Int,
      decoded: Int,
      sample_rate: Int,
      channels: Int,
      pcm_frames: Long)

  /** Real image decode, JDK-only (`javax.imageio`). Returns
    * (pixelWidth, pixelHeight, argbChecksum), or None when ImageIO has
    * no reader for the bytes — callers fall back to [[FakeCodec]].
    * The checksum folds the full ARGB raster row-by-row; for lossless
    * formats (PNG, BMP) it is a stable content fingerprint across JVMs. */
  object ImageCodec {
    def decode(payload: Array[Byte]): Option[(Int, Int, Long)] = {
      if (payload == null || payload.length == 0) return None
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val row = new Array[Int](w)
          var cs = 0L
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w) // bulk row read, not per-pixel
            var x = 0
            while (x < w) { cs = cs * 31 + (row(x) & 0xffffffffL); x += 1 }
            y += 1
          }
          Some((w, h, cs))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Real audio decode, JDK-only (`javax.sound.sampled` — WAV/AIFF/AU
    * PCM need no external codecs). Returns (sampleRateHz, channels,
    * pcmFrames, pcmChecksum) with the checksum folded over the decoded
    * PCM stream (not the container bytes — two containers of the same
    * audio fingerprint identically), or None when the bytes are not a
    * parseable audio container — callers fall back to [[FakeCodec]]. */
  object AudioCodec {
    def decode(payload: Array[Byte]): Option[(Int, Int, Long, Long)] = {
      if (payload == null || payload.length == 0) return None
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          // getFrameSize is AudioSystem.NOT_SPECIFIED (-1) for formats
          // without a fixed frame size; clamping it to 1 would silently
          // report the raw byte count as pcm_frames. Decline instead —
          // callers fall back to FakeCodec, which is visibly a fallback.
          val frameSize = fmt.getFrameSize
          if (frameSize == javax.sound.sampled.AudioSystem.NOT_SPECIFIED ||
              frameSize <= 0) return None
          val buf = new Array[Byte](8192)
          var cs = 0L
          var bytes = 0L
          var n = in.read(buf)
          while (n > 0) {
            var i = 0
            while (i < n) { cs = cs * 31 + (buf(i) & 0xff); i += 1 }
            bytes += n
            n = in.read(buf)
          }
          Some((fmt.getSampleRate.toInt, fmt.getChannels, bytes / frameSize, cs))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Byte-level fallback (video, undecodable images/audio): every output
    * derives deterministically from the payload bytes + declared
    * metadata, so the plumbing is fully testable without codecs. */
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
        frames_sampled = if (r.media_type == "video") 8 else 1,
        decoded = 0,
        sample_rate = 0,
        channels = 0,
        pcm_frames = 0L)
    }
  }

  /** A resized image: re-encoded PNG payload + its actual dimensions.
    * `decoded` = 1 when the source really decoded (then the thumb is a
    * true pixel-resampled rendition); 0 = fallback (empty payload). */
  final case class Thumb(
      media_id: Long,
      thumb_png: Array[Byte],
      thumb_w: Int,
      thumb_h: Int,
      decoded: Int)

  /** Real image resize (JDK-only): decode via ImageIO, scale the longer
    * side down to `maxDim` (never upscale) with bilinear resampling,
    * re-encode as PNG. None when the payload doesn't decode. */
  def resize(payload: Array[Byte], maxDim: Int): Option[(Array[Byte], Int, Int)] = {
    if (payload == null || payload.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
        val w = math.max(1, math.round(img.getWidth * scale).toInt)
        val h = math.max(1, math.round(img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some((bos.toByteArray, w, h))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The resize stage: same partition-batched shape as decode — real
    * pixel resampling for decodable images, an empty-payload marker row
    * (never a dropped row) for everything else, so the output grain
    * stays 1:1 with the input and downstream joins never lose media. */
  def thumbnailPartition(media: Dataset[MediaRow], maxDim: Int): Dataset[Thumb] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        resize(r.payload, maxDim) match {
          case Some((png, w, h)) => Thumb(r.media_id, png, w, h, decoded = 1)
          case None => Thumb(r.media_id, Array.empty[Byte], 0, 0, decoded = 0)
        }
      }
    }
  }

  /** The decode stage: partition-batched, codec initialized once per
    * partition. Images go through the real `javax.imageio` path, audio
    * through the real `javax.sound.sampled` path; video and unparseable
    * payloads fall back to the byte-level fake. */
  def decodePartition(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = FakeCodec.init()
      rows.map { r =>
        r.media_type match {
          case "image" =>
            ImageCodec.decode(r.payload) match {
              case Some((w, h, cs)) =>
                MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
                  cs, math.max(1, w / 4), math.max(1, h / 4),
                  frames_sampled = 1, decoded = 1,
                  sample_rate = 0, channels = 0, pcm_frames = 0L)
              case None => codec.decode(r)
            }
          case "audio" =>
            AudioCodec.decode(r.payload) match {
              case Some((rate, ch, frames, cs)) =>
                MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
                  cs, thumb_w = 0, thumb_h = 0,
                  frames_sampled = 1, decoded = 1,
                  sample_rate = rate, channels = ch, pcm_frames = frames)
              case None => codec.decode(r)
            }
          case _ => codec.decode(r)
        }
      }
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
  /** Frame rows for any (media_id, payload) set — payload is the raw
    * media bytes carried as a string column named `payload`. */
  private def frameRowsOf(media: DataFrame): DataFrame =
    media
      .select(col("media_id"),
        hex(col("payload").cast(BinaryType)).as("hexp"),
        length(col("payload").cast(BinaryType)).cast(LongType).as("len"))
      .withColumn("chunk", greatest(expr("len div 4"), lit(1L)))
      .select(col("media_id"), col("hexp"), col("len"), col("chunk"),
        explode(sequence(lit(0L), lit(3L))).as("frame_idx"))
      .where(col("frame_idx") * col("chunk") < col("len"))
      .select(
        col("media_id"), col("frame_idx"),
        md5(expr("substring(hexp, CAST(frame_idx * chunk * 2 + 1 AS INT), CAST(chunk * 2 AS INT))"))
          .as("frame_digest"),
        col("chunk").as("frame_bytes"))

  private def frameRows(s: SparkSession, dir: String): DataFrame =
    frameRowsOf(Tables.load(s, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text").as("payload")))

  private def m02(s: SparkSession, dir: String): DataFrame =
    frameRows(s, dir).orderBy(col("media_id"), col("frame_idx"))
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

  // ---------------------------------------------------------------------
  // m03 — media↔text pair assembly: the interleaved multimodal training
  // row (a media item paired with each surrounding text window) that
  // caption/interleave trainers consume. Media features (payload digest
  // + byte length, m01's codec-free surface) and text chunks (d11's
  // token windows) come from the SAME source row, so the pairing is a
  // single pass — media columns ride through the chunk explode instead
  // of a table-vs-itself join on doc_id. pair_digest = md5(media_digest
  // ∥ chunk_digest) is the stable downstream join/dedup key.
  //
  // Scale: per-row explode only (fan-out = chunks per doc), zero
  // shuffle beyond the contract ORDER BY — the plan shape survives a
  // real codec replacing the digest exactly as in m02.
  // ---------------------------------------------------------------------
  private def m03(s: SparkSession, dir: String): DataFrame =
    TextOps.chunkRowsOf(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          md5(col("text").cast(BinaryType)).as("media_digest"),
          length(col("text").cast(BinaryType)).cast(LongType)
            .as("n_media_bytes")))
      .select(col("doc_id"), col("chunk_idx"), col("media_digest"),
        col("n_media_bytes"), col("chunk_digest"),
        md5(concat(col("media_digest"), col("chunk_digest"))).as("pair_digest"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  private val m03Sql = {
    val toks = TextOps.tokensSql
    val (cs, st) = (TextOps.ChunkSize, TextOps.ChunkStride)
    s"""WITH base AS (
       |  SELECT doc_id, md5(text) AS media_digest,
       |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_media_bytes,
       |    $toks AS toks, CAST(len($toks) AS BIGINT) AS nt
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, media_digest, n_media_bytes, toks, nt,
       |    CASE WHEN nt <= $cs THEN 1
       |         ELSE 1 + (nt - $cs + $st - 1) // $st
       |    END AS n_chunks
       |  FROM base),
       |idx AS (
       |  SELECT doc_id, media_digest, n_media_bytes, toks,
       |    CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_idx
       |  FROM n),
       |paired AS (
       |  SELECT doc_id, chunk_idx, media_digest, n_media_bytes,
       |    md5(array_to_string(list_slice(toks,
       |      CAST(chunk_idx * $st + 1 AS BIGINT),
       |      CAST(chunk_idx * $st + $cs AS BIGINT)), ' ')) AS chunk_digest
       |  FROM idx)
       |SELECT doc_id, chunk_idx, media_digest, n_media_bytes, chunk_digest,
       |  md5(concat(media_digest, chunk_digest)) AS pair_digest
       |FROM paired
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  // ---------------------------------------------------------------------
  // m04 — media near-dup pairs via shared frame fingerprints: two media
  // items are near-dup candidates when ≥ MinSharedFrames of their m02
  // frame digests coincide — the fingerprint-bucketing shape of
  // perceptual media dedup (real perceptual hashes slot into the
  // frame_digest column without changing the plan). The pair space is
  // the n02 discipline transposed to media: ONE shuffle on
  // frame_digest, pairs generated inside each bucket, and buckets past
  // MaxFrameBucket members dropped BEFORE the quadratic explode (a
  // degenerate fingerprint — e.g. the all-black frame — would otherwise
  // pin one task on ~size²/2 pairs; content that hot belongs to exact
  // dedup, not pairwise scoring). The final (a, b) count shuffles only
  // the surviving pair sliver.
  //
  // The graded media set is the corpus payloads PLUS a deterministic
  // re-encode of every doc_id % 5 == 2 item (media_id = doc_id·10 + 1,
  // first quarter of the bytes replaced, length preserved) — the
  // "same video, different intro card" case: frames 1-3 coincide with
  // the original, frame 0 differs, so each variant pairs with its
  // original at n_shared_frames = 3. The all-'x' replacement quarter is
  // also the degenerate-fingerprint case — variants of equal length
  // share frame 0's digest, and those single-frame coincidences are
  // exactly what the MinSharedFrames floor discards.
  // ---------------------------------------------------------------------

  /** Per-fingerprint bucket cap, the n02/`Dedup.MaxBucket` analog. */
  val MaxFrameBucket: Int = graft.Config.MaxFrameBucket

  /** Minimum shared frame digests (of the 4 sampled) for a pair. */
  val MinSharedFrames = 2

  /** Shared-frame near-dup pairs over any (media_id, frame_digest)
    * frame set — m04's core, public for crafted-corpus specs. */
  def sharedFramePairs(frames: DataFrame, minShared: Int = MinSharedFrames,
      maxBucket: Int = MaxFrameBucket): DataFrame = {
    val buckets = frames
      .select(col("media_id"), col("frame_digest")).distinct()
      .groupBy(col("frame_digest"))
      .agg(sort_array(collect_list(col("media_id"))).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("media_a"), col("p.b").as("media_b"))
      .agg(count(lit(1)).as("n_shared_frames"))
      .where(col("n_shared_frames") >= minShared)
      .orderBy(col("media_a"), col("media_b"))
  }

  /** The m04 graded media set: corpus payloads plus the deterministic
    * re-encode variants. Shared by m04 (inline) and m06 (served). */
  private def m04MediaSet(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    val originals = docs.select(
      (col("doc_id") * 10L).as("media_id"), col("text").as("payload"))
    // Re-encoded variant: same byte length, first quarter overwritten.
    val variants = docs
      .where(pmod(col("doc_id"), lit(5L)) === 2L)
      .withColumn("q",
        greatest(expr("CAST(length(text) AS BIGINT) div 4"), lit(1L)))
      .select(
        (col("doc_id") * 10L + 1L).as("media_id"),
        concat(expr("repeat('x', CAST(q AS INT))"),
          expr("substring(text, CAST(q + 1 AS INT))")).as("payload"))
    originals.unionByName(variants)
  }

  private def m04(s: SparkSession, dir: String): DataFrame =
    sharedFramePairs(frameRowsOf(m04MediaSet(s, dir)))
  private val m04Sql =
    s"""WITH media AS (
       |  SELECT doc_id * 10 AS media_id, text AS payload FROM documents
       |  UNION ALL
       |  SELECT doc_id * 10 + 1 AS media_id,
       |    repeat('x', CAST(greatest(length(text) // 4, 1) AS INT))
       |      || substring(text, CAST(greatest(length(text) // 4, 1) + 1 AS INT))
       |      AS payload
       |  FROM documents WHERE doc_id % 5 = 2),
       |m AS (
       |  SELECT media_id, hex(CAST(payload AS BLOB)) AS hexp,
       |    CAST(octet_length(CAST(payload AS BLOB)) AS BIGINT) AS len,
       |    CAST(greatest(octet_length(CAST(payload AS BLOB)) // 4, 1) AS BIGINT) AS chunk
       |  FROM media),
       |frames AS (
       |  SELECT DISTINCT media_id,
       |    md5(substring(hexp, CAST(frame_idx * chunk * 2 + 1 AS INT), CAST(chunk * 2 AS INT))) AS frame_digest
       |  FROM m, range(0, 4) r(frame_idx)
       |  WHERE frame_idx * chunk < len),
       |b AS (
       |  SELECT frame_digest FROM frames
       |  GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND $MaxFrameBucket),
       |pairs AS (
       |  SELECT f1.media_id AS media_a, f2.media_id AS media_b
       |  FROM frames f1
       |  JOIN b USING (frame_digest)
       |  JOIN frames f2 USING (frame_digest)
       |  WHERE f1.media_id < f2.media_id)
       |SELECT media_a, media_b, CAST(COUNT(*) AS BIGINT) AS n_shared_frames
       |FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= $MinSharedFrames
       |ORDER BY media_a, media_b""".stripMargin

  // ---------------------------------------------------------------------
  // m05 — media storage dedup: the content-addressable-store report a
  // multimodal corpus needs before anything else touches the payloads —
  // "how many bytes do we store twice?". One row per payload digest
  // stored more than once: copy count, payload size, bytes reclaimable
  // (copies−1 × size), and the canonical keeper (min media_id). The
  // graded media set is the corpus plus a deterministic re-upload of
  // every doc_id % 3 == 0 payload (media_id = doc_id·10 + 2) — the m04
  // lesson codified: a dedup operator's gate must contain duplicates.
  //
  // Scale shape: exactly d01 at media grain — ONE shuffle carrying
  // (digest, media_id, n_bytes), 48-ish bytes/row regardless of payload
  // width, with map-side partial aggregation; payload bytes never move.
  // ---------------------------------------------------------------------
  private def m05(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    val media = docs.select(
      (col("doc_id") * 10L).as("media_id"), col("text").as("payload"))
      .unionByName(docs.where(pmod(col("doc_id"), lit(3L)) === 0L)
        .select((col("doc_id") * 10L + 2L).as("media_id"),
          col("text").as("payload")))
    media
      .select(col("media_id"),
        md5(col("payload").cast(BinaryType)).as("payload_digest"),
        length(col("payload").cast(BinaryType)).cast(LongType).as("n_bytes"))
      .groupBy(col("payload_digest"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col("n_bytes")).as("payload_bytes"),
        min(col("media_id")).as("keeper_media_id"))
      .where(col("n_copies") > 1L)
      .withColumn("bytes_saved",
        (col("n_copies") - 1L) * col("payload_bytes"))
      .select(col("payload_digest"), col("n_copies"), col("payload_bytes"),
        col("bytes_saved"), col("keeper_media_id"))
      .orderBy(col("payload_digest"))
  }
  private val m05Sql =
    """WITH media AS (
      |  SELECT doc_id * 10 AS media_id, text AS payload FROM documents
      |  UNION ALL
      |  SELECT doc_id * 10 + 2 AS media_id, text AS payload
      |  FROM documents WHERE doc_id % 3 = 0),
      |sized AS (
      |  SELECT media_id, md5(payload) AS payload_digest,
      |    CAST(octet_length(CAST(payload AS BLOB)) AS BIGINT) AS n_bytes
      |  FROM media)
      |SELECT payload_digest, CAST(count(*) AS BIGINT) AS n_copies,
      |  CAST(min(n_bytes) AS BIGINT) AS payload_bytes,
      |  CAST((count(*) - 1) * min(n_bytes) AS BIGINT) AS bytes_saved,
      |  CAST(min(media_id) AS BIGINT) AS keeper_media_id
      |FROM sized GROUP BY 1 HAVING count(*) > 1
      |ORDER BY payload_digest""".stripMargin

  // ---------------------------------------------------------------------
  // m06 — media near-dup behind a SERVED fingerprint store: the serving
  // matrix's media cell (LSH → n09, BQ → v19, PQ → v26, IVF → v27,
  // BM25 → r08, frames → m06). Frame digests are the expensive artifact
  // of perceptual media dedup — one corpus-scale decode+hash pass over
  // the raw payloads — and no deployment recomputes them per audit: the
  // digest table publishes once per corpus fingerprint (16-byte rows,
  // payloads never re-read), and every later pairing/report scans
  // digests only. Graded against m04's oracle VERBATIM, so the hash
  // gate is the served ≡ inline proof; MultimodalSpec pins a serving
  // plan with zero payload arithmetic (no hex/md5 over payload bytes).
  // ---------------------------------------------------------------------
  def servedFrameDigests(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    graft.sources.Sink.fingerprintedArtifact(
      s, s"${graft.sources.Sink.artifactRoot}/media_frames/$tag",
      s"$dir/documents.parquet") {
      frameRowsOf(m04MediaSet(s, dir))
        .select(col("media_id"), col("frame_idx"), col("frame_digest"))
    }
  }

  private def m06(s: SparkSession, dir: String): DataFrame =
    sharedFramePairs(servedFrameDigests(s, dir))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("m01_binary_metadata", m01, Some(m01Sql)),
    QueryDef("m02_frame_sample", m02, Some(m02Sql)),
    QueryDef("m03_media_text_pairs", m03, Some(m03Sql)),
    QueryDef("m04_media_neardup", m04, Some(m04Sql)),
    QueryDef("m05_storage_dedup", m05, Some(m05Sql)),
    // m04's oracle verbatim: served ≡ inline
    QueryDef("m06_served_frame_index", m06, Some(m04Sql)))
}
