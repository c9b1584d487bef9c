package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal decode plumbing: schema, partition-batched decode,
  * real `javax.imageio` image decode (PNG/JPEG ship with the JDK), real
  * `javax.sound.sampled` audio decode (WAV PCM ships with the JDK), and
  * the deterministic byte-level fallback for video/garbage. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = SharedSpark.sf0001

  private def mediaDs = {
    import spark.implicits._
    Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3, 4), 640, 480),
      MediaRow(2L, "video", Array[Byte](9, 8, 7), 1920, 1080),
      MediaRow(3L, "audio", Array.empty[Byte], 0, 0)).toDS()
  }

  test("decodePartition preserves ids and derives features deterministically") {
    val out = Multimodal.decodePartition(mediaDs).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).sameElements(Array(1L, 2L, 3L)))
    assert(out(0).n_bytes == 4 && out(1).n_bytes == 3 && out(2).n_bytes == 0)
    // video samples 8 frames, stills/audio 1
    assert(out(1).frames_sampled == 8 && out(0).frames_sampled == 1)
    // garbage "image" bytes fall back to the byte-level codec
    assert(out.forall(_.decoded == 0))
    // checksum is the deterministic byte fold
    val again = Multimodal.decodePartition(mediaDs).collect().sortBy(_.media_id)
    assert(out.map(_.checksum).sameElements(again.map(_.checksum)))
    // thumbnail dims are quarter-size, floored at 1
    assert(out(0).thumb_w == 160 && out(0).thumb_h == 120)
    assert(out(2).thumb_w == 1 && out(2).thumb_h == 1)
  }

  /** Render a w×h image with deterministic pixels, encoded as `fmt`. */
  private def renderImage(w: Int, h: Int, fmt: String, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 7 + seed) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("real PNG/JPEG payloads decode via javax.imageio: true dims, pixel checksum") {
    import spark.implicits._
    val ds = Seq(
      MediaRow(10L, "image", renderImage(64, 48, "png", 0), 9999, 9999),
      MediaRow(11L, "image", renderImage(64, 48, "png", 5), 9999, 9999),
      MediaRow(12L, "image", renderImage(20, 12, "jpg", 0), 9999, 9999),
      MediaRow(13L, "audio", renderImage(8, 8, "png", 0), 0, 0)).toDS()
    val out = Multimodal.decodePartition(ds).collect().sortBy(_.media_id)

    // images really decoded: thumbs from ACTUAL pixel dims, not the
    // (deliberately wrong) declared 9999×9999 metadata
    assert(out(0).decoded == 1 && out(0).thumb_w == 16 && out(0).thumb_h == 12)
    assert(out(2).decoded == 1 && out(2).thumb_w == 5 && out(2).thumb_h == 3)
    // pixel checksum: stable across runs, different for different pixels
    assert(out(0).checksum != out(1).checksum)
    val direct = Multimodal.ImageCodec.decode(renderImage(64, 48, "png", 0))
    assert(direct.contains((64, 48, out(0).checksum)))
    // non-image media never enters the image path, even with a PNG payload
    assert(out(3).decoded == 0)
  }

  test("thumbnailPartition: real bilinear resize, round-trip decodable, 1:1 grain") {
    import spark.implicits._
    val ds = Seq(
      MediaRow(40L, "image", renderImage(64, 48, "png", 0), 0, 0),
      MediaRow(41L, "image", renderImage(8, 8, "png", 1), 0, 0), // below maxDim
      MediaRow(42L, "image", Array[Byte](1, 2, 3), 0, 0)).toDS() // garbage
    val out = Multimodal.thumbnailPartition(ds, maxDim = 16)
      .collect().sortBy(_.media_id)
    assert(out.length == 3) // grain preserved even for undecodable rows
    // 64x48 -> longer side 16, aspect kept
    assert(out(0).decoded == 1 && out(0).thumb_w == 16 && out(0).thumb_h == 12)
    // the thumbnail is itself a valid PNG with those dimensions
    val roundTrip = Multimodal.ImageCodec.decode(out(0).thumb_png)
    assert(roundTrip.exists { case (w, h, _) => w == 16 && h == 12 })
    // small images are never upscaled
    assert(out(1).thumb_w == 8 && out(1).thumb_h == 8)
    // garbage degrades to a marker row, not an exception or a drop
    assert(out(2).decoded == 0 && out(2).thumb_png.isEmpty)
  }

  /** Build a mono 16-bit little-endian PCM WAV with deterministic
    * samples. Returns (container bytes, raw PCM bytes). */
  private def renderWav(rate: Int, nFrames: Int, seed: Int): (Array[Byte], Array[Byte]) = {
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val v = ((i * 131 + seed * 17) % 65536 - 32768).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    (bos.toByteArray, pcm)
  }

  test("real WAV payloads decode via javax.sound.sampled: rate, channels, PCM checksum") {
    import spark.implicits._
    val (wav, pcm) = renderWav(8000, 1000, 3)
    val (wav2, _) = renderWav(16000, 500, 4)
    val ds = Seq(
      MediaRow(50L, "audio", wav, 0, 0),
      MediaRow(51L, "audio", wav2, 0, 0),
      MediaRow(52L, "audio", Array[Byte](1, 2, 3, 4), 0, 0), // not audio
      MediaRow(53L, "image", wav, 0, 0)).toDS()              // wrong type
    val out = Multimodal.decodePartition(ds).collect().sortBy(_.media_id)
    // real decode: format header fields come from the WAV itself
    assert(out(0).decoded == 1 && out(0).sample_rate == 8000 &&
      out(0).channels == 1 && out(0).pcm_frames == 1000L)
    assert(out(1).decoded == 1 && out(1).sample_rate == 16000 &&
      out(1).pcm_frames == 500L)
    // checksum folds the decoded PCM stream — reproducible from the
    // raw samples, independent of the container framing
    val want = pcm.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
    assert(out(0).checksum == want)
    // garbage audio falls back; WAV bytes declared as image fall back too
    assert(out(2).decoded == 0 && out(3).decoded == 0)
  }

  test("m01 binary metadata: digest matches md5 of the text payload") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("m01_binary_metadata")(spark, SharedSpark.sf0001)
    val docs = graft.sources.Tables.load(spark, SharedSpark.sf0001, "documents")
      .select(col("doc_id"), md5(col("text")).as("want"),
        // byte length, not char length — zh docs are multi-byte in UTF-8
        length(col("text").cast("binary")).cast("long").as("want_len"))
    val bad = df.join(docs, Seq("doc_id"))
      .where(col("digest") =!= col("want") || col("n_bytes") =!= col("want_len"))
    assert(bad.count() == 0)
  }

  test("m02 frame sampling: 4 frames per non-trivial doc, digests of real slices") {
    import org.apache.spark.sql.functions._
    val frames = SparkEntry.queries("m02_frame_sample")(spark, SharedSpark.sf0001)
      .collect()
    val byMedia = frames.groupBy(_.getLong(0))
    assert(byMedia.nonEmpty)
    byMedia.values.foreach { fs =>
      assert(fs.length >= 1 && fs.length <= 4)
      assert(fs.map(_.getLong(1)).sorted.sameElements(0L until fs.length))
      // every frame digest is a well-formed md5 and frames of equal bytes
      fs.foreach { f =>
        assert(f.getString(2).matches("[0-9a-f]{32}"))
        assert(f.getLong(3) >= 1L)
      }
    }
    // docs long enough for 4 full chunks get exactly 4 frames
    val docs = graft.sources.Tables.load(spark, SharedSpark.sf0001, "documents")
    val longDocs = docs
      .where(length(col("text").cast("binary")) >= 4).count()
    assert(byMedia.count(_._2.length == 4).toLong == longDocs)
  }

  test("m04 shared-frame pairs: threshold, within-media dups, bucket cap") {
    import spark.implicits._
    import graft.operators.Multimodal
    val frames = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"), (1L, "D"),
      (2L, "A"), (2L, "B"), (2L, "X"), (2L, "Y"),   // shares A,B with 1
      (3L, "A"), (3L, "Z"), (3L, "W"), (3L, "V"),   // shares only A
      (4L, "A"), (4L, "B"), (4L, "C"), (4L, "E"),   // shares 3 w/ 1, 2 w/ 2
      (5L, "A"), (5L, "A"))                          // dup digest counts once
      .toDF("media_id", "frame_digest")
    val got = Multimodal.sharedFramePairs(frames).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        r.getAs[Long]("n_shared_frames")).toMap
    assert(got == Map((1L, 2L) -> 2L, (1L, 4L) -> 3L, (2L, 4L) -> 2L))
    // cap: digest A's bucket (5 members) dropped with maxBucket = 4; the
    // B/C buckets survive, so counts shrink by exactly the A overlap
    val capped = Multimodal.sharedFramePairs(frames, maxBucket = 4).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        r.getAs[Long]("n_shared_frames")).toMap
    assert(capped == Map((1L, 4L) -> 2L))
  }

  test("m04 finds every injected exact copy; counts equal true overlap") {
    // sf0.001 has no byte-identical texts, so inject them: every doc
    // re-uploaded under doc_id + 10^6 — in m04's media space the
    // originals (media_id = doc_id·10) of each (id, id+10^6) pair share
    // ALL their frame digests and must surface whenever they have >= 2
    // distinct ones
    val tmp = java.nio.file.Files.createTempDirectory("m04").toString
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    docs.union(docs.withColumn("doc_id", col("doc_id") + 1000000L))
      .write.parquet(s"$tmp/documents.parquet")
    val m02 = SparkEntry.queries("m02_frame_sample")(spark, tmp).collect()
    val digests = m02.groupBy(_.getAs[Long]("media_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[String]("frame_digest")).toSet }
    val pairs = SparkEntry.queries("m04_media_neardup")(spark, tmp).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")) ->
        r.getAs[Long]("n_shared_frames")).toMap
    // original↔original counts equal the true distinct-digest overlap
    // (m02 keys media by doc_id; m04 keys originals by doc_id·10)
    pairs.foreach { case ((a, b), n) =>
      assert(n >= 2L)
      if (a % 10 == 0 && b % 10 == 0)
        assert(n == (digests(a / 10) & digests(b / 10)).size.toLong)
    }
    var checked = 0
    digests.keys.filter(_ < 1000000L).foreach { id =>
      val copy = id + 1000000L
      assert(digests(id) == digests(copy))
      if (digests(id).size >= 2) {
        assert(pairs((id * 10, copy * 10)) == digests(id).size.toLong)
        checked += 1
      }
    }
    assert(checked > 0)
    // the re-encoded variants pair with their own originals too
    val variantPairs = pairs.keys.filter { case (a, b) => b == a + 1 }
    assert(variantPairs.nonEmpty)
    variantPairs.foreach { case (a, _) =>
      assert(a % 10 == 0 && (a / 10) % 5 == 2)
    }
  }

  test("m05 storage dedup: every %3 re-upload found, keeper is the original") {
    val rows = SparkEntry.queries("m05_storage_dedup")(spark, dir).collect()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    // texts are unique in the corpus, so every dup group is exactly
    // {original, re-upload} of one %3 == 0 doc
    assert(rows.length.toLong == docs.where(col("doc_id") % 3 === 0).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_copies") == 2L)
      assert(r.getAs[Long]("bytes_saved") == r.getAs[Long]("payload_bytes"))
      val keeper = r.getAs[Long]("keeper_media_id")
      assert(keeper % 10 == 0 && (keeper / 10) % 3 == 0)
    }
  }

  test("m03 pairs: one row per d11 chunk, media digest constant per doc") {
    val pairs = SparkEntry.queries("m03_media_text_pairs")(spark, SharedSpark.sf0001)
      .collect()
    val chunks = SparkEntry.queries("d11_chunking")(spark, SharedSpark.sf0001)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
        r.getAs[String]("chunk_digest")).toMap
    assert(pairs.length == chunks.size)
    pairs.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      // one media item per document, paired with each of its text windows
      assert(rs.map(_.getAs[String]("media_digest")).distinct.length == 1)
    }
    pairs.foreach { r =>
      // the text leg is exactly the d11 chunk digest for that position
      assert(r.getAs[String]("chunk_digest") ==
        chunks((r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"))))
      assert(r.getAs[String]("pair_digest").matches("[0-9a-f]{32}"))
    }
  }

  test("m06: served frame index ≡ m04 inline, with zero payload arithmetic at serve time") {
    val inline = SparkEntry.queries("m04_media_neardup")(spark, SharedSpark.sf0001)
      .collect().toSeq
    val served = SparkEntry.queries("m06_served_frame_index")(spark, SharedSpark.sf0001)
      .collect().toSeq
    assert(served == inline, "served frame index diverged from the inline pairing")
    // the serving plan reads the published digest table and never
    // re-touches payload bytes (no hex/md5 over payloads, no variant
    // re-encode): the corpus-scale decode+hash pass is paid once at
    // publish, 16-byte digest rows after
    val plan = SparkEntry.queries("m06_served_frame_index")(spark, SharedSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("media_frames"), s"m06 not reading the served digests:\n$plan")
    assert(!plan.contains("md5(") && !plan.contains("hex("),
      s"m06 recomputed digests at serve time:\n$plan")
    assert(!plan.contains("repeat("),
      s"m06 re-encoded the variants at serve time:\n$plan")
  }
}
