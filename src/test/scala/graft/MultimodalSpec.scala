package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal decode plumbing: schema, partition-batched decode,
  * deterministic fake codec (the real codec is stubbed — container has
  * no media libraries; the Spark-side shape is what's under test). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

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
    // checksum is the deterministic byte fold
    val again = Multimodal.decodePartition(mediaDs).collect().sortBy(_.media_id)
    assert(out.map(_.checksum).sameElements(again.map(_.checksum)))
    // thumbnail dims are quarter-size, floored at 1
    assert(out(0).thumb_w == 160 && out(0).thumb_h == 120)
    assert(out(2).thumb_w == 1 && out(2).thumb_h == 1)
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
}
