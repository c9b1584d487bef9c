package graft

import java.nio.file.Files

import graft.sources.Snapshot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The unified maintenance driver's contracts: signals read from
  * metadata, the ladder fires in composition order (eq-convert before
  * materialize before compact, prerequisites force earlier steps),
  * visible rows never change, and a second run converges (no fires). */
class MaintainSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def rows(r: Seq[(Long, Double, String)]) = {
    import spark.implicits._
    r.toDF("k", "v", "day")
  }

  test("all four signals fire once, visible rows survive exactly, second run converges") {
    val path = s"${tmp("graft-maintain")}/t"
    // birth with eqdel on so upserts sequence against the bootstrap
    Snapshot.append(spark, path, "day",
      rows((1L to 20L).map(i =>
        (i, i * 1.0, if (i % 2 == 0) "d2" else "d1"))),
      meta = Map("eqdel" -> "on"))
    // five upserts of the SAME key set: four hidden images per key
    // accumulate in the equality tier, and each batch adds files
    (1 to 5).foreach { n =>
      Snapshot.upsertByKeys(spark, path, "day",
        rows((1L to 4L).map(i =>
          (i, i * 1.0 + n, if (i % 2 == 0) "d2" else "d1"))), Seq("k"))
    }
    val expected = (1L to 20L).map(i =>
      (i, if (i <= 4) i * 1.0 + 5 else i * 1.0,
        if (i % 2 == 0) "d2" else "d1")).toSet
    def state(): Set[(Long, Double, String)] =
      Snapshot.readSnapshot(spark, path)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        .toSet
    assert(state() == expected)

    val policy = Snapshot.MaintainPolicy(
      maxEqSidecars = 2L, maxFilesPerPartition = 3,
      compactTargetBytes = 64L << 20, keepVersions = 2)
    val report = Snapshot.maintain(spark, path, "day", policy)
    assert(report.map(a => a.signal -> a.fired).toMap == Map(
      "eq_deletes" -> true, "deletion_vectors" -> true,
      "small_files" -> true, "expired_versions" -> true), s"got $report")
    // 5 hidden images per key (bootstrap + four superseded upserts) × 4 keys
    assert(report.find(_.signal == "eq_deletes").get.rowsAffected == 20L)
    assert(report.find(_.signal == "deletion_vectors").get.rowsAffected == 20L)
    assert(state() == expected, "maintenance changed visible rows")
    // converged: everything clear, metadata-only reads
    val second = Snapshot.maintain(spark, path, "day", policy)
    assert(second.forall(!_.fired), s"not converged: $second")
    assert(state() == expected)
    // file shape actually repaired: ≤ 1 file per partition after compact
    val files = Snapshot.filesOf(spark, path,
      Snapshot.currentVersion(spark, path).get)
    assert(files.groupBy(_.split("/")(0)).forall(_._2.size <= 3))
    assert(Snapshot.versions(spark, path).size <= 2)
  }

  test("a compact-only signal forces the delete tiers first (prerequisite cascade)") {
    val path = s"${tmp("graft-maintain2")}/t"
    Snapshot.append(spark, path, "day",
      rows((1L to 8L).map(i => (i, i * 1.0, "d1"))),
      meta = Map("eqdel" -> "on"))
    // ONE upsert (eq count 1, under its own threshold) plus appends to
    // trip the small-files signal — compact cannot run over the eq
    // tier, so maintain must cascade: convert, materialize, compact
    Snapshot.upsertByKeys(spark, path, "day",
      rows(Seq((1L, 100.0, "d1"))), Seq("k"))
    (1 to 4).foreach(n => Snapshot.append(spark, path, "day",
      rows(Seq((100L + n, n * 1.0, "d1")))))
    val report = Snapshot.maintain(spark, path, "day",
      Snapshot.MaintainPolicy(maxEqSidecars = 8L, maxFilesPerPartition = 3))
    assert(report.find(_.signal == "eq_deletes").get.fired,
      "pending compact must force the equality fold despite the count " +
      s"being under threshold: $report")
    assert(report.find(_.signal == "small_files").get.fired)
    val vals = Snapshot.readSnapshot(spark, path)
      .where(col("k") === 1L).collect().map(_.getDouble(1)).toSet
    assert(vals == Set(100.0))
    assert(Snapshot.maintain(spark, path, "day",
      Snapshot.MaintainPolicy(maxEqSidecars = 8L, maxFilesPerPartition = 3))
      .forall(!_.fired))
  }
}
