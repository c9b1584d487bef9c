package graft

import java.nio.file.Files

import graft.sources.{Snapshot, SnapshotConflictException}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BRANCHES (movable refs — the r17 #2 ask): multi-batch write-audit-
  * publish. Pinned here:
  *
  *  - branch commits are INVISIBLE to main; [[Snapshot.readBranch]]
  *    serves base ∪ every branch batch;
  *  - FAST-FORWARD is one atomic commit of all branch entries and is
  *    REFUSED when main moved past the branch base (diverged);
  *  - a crash between the ff commit and the branch cleanup REPLAYS
  *    safely (the commit's own header is the ledger);
  *  - retention PINS branch files and the branch base version while the
  *    branch lives; deleting the branch releases both;
  *  - two committers racing one branch serialize on the sequence —
  *    neither batch is lost.
  */
class BranchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def build(prefix: String): String = {
    import spark.implicits._
    val path = s"${tmp(prefix)}/t"
    (0 until 6).map { i =>
      (i.toLong, (i % 5).toLong, i.toLong, f"2024-01-0${i % 3 + 1}%d")
    }.toDF("event_id", "user_id", "ts_ms", "event_date")
      .repartition(2)
      .write.partitionBy("event_date").parquet(path)
    Snapshot.init(spark, path, "event_date")
    path
  }

  private def delta(id: Long, date: String): DataFrame = {
    import spark.implicits._
    Seq((id, 1L, id, date))
      .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1)
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  test("branch commits stay invisible to main; readBranch unions; fast-forward publishes atomically") {
    val path = build("graft-br-basic")
    assert(Snapshot.createBranch(spark, path, "b") == 1L)
    Snapshot.appendToBranch(spark, path, "b", "event_date",
      delta(100L, "2024-01-01"))
    Snapshot.appendToBranch(spark, path, "b", "event_date",
      delta(200L, "2024-01-02"))
    assert(Snapshot.currentVersion(spark, path).contains(1L),
      "branch commits must not move main")
    assert(ids(Snapshot.readSnapshot(spark, path)) == (0L until 6L).toSet)
    assert(ids(Snapshot.readBranch(spark, path, "b")) ==
      (0L until 6L).toSet + 100L + 200L)
    assert(Snapshot.branches(spark, path) == Seq(("b", 1L, 2)))
    val v = Snapshot.fastForward(spark, path, "b")
    assert(v == 2L)
    assert(ids(Snapshot.readSnapshot(spark, path)) ==
      (0L until 6L).toSet + 100L + 200L)
    assert(Snapshot.branches(spark, path).isEmpty, "published branch gone")
    // the ff commit carries its ledger header
    val m = Snapshot.metaOf(spark, path, 2L)
    assert(m.get("branch").contains("b") && m.get("branch_base").contains("1"))
  }

  test("fast-forward REFUSES a diverged base; re-branching from the new head publishes") {
    val path = build("graft-br-diverge")
    Snapshot.createBranch(spark, path, "b")
    Snapshot.appendToBranch(spark, path, "b", "event_date",
      delta(100L, "2024-01-01"))
    // main moves past the branch base
    Snapshot.append(spark, path, "event_date", delta(900L, "2024-01-02"))
    val ex = intercept[SnapshotConflictException](
      Snapshot.fastForward(spark, path, "b"))
    assert(ex.getMessage.contains("moved past the branch base"))
    assert(ids(Snapshot.readSnapshot(spark, path)) ==
      (0L until 6L).toSet + 900L, "refused ff must not leak batches")
    // the branch survives the refusal — re-branch and replay
    assert(Snapshot.branches(spark, path).map(_._1) == Seq("b"))
    val staged = Snapshot.readBranch(spark, path, "b")
    // (readBranch serves base ∪ batches even against a moved main)
    assert(ids(staged).contains(100L))
    Snapshot.deleteBranch(spark, path, "b")
    Snapshot.createBranch(spark, path, "b2")
    Snapshot.appendToBranch(spark, path, "b2", "event_date",
      delta(100L, "2024-01-01"))
    assert(Snapshot.fastForward(spark, path, "b2") == 3L)
    assert(ids(Snapshot.readSnapshot(spark, path)).contains(100L))
  }

  test("retention pins branch files and the branch BASE; deleteBranch releases the orphans") {
    val path = build("graft-br-retain")
    Snapshot.createBranch(spark, path, "hold")
    Snapshot.appendToBranch(spark, path, "hold", "event_date",
      delta(100L, "2024-01-01"))
    // main moves twice so the base would be expirable without the pin
    Snapshot.append(spark, path, "event_date", delta(900L, "2024-01-02"))
    Snapshot.append(spark, path, "event_date", delta(901L, "2024-01-03"))
    Snapshot.expire(spark, path, "event_date", keep = 1)
    // the branch base (v1) survived the keep-1 sweep
    assert(Snapshot.versions(spark, path).contains(1L),
      "branch base must be pinned by the sweep")
    // and the staged batch is still fully readable
    assert(ids(Snapshot.readBranch(spark, path, "hold")).contains(100L))
    // release: the branch dies, the next sweep retires base + batch
    Snapshot.deleteBranch(spark, path, "hold")
    val deleted = Snapshot.expire(spark, path, "event_date", keep = 1)
    assert(!Snapshot.versions(spark, path).contains(1L),
      "released base must expire")
    assert(deleted.nonEmpty, "orphaned branch files must be swept")
  }

  test("a crashed fast-forward (commit landed, cleanup lost) REPLAYS to the same version") {
    val path = build("graft-br-replay")
    Snapshot.createBranch(spark, path, "b")
    Snapshot.appendToBranch(spark, path, "b", "event_date",
      delta(100L, "2024-01-01"))
    val v = Snapshot.fastForward(spark, path, "b")
    // simulate the crash: resurrect the branch pointers as if the
    // cleanup never ran (same base marker + a commit pointer is exactly
    // what a crash between commit and cleanup leaves behind)
    val bdir = new java.io.File(s"$path/_branches/b")
    bdir.mkdirs()
    java.nio.file.Files.write(bdir.toPath.resolve("c-000000000000"),
      "#base=1".getBytes)
    java.nio.file.Files.write(bdir.toPath.resolve("c-000000000001"),
      "#op=branch-append".getBytes)
    // replay finds its own ledger header at v2 and finishes the cleanup
    assert(Snapshot.fastForward(spark, path, "b") == v)
    assert(Snapshot.branches(spark, path).isEmpty)
  }

  test("two committers racing one branch serialize on the sequence — both batches survive") {
    import java.util.concurrent.{CountDownLatch, Executors}
    val path = build("graft-br-race")
    Snapshot.createBranch(spark, path, "b")
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val futures = (0 until 2).map { k =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          start.await()
          Snapshot.appendToBranch(spark, path, "b", "event_date",
            delta(500L + k, "2024-01-01"))
        }
      })
    }
    start.countDown()
    val seqs = futures.map(_.get()).sorted
    pool.shutdown()
    assert(seqs == Seq(1L, 2L), s"racers must take distinct slots: $seqs")
    assert(ids(Snapshot.readBranch(spark, path, "b"))
      .intersect(Set(500L, 501L)) == Set(500L, 501L))
    Snapshot.fastForward(spark, path, "b")
    assert(ids(Snapshot.readSnapshot(spark, path))
      .intersect(Set(500L, 501L)) == Set(500L, 501L))
  }
}
