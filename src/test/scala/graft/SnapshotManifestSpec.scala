package graft

import java.nio.file.Files

import graft.sources.Snapshot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-16 manifest-tier contracts, each pinned structurally:
  *
  *  - INCREMENTAL COMMITS: a k-file commit writes O(k + segments) bytes
  *    (one change segment + a tiny manifest list), INDEPENDENT of how
  *    many files the table holds — where the r15 format re-wrote the
  *    full live listing per commit and again per rebase attempt.
  *  - SEGMENT FOLD: past `Config.ManifestSegments` chained segments the
  *    committing writer consolidates, so read fan-out stays bounded at
  *    any commit rate; a pre-segment (legacy full-listing) manifest
  *    folds in the same way on its first post-upgrade commit.
  *  - DV THRESHOLD POLICY: `maintainDeletes` holds under policy and
  *    fires `materializeDeletes` when the vector debt crosses it.
  *  - DV FILE CAP: a wide merge-on-read predicate packs its vector into
  *    ceil(n / cap) sidecar files — no single-task funnel.
  *  - RETENTION: keep-last-N and keep-age COMPOSE (either retains);
  *    expired versions stop resolving and restore refuses them.
  *  - CDC CONSUMER: persisted offsets advance bootstrap → delta →
  *    caught-up, and degrade to resync across a rewrite.
  *  - MULTI-COLUMN STATS: a two-column range conjunction plans a file
  *    subset STRICTLY smaller than either single-column plan.
  */
class SnapshotManifestSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** `nFiles` single-row files across 3 partitions. */
  private def buildLayout(nFiles: Int, prefix: String): String = {
    import spark.implicits._
    val path = s"${tmp(prefix)}/events_by_date"
    (0 until nFiles).map { i =>
      (i.toLong, (i % 5).toLong, i.toLong, f"2024-01-0${i % 3 + 1}%d")
    }.toDF("event_id", "user_id", "ts_ms", "event_date")
      .repartition(nFiles)
      .write.partitionBy("event_date").parquet(path)
    path
  }

  private def manifestFile(path: String, v: Long): java.io.File =
    new java.io.File(f"$path/_manifests/m-$v%012d")

  private def manifestLinesOf(path: String, v: Long): Seq[String] =
    scala.io.Source.fromFile(manifestFile(path, v)).getLines().toSeq

  private def segLinesOf(path: String, seg: String): Seq[String] =
    scala.io.Source.fromFile(new java.io.File(s"$path/_manifests/$seg"))
      .getLines().toSeq

  private def refsOf(path: String, v: Long): Seq[String] =
    manifestLinesOf(path, v).filter(_.startsWith("@")).map(_.stripPrefix("@"))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  // -----------------------------------------------------------------
  // Incremental commits: O(k), not O(live files)
  // -----------------------------------------------------------------

  test("a 1-file append writes a 1-line segment + a ref-only list, INDEPENDENT of table size") {
    import spark.implicits._
    def appendCost(nFiles: Int, tag: String): (Long, Long, Int, Int) = {
      val path = buildLayout(nFiles, s"graft-okcommit-$tag")
      assert(Snapshot.init(spark, path, "event_date") == 1L)
      val refsBefore = refsOf(path, 1L)
      Snapshot.append(spark, path, "event_date",
        Seq((9999L, 1L, 9999L, "2024-01-01"))
          .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1))
      val lines = manifestLinesOf(path, 2L)
      // the manifest LIST carries headers + segment refs only — never a
      // file entry (the full listing lives in the immutable segments)
      assert(lines.forall(l => l.startsWith("#") || l.startsWith("@")),
        s"manifest list leaked entry lines: ${lines.mkString(" | ")}")
      val refs = refsOf(path, 2L)
      assert(refs.size == refsBefore.size + 1,
        "append should chain exactly one new segment onto the list")
      val newSeg = refs.filterNot(refsBefore.toSet).head
      val segLines = segLinesOf(path, newSeg)
      (manifestFile(path, 2L).length(),
        new java.io.File(s"$path/_manifests/$newSeg").length(),
        segLines.size, segLines.count(_.startsWith("+")))
    }
    val (listSmall, segSmall, nSmall, addsSmall) = appendCost(4, "small")
    val (listBig, segBig, nBig, addsBig) = appendCost(16, "big")
    // the k-file commit's segment names exactly its k adds — both stores
    assert(nSmall == 1 && addsSmall == 1, s"small-store segment: $nSmall lines")
    assert(nBig == 1 && addsBig == 1, s"big-store segment: $nBig lines")
    // and the BYTES written are the same whether the table holds 4 files
    // or 16 — the old format's manifest grew with the live listing
    assert(segBig == segSmall,
      s"segment bytes grew with table size: $segSmall -> $segBig")
    assert(listBig == listSmall,
      s"manifest-list bytes grew with table size: $listSmall -> $listBig")
  }

  test("segment chain folds past Config.ManifestSegments; file algebra survives the fold") {
    val path = buildLayout(4, "graft-fold")
    Snapshot.init(spark, path, "event_date")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val initFiles = Snapshot.currentFiles(spark, path)._2.toSet
    // drive the manifest algebra directly (private[graft] commit) — the
    // fold is manifest-tier behavior, no data bytes needed: each commit
    // adds one synthetic entry, one removes an EARLIER synthetic entry
    val n = graft.Config.ManifestSegments + 6
    var v = 1L
    (1 to n).foreach { i =>
      val removed =
        if (i == n) Set(s"event_date=2024-01-01/fake-1.parquet")
        else Set.empty[String]
      v = Snapshot.commit(fs, root, Some(v), removed,
        Seq(s"event_date=2024-01-01/fake-$i.parquet"), Map("op" -> "append"))
    }
    val refCounts = (1L to v).map(refsOf(path, _).size)
    // the chain grew to the threshold, then consolidated to ONE segment
    assert(refCounts.max == graft.Config.ManifestSegments,
      s"chain never reached the fold threshold: max=${refCounts.max}")
    assert(refCounts.zipWithIndex.exists { case (c, i) => i > 0 && c == 1 },
      s"no fold observed in ref counts: ${refCounts.mkString(",")}")
    // last version's refs are small again (chain restarted after fold)
    assert(refsOf(path, v).size <= graft.Config.ManifestSegments)
    // the resolved live set is exactly the add/remove algebra's answer,
    // through every fold
    val expected = initFiles ++
      (1 to n).map(i => s"event_date=2024-01-01/fake-$i.parquet") -
      "event_date=2024-01-01/fake-1.parquet"
    assert(Snapshot.currentFiles(spark, path)._2.toSet == expected)
  }

  test("a legacy full-listing manifest reads and upgrades on its first commit") {
    import spark.implicits._
    val path = buildLayout(4, "graft-legacy")
    // hand-write the r15 manifest format: header + verbatim entry lines
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(root).toString
    val entries = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith("event_date="))
      .flatMap(d => fs.listStatus(d.getPath))
      .map(_.getPath.toString.stripPrefix(qualified).stripPrefix("/"))
      .filter(_.endsWith(".parquet")).sorted
    assert(entries.nonEmpty)
    val mdir = new org.apache.hadoop.fs.Path(path, "_manifests")
    fs.mkdirs(mdir)
    val m1 = new org.apache.hadoop.fs.Path(path, f"_manifests/m-${1L}%012d")
    val out = fs.create(m1, false)
    try out.write(("#op=init\n#ts=1\n" + entries.mkString("\n"))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // legacy body reads as-is
    val before = ids(Snapshot.readSnapshot(spark, path))
    assert(before.size == 4)
    // first post-upgrade commit folds the verbatim body into a segment
    Snapshot.append(spark, path, "event_date",
      Seq((77L, 1L, 77L, "2024-01-02"))
        .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1))
    val lines = manifestLinesOf(path, 2L)
    assert(lines.forall(l => l.startsWith("#") || l.startsWith("@")),
      "legacy body survived the upgrade commit un-folded")
    assert(ids(Snapshot.readSnapshot(spark, path)) == before + 77L)
  }

  // -----------------------------------------------------------------
  // Deletion vectors: threshold policy + file cap
  // -----------------------------------------------------------------

  test("maintainDeletes holds under policy, FIRES past maxVectors, and the fold retires the debt") {
    val path = buildLayout(12, "graft-dvpolicy")
    Snapshot.init(spark, path, "event_date")
    val total = ids(Snapshot.readSnapshot(spark, path))
    Snapshot.deleteWhereMoR(spark, path, "event_date", col("user_id") === 1L)
    val (a1, f1) = Snapshot.maintainDeletes(spark, path, "event_date",
      maxVectors = 2L, maxReferencedShare = 1.0, sortCols = Seq("ts_ms"))
    assert(a1.vectors == 1L && !f1, s"policy fired early: $a1")
    Snapshot.deleteWhereMoR(spark, path, "event_date", col("user_id") === 2L)
    val (a2, f2) = Snapshot.maintainDeletes(spark, path, "event_date",
      maxVectors = 2L, maxReferencedShare = 1.0, sortCols = Seq("ts_ms"))
    assert(a2.vectors == 2L && !f2, s"policy fired at the boundary: $a2")
    Snapshot.deleteWhereMoR(spark, path, "event_date", col("user_id") === 3L)
    val (a3, f3) = Snapshot.maintainDeletes(spark, path, "event_date",
      maxVectors = 2L, maxReferencedShare = 1.0, sortCols = Seq("ts_ms"))
    assert(a3.vectors == 3L && f3,
      s"policy must fire past maxVectors=2: audit=$a3 folded=$f3")
    // the audit returned is the PRE-fold debt; post-fold the store is clean
    assert(a3.hiddenRows > 0L && a3.referencedFiles > 0L)
    val end = Snapshot.dvAudit(spark, path)
    assert(end.vectors == 0L && end.hiddenRows == 0L, s"fold left debt: $end")
    // and the fold changed no live data
    val expect = total.filterNot { id =>
      Set(1L, 2L, 3L).contains(id % 5)
    }
    assert(ids(Snapshot.readSnapshot(spark, path)) == expect)
  }

  test("referencedShare alone triggers the fold: one vector touching most files") {
    val path = buildLayout(8, "graft-dvshare")
    Snapshot.init(spark, path, "event_date")
    // user_id spreads across files — one delete references many of them
    Snapshot.deleteWhereMoR(spark, path, "event_date", col("user_id") <= 2L)
    val audit = Snapshot.dvAudit(spark, path)
    assert(audit.referencedShare > 0.25,
      s"fixture must exceed the share threshold: $audit")
    val (_, fired) = Snapshot.maintainDeletes(spark, path, "event_date",
      maxVectors = 100L, maxReferencedShare = 0.25, sortCols = Seq("ts_ms"))
    assert(fired, "high referencedShare must trigger the fold on its own")
    assert(Snapshot.dvAudit(spark, path).vectors == 0L)
  }

  test("a WIDE MoR predicate packs its vector into ceil(n/cap) files — no single-task funnel") {
    val path = buildLayout(12, "graft-dvcap")
    Snapshot.init(spark, path, "event_date")
    val before = ids(Snapshot.readSnapshot(spark, path))
    // table-wide predicate: 12 single-row files → 12 matched rows; cap 5
    // → ceil(12/5) = 3 vector files (the r15 repartition(1) write split)
    val (_, n) = Snapshot.deleteWhereMoR(spark, path, "event_date",
      col("event_id") >= 0L, vectorRowCap = 5L)
    assert(n == 12L)
    val audit = Snapshot.dvAudit(spark, path)
    assert(audit.vectors == 3L,
      s"expected ceil(12/5)=3 vector files, got ${audit.vectors}")
    assert(audit.hiddenRows == 12L)
    assert(ids(Snapshot.readSnapshot(spark, path)).isEmpty,
      "split vectors must hide exactly the matched rows")
    assert(before.size == 12)
    // the pure arithmetic, pinned at its edges
    assert(Snapshot.vectorFileCount(1L, 10L) == 1)
    assert(Snapshot.vectorFileCount(10L, 10L) == 1)
    assert(Snapshot.vectorFileCount(11L, 10L) == 2)
    assert(Snapshot.vectorFileCount(0L, 10L) == 1)
  }

  test("updateWhere honors the vector cap and stays exact across the split") {
    val path = buildLayout(9, "graft-upcap")
    Snapshot.init(spark, path, "event_date")
    val (_, n) = Snapshot.updateWhere(spark, path, "event_date",
      col("event_id") >= 0L, Map("ts_ms" -> (col("ts_ms") + lit(1000L))),
      vectorRowCap = 4L)
    assert(n == 9L)
    assert(Snapshot.dvAudit(spark, path).vectors == 3L) // ceil(9/4)
    val got = Snapshot.readSnapshot(spark, path)
      .select("event_id", "ts_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 9 && got.forall { case (id, ts) => ts == id + 1000L },
      "update lost or doubled rows across the vector split")
  }

  // -----------------------------------------------------------------
  // Retention: keep-last-N + keep-age compose
  // -----------------------------------------------------------------

  test("expire retains by COUNT OR AGE; expired versions stop resolving; restore refuses them") {
    import spark.implicits._
    val path = buildLayout(4, "graft-retain")
    val now = System.currentTimeMillis()
    // pin every commit's wall-clock (caller-supplied ts wins) so the
    // age rule cuts exactly between v2 and v3
    Snapshot.init(spark, path, "event_date",
      meta = Map("ts" -> (now - 20L * 86400 * 1000).toString)) // v1
    def appendAt(id: Long, ts: Long): Long =
      Snapshot.append(spark, path, "event_date",
        Seq((id, 1L, id, "2024-01-01"))
          .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1),
        meta = Map("ts" -> ts.toString))
    // v2 OLD (10 days ago), v3 recent (1 min), v4 recent (now): with
    // keep=1 + keepAge=7d, v3 survives by AGE though count alone would
    // drop it — the rules compose as a union
    assert(appendAt(100L, now - 10L * 86400 * 1000) == 2L)
    assert(appendAt(200L, now - 60L * 1000) == 3L)
    assert(appendAt(300L, now) == 4L)
    val v3Rows = ids(Snapshot.readVersion(spark, path, 3L))
    Snapshot.expire(spark, path, "event_date",
      keep = 1, keepAgeMs = Some(7L * 86400 * 1000))
    val left = Snapshot.versions(spark, path)
    assert(left == Seq(3L, 4L),
      s"expected age to retain v3 and count to retain v4, kept: $left")
    // retained versions still time-travel; expired ones are gone (their
    // manifest file no longer exists) and restore refuses them
    assert(ids(Snapshot.readVersion(spark, path, 3L)) == v3Rows)
    intercept[java.io.FileNotFoundException] {
      Snapshot.readVersion(spark, path, 2L)
    }
    intercept[IllegalArgumentException] {
      Snapshot.restore(spark, path, 2L)
    }
    // restore to a RETAINED version still works (rollback as new commit)
    val rv = Snapshot.restore(spark, path, 3L)
    assert(rv == 5L)
    assert(ids(Snapshot.readSnapshot(spark, path)) == v3Rows)
  }

  test("write-audit-publish: staged batches invisible, auditable, expiry-safe; publish folds, abort orphans") {
    import spark.implicits._
    val path = buildLayout(4, "graft-wap")
    Snapshot.init(spark, path, "event_date") // v1
    val before = ids(Snapshot.readSnapshot(spark, path))
    def batch(id: Long) = Seq((id, 9L, id, "2024-01-05"))
      .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1)
    val bad = Snapshot.stageAppend(spark, path, "event_date", batch(666L))
    // invisible to every reader surface until published
    assert(ids(Snapshot.readSnapshot(spark, path)) == before)
    assert(Snapshot.currentVersion(spark, path).contains(1L))
    assert(Snapshot.stagedIds(spark, path) == Seq(bad))
    // but fully auditable
    assert(ids(Snapshot.readStaged(spark, path, bad)) == Set(666L))
    // a retention sweep racing the audit must NOT eat the staged files
    Snapshot.expire(spark, path, "event_date", keep = 1)
    assert(ids(Snapshot.readStaged(spark, path, bad)) == Set(666L),
      "expire deleted a staged batch out from under its audit")
    // audit fails → abort; the orphaned files retire on the next sweep
    assert(Snapshot.abortStaged(spark, path, bad))
    assert(Snapshot.stagedIds(spark, path).isEmpty)
    val sweptRel = Snapshot.expire(spark, path, "event_date", keep = 1)
    assert(sweptRel.exists(_.startsWith("event_date=2024-01-05")),
      s"aborted batch's files must sweep, got $sweptRel")
    assert(ids(Snapshot.readSnapshot(spark, path)) == before)
    // audit passes → publish: a normal append commit, rebase semantics
    val good = Snapshot.stageAppend(spark, path, "event_date", batch(777L))
    val v = Snapshot.publishStaged(spark, path, good)
    assert(v == 2L)
    assert(ids(Snapshot.readSnapshot(spark, path)) == before + 777L)
    assert(Snapshot.metaOf(spark, path, 2L).get("wap_id").contains(good))
    assert(Snapshot.stagedIds(spark, path).isEmpty)
    // double-publish has no pointer to publish
    intercept[IllegalArgumentException] {
      Snapshot.publishStaged(spark, path, good)
    }
    // the published files carry stats when the layout declares them —
    // covered by statLines routing; here just confirm the feed sees the
    // publish as a plain append
    assert(ids(Snapshot.changes(spark, path, 1L, 2L)) == Set(777L))
  }

  test("publishStaged widens the recorded schema when the staged batch carries a new column") {
    import spark.implicits._
    val path = buildLayout(4, "graft-wapschema")
    Snapshot.init(spark, path, "event_date")
    val id = Snapshot.stageAppend(spark, path, "event_date",
      Seq((888L, 9L, 888L, "tagged-src", "2024-01-06"))
        .toDF("event_id", "user_id", "ts_ms", "ingest_tag", "event_date")
        .coalesce(1))
    // invisible while staged — including the new column
    assert(!Snapshot.readSnapshot(spark, path).columns.contains("ingest_tag"))
    Snapshot.publishStaged(spark, path, id)
    val after = Snapshot.readSnapshot(spark, path)
    assert(after.columns.contains("ingest_tag"),
      "publish must widen the recorded schema like a direct append")
    val byTag = after.groupBy(col("ingest_tag")).count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byTag == Map(None -> 4L, Some("tagged-src") -> 1L),
      s"pre-evolution rows must read NULL in the new column, got $byTag")
  }

  test("tags pin versions through expiry, are immutable, and release on deleteTag") {
    import spark.implicits._
    val path = buildLayout(4, "graft-tags")
    Snapshot.init(spark, path, "event_date") // v1
    def delta(id: Long) = Seq((id, 1L, id, "2024-01-02"))
      .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1)
    Snapshot.append(spark, path, "event_date", delta(500L)) // v2
    Snapshot.append(spark, path, "event_date", delta(600L)) // v3
    Snapshot.tag(spark, path, "train-v1", 1L)
    val trainSet = ids(Snapshot.readTag(spark, path, "train-v1"))
    assert(trainSet == ids(Snapshot.readVersion(spark, path, 1L)))
    // keep=1 would retire v1 and v2 — the tag pins v1 (and its files);
    // untagged v2 goes
    Snapshot.expire(spark, path, "event_date", keep = 1)
    assert(Snapshot.versions(spark, path) == Seq(1L, 3L))
    assert(ids(Snapshot.readTag(spark, path, "train-v1")) == trainSet,
      "the tagged training set must stay byte-identical through the sweep")
    // immutable: same-version re-tag is an idempotent no-op, a different
    // version refuses; uncommitted versions can't be tagged at all
    Snapshot.tag(spark, path, "train-v1", 1L)
    intercept[IllegalArgumentException] {
      Snapshot.tag(spark, path, "train-v1", 3L)
    }
    intercept[IllegalArgumentException] {
      Snapshot.tag(spark, path, "nope", 99L)
    }
    assert(Snapshot.tags(spark, path) == Seq("train-v1" -> 1L))
    // releasing the pin lets the next sweep retire the version
    assert(Snapshot.deleteTag(spark, path, "train-v1"))
    Snapshot.expire(spark, path, "event_date", keep = 1)
    assert(Snapshot.versions(spark, path) == Seq(3L))
    intercept[IllegalArgumentException] {
      Snapshot.readTag(spark, path, "train-v1")
    }
  }

  test("a retention HOLE breaks append attribution: the feed refuses, changeDiff stays sound") {
    import spark.implicits._
    val path = buildLayout(4, "graft-taghole")
    Snapshot.init(spark, path, "event_date") // v1
    Snapshot.tag(spark, path, "pinned", 1L)
    def delta(id: Long, date: String) = Seq((id, 1L, id, date))
      .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1)
    Snapshot.append(spark, path, "event_date", delta(800L, "2024-01-05")) // v2
    // a row-CHANGING commit that will be EXPIRED out of the middle
    Snapshot.deleteWhere(spark, path, "event_date",
      col("user_id") === 2L, Seq("ts_ms")) // v3
    Snapshot.append(spark, path, "event_date", delta(900L, "2024-01-06")) // v4
    Snapshot.expire(spark, path, "event_date", keep = 1)
    // the tag pinned v1; v2/v3 (including the delete) expired away
    assert(Snapshot.versions(spark, path) == Seq(1L, 4L))
    // ops in the hole are unknowable — silently attributing
    // filesOf(4) -- filesOf(1) would feed re-filed rows as inserts
    val ex = intercept[IllegalStateException](
      Snapshot.changes(spark, path, 1L, 4L))
    assert(ex.getMessage.contains("expired out of the gap"),
      s"wrong refusal: ${ex.getMessage}")
    // the pinned two-state diff doesn't care about the hole: it nets
    // the appends against the delete's retirements exactly
    val diff = Snapshot.changeDiff(spark, path, 1L, 4L)
      .select("event_id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val deleted = ids(Snapshot.readVersion(spark, path, 1L)) --
      ids(Snapshot.readSnapshot(spark, path))
    assert(diff == deleted.map(_ -> "delete") ++
      Set(800L -> "insert", 900L -> "insert"))
    // and the typed consumer parked at the pinned version rides the
    // diff instead of resyncing
    val posDir = new java.io.File(s"$path/_consumers/holed")
    posDir.mkdirs()
    java.nio.file.Files.write(posDir.toPath.resolve("p-000000000001"),
      "#v=1".getBytes)
    var fed = Set.empty[(Long, String)]
    val r = Snapshot.consumeChanges(spark, path, "holed") { ch =>
      fed = ch.select("event_id", "_change_type").collect()
        .map(x => (x.getLong(0), x.getString(1))).toSet
    } { _ => fail("a retained base must diff, not reset") }
    assert(r.mode == "diff" && fed == diff)
  }

  test("readAsOf resolves the newest commit <= the asked instant; pre-table asks throw") {
    import spark.implicits._
    val path = buildLayout(4, "graft-asof")
    Snapshot.init(spark, path, "event_date")
    val t1 = Snapshot.commitTs(spark, path, 1L)
    Snapshot.append(spark, path, "event_date",
      Seq((500L, 1L, 500L, "2024-01-02"))
        .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1))
    val t2 = Snapshot.commitTs(spark, path, 2L)
    assert(t2 > t1, "commit timestamps must be strictly monotonic")
    // an instant between the commits resolves v1 — the append invisible
    assert(!ids(Snapshot.readAsOf(spark, path, t2 - 1)).contains(500L))
    assert(ids(Snapshot.readAsOf(spark, path, t2)).contains(500L))
    assert(ids(Snapshot.readAsOf(spark, path, t2 + 1000)).contains(500L))
    intercept[IllegalArgumentException] {
      Snapshot.readAsOf(spark, path, t1 - 1)
    }
  }

  // -----------------------------------------------------------------
  // CDC consumer: persisted offsets
  // -----------------------------------------------------------------

  test("consume advances bootstrap -> delta -> caught-up, persists its position, resyncs across a rewrite") {
    import spark.implicits._
    val path = buildLayout(4, "graft-consume")
    Snapshot.init(spark, path, "event_date")
    val group = "spec-consumer"
    var processed = Set.empty[Long]
    var resynced = Set.empty[Long]
    def step(): Snapshot.ConsumeResult =
      Snapshot.consume(spark, path, group) { delta =>
        processed = ids(delta)
      } { full =>
        resynced = ids(full)
      }
    // first contact: full snapshot, position lands at current
    val r1 = step()
    assert(r1.mode == "bootstrap" && r1.toV == 1L)
    assert(resynced.size == 4)
    assert(Snapshot.consumerPosition(spark, path, group).contains(1L))
    // append → delta: the feed hands EXACTLY the appended rows
    Snapshot.append(spark, path, "event_date",
      Seq((800L, 2L, 800L, "2024-01-03"))
        .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1))
    processed = Set.empty
    val r2 = step()
    assert(r2.mode == "delta" && r2.fromV == 1L && r2.toV == 2L)
    assert(processed == Set(800L), s"delta fed $processed")
    // nothing new → caught-up, no callbacks, no position write
    processed = Set.empty; resynced = Set.empty
    val r3 = step()
    assert(r3.mode == "caught-up")
    assert(processed.isEmpty && resynced.isEmpty)
    // ROW-PRESERVING maintenance in the gap → the feed CROSSES it: a
    // routine compaction must not force every downstream into a table
    // re-read (the consumed batches' files are already consumed; the
    // compaction re-filed no unconsumed append)
    Snapshot.compact(spark, path, "event_date", 1L << 30, Seq("ts_ms"))
    processed = Set(-1L); resynced = Set.empty
    val r4 = step()
    assert(r4.mode == "delta" && r4.toV == 3L,
      s"compaction should be crossable, got $r4")
    assert(processed.isEmpty && resynced.isEmpty,
      "a compact-only gap must feed an EMPTY delta")
    assert(Snapshot.consumerPosition(spark, path, group).contains(3L))
    // a row-CHANGING rewrite in the gap → the feed refuses, consumer
    // re-syncs FULL
    Snapshot.deleteWhere(spark, path, "event_date",
      col("user_id") === 2L, Seq("ts_ms"))
    val r5 = step()
    assert(r5.mode == "resync" && r5.toV == 4L)
    assert(resynced == ids(Snapshot.readSnapshot(spark, path)))
    assert(Snapshot.consumerPosition(spark, path, group).contains(4L))
    // the position is durable state on disk, not process memory: a
    // "restarted" consumer (fresh position read) is simply caught up
    assert(step().mode == "caught-up")
  }

  test("the change feed crosses compaction when no unconsumed append was re-filed — and refuses when one was") {
    import spark.implicits._
    val path = buildLayout(8, "graft-feedcross")
    Snapshot.init(spark, path, "event_date") // v1
    def delta(id: Long, date: String) = Seq((id, 9L, id, date))
      .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1)
    // v2: append into a FRESH single-file partition — compaction (v3,
    // multi-file dirs only) cannot touch it; v4: another fresh append
    Snapshot.append(spark, path, "event_date", delta(9001L, "2024-01-05"))
    assert(Snapshot.compact(spark, path, "event_date", 1L << 30,
      Seq("ts_ms")).nonEmpty, "fixture must actually compact something")
    Snapshot.append(spark, path, "event_date", delta(9002L, "2024-01-06"))
    // the feed attributes ACROSS the compaction: exactly the two appends
    assert(ids(Snapshot.changes(spark, path, 1L, 4L)) == Set(9001L, 9002L))
    // and stays exact on the sub-windows around it
    assert(ids(Snapshot.changes(spark, path, 2L, 4L)) == Set(9002L))
    assert(Snapshot.changes(spark, path, 2L, 3L).count() == 0L)
    // DV materialization is row-preserving too: hide a row (consumer
    // position pinned AFTER the mor-delete), then materialize + append
    Snapshot.deleteWhereMoR(spark, path, "event_date",
      col("event_id") === 9001L) // v5
    Snapshot.materializeDeletes(spark, path, "event_date", Seq("ts_ms")) // v6
    Snapshot.append(spark, path, "event_date", delta(9003L, "2024-01-07")) // v7
    assert(ids(Snapshot.changes(spark, path, 5L, 7L)) == Set(9003L),
      "materialize must be crossable: visible rows did not change")
    // now the breaking case: an append into an EXISTING multi-file
    // partition, compacted away BEFORE the consumer read it — its rows
    // folded in with re-filed old rows, attribution is gone
    Snapshot.append(spark, path, "event_date", delta(9004L, "2024-01-01")) // v8
    Snapshot.append(spark, path, "event_date", delta(9005L, "2024-01-01")) // v9
    assert(Snapshot.compact(spark, path, "event_date", 1L << 30,
      Seq("ts_ms")).nonEmpty) // v10 — swallows the v8/v9 files
    val ex = intercept[IllegalStateException](
      Snapshot.changes(spark, path, 7L, 10L))
    assert(ex.getMessage.contains("re-filed by a later rewrite"),
      s"wrong refusal: ${ex.getMessage}")
    // a consumer parked at v7 degrades to resync, then rides deltas again
    val group = "cross-compaction"
    var mode = ""
    // park the position at v7 by bootstrapping BEFORE v8 would be ideal;
    // simulate the parked consumer with the direct feed probe instead:
    // consume() itself must choose resync over the broken window
    Snapshot.append(spark, path, "event_date", delta(9006L, "2024-01-08")) // v11
    Snapshot.consume(spark, path, group) { _ => mode = "delta" } { _ =>
      mode = "bootstrap"
    }
    assert(mode == "bootstrap")
    Snapshot.append(spark, path, "event_date", delta(9007L, "2024-01-09"))
    var fed = Set.empty[Long]
    val r = Snapshot.consume(spark, path, group) { d => fed = ids(d) } { _ => }
    assert(r.mode == "delta" && fed == Set(9007L))
  }

  test("changeDiff: inserts/deletes across append, compact, MoR delete, update, materialize, restore") {
    import spark.implicits._
    val path = buildLayout(6, "graft-cdf")
    Snapshot.init(spark, path, "event_date") // v1
    def changes(a: Long, b: Long): Set[(Long, Long, String)] =
      Snapshot.changeDiff(spark, path, a, b)
        .select("event_id", "ts_ms", "_change_type").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    Snapshot.append(spark, path, "event_date",
      Seq((100L, 9L, 100L, "2024-01-05"))
        .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1)) // v2
    assert(changes(1L, 2L) == Set((100L, 100L, "insert")))
    assert(Snapshot.compact(spark, path, "event_date", 1L << 30,
      Seq("ts_ms")).nonEmpty) // v3
    // a compaction is INVISIBLE to the diff: re-filed identical rows
    // cancel — and the diff still attributes the append through it
    assert(changes(2L, 3L).isEmpty)
    assert(changes(1L, 3L) == Set((100L, 100L, "insert")))
    Snapshot.deleteWhereMoR(spark, path, "event_date",
      col("event_id") === 2L) // v4 — a DV delta on a RETAINED file
    assert(changes(3L, 4L) == Set((2L, 2L, "delete")))
    Snapshot.updateWhere(spark, path, "event_date",
      col("event_id") === 3L,
      Map("ts_ms" -> (col("ts_ms") + lit(1000L)))) // v5
    assert(changes(4L, 5L) ==
      Set((3L, 3L, "delete"), (3L, 1003L, "insert")),
      "an update must surface as old image deleted + new image inserted")
    Snapshot.materializeDeletes(spark, path, "event_date", Seq("ts_ms")) // v6
    assert(changes(5L, 6L).isEmpty,
      "materialization changes no visible row — the diff must be empty")
    // end-to-end: one call over the whole mixed gap
    assert(changes(1L, 6L) == Set(
      (100L, 100L, "insert"), (2L, 2L, "delete"),
      (3L, 3L, "delete"), (3L, 1003L, "insert")))
    // restore to the pre-update state re-references v4's files AND its
    // deletion vector: the diff reverts the update (and exercises the
    // re-referenced-vector handling on both sides)
    Snapshot.restore(spark, path, 4L) // v7
    assert(changes(6L, 7L) ==
      Set((3L, 1003L, "delete"), (3L, 3L, "insert")))
  }

  test("changeDiff nets to EMPTY when a re-delete re-hides rows a dropped vector had hidden") {
    import spark.implicits._
    val path = buildLayout(4, "graft-cdfrehide")
    Snapshot.init(spark, path, "event_date") // v1
    Snapshot.deleteWhereMoR(spark, path, "event_date",
      col("event_id") === 2L) // v2: vector A hides row 2
    Snapshot.restore(spark, path, 1L) // v3: drops A, row 2 visible again
    Snapshot.deleteWhereMoR(spark, path, "event_date",
      col("event_id") === 2L) // v4: vector B, the SAME (file,pos) pairs
    // visible rows at v2 and v4 are identical — a diff that only
    // anti-joins one side would emit row 2 as a spurious delete (and a
    // q70-style consumer would double-retract it)
    assert(Snapshot.changeDiff(spark, path, 2L, 4L).isEmpty,
      "re-hiding an already-hidden-at-fromV row is not a change")
    // the surrounding windows still see the real transitions
    def d(a: Long, b: Long) = Snapshot.changeDiff(spark, path, a, b)
      .select("event_id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d(1L, 2L) == Set(2L -> "delete"))
    assert(d(2L, 3L) == Set(2L -> "insert"))
    assert(d(3L, 4L) == Set(2L -> "delete"))
  }

  test("changeDiff is a BAG difference: one of two identical rows dropped = exactly one delete") {
    import spark.implicits._
    val path = s"${tmp("graft-cdfbag")}/layout"
    val dup = Seq((1L, 7L, 42L, "2024-01-01"), (1L, 7L, 42L, "2024-01-01"))
      .toDF("event_id", "user_id", "ts_ms", "event_date")
    dup.coalesce(1).write.partitionBy("event_date").parquet(path)
    Snapshot.init(spark, path, "event_date") // v1: the SAME row twice
    Snapshot.replacePartitions(spark, path, "event_date",
      dup.limit(1).coalesce(1)) // v2: one copy survives
    val diff = Snapshot.changeDiff(spark, path, 1L, 2L)
      .select("event_id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(diff.toSeq == Seq((1L, "delete")),
      s"net multiset delta must be ONE delete, got ${diff.mkString(",")}")
  }

  test("two same-group instances racing one delta: exactly one advances, the other learns lost-race") {
    import spark.implicits._
    val path = buildLayout(4, "graft-consumerace")
    Snapshot.init(spark, path, "event_date")
    val group = "raced"
    Snapshot.consume(spark, path, group)(_ => ())(_ => ()) // bootstrap @ v1
    Snapshot.append(spark, path, "event_date",
      Seq((900L, 1L, 900L, "2024-01-02"))
        .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1))
    // barrier INSIDE the process callback: both instances are guaranteed
    // past the position read and mid-delta before either advances — the
    // at-least-once-process window, forced
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val modes = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        val r = Snapshot.consume(spark, path, group) { delta =>
          delta.count(): Unit // both instances do the redundant work
          barrier.await(30, java.util.concurrent.TimeUnit.SECONDS): Unit
        } { _ => fail("no instance should resync an append-only gap") }
        modes.add(r.mode): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(modes.toArray.toSet == Set("delta", "lost-race"),
      s"expected exactly one winner, got ${modes.toArray.mkString(",")}")
    // the position advanced EXACTLY once — seq files are the audit trail
    assert(Snapshot.consumerPosition(spark, path, group).contains(2L))
    val posDir = new java.io.File(s"$path/_consumers/$group")
    assert(posDir.listFiles().count(_.getName.startsWith("p-")) == 2,
      "exactly one advancement per consumed state (bootstrap + delta)")
  }

  test("a consumer whose position version was EXPIRED degrades to resync, then rides deltas again") {
    import spark.implicits._
    val path = buildLayout(4, "graft-consumerexp")
    Snapshot.init(spark, path, "event_date")
    val group = "behind"
    Snapshot.consume(spark, path, group)(_ => ())(_ => ()) // position @ v1
    def delta(id: Long) = Seq((id, 1L, id, "2024-01-02"))
      .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1)
    Snapshot.append(spark, path, "event_date", delta(910L)) // v2
    Snapshot.append(spark, path, "event_date", delta(920L)) // v3
    // retention sweeps v1/v2 while the consumer is parked at v1 — the
    // gap's commits are all appends, but the BASE version is gone, so
    // attribution is impossible and the contract is a full re-sync
    Snapshot.expire(spark, path, "event_date", keep = 1)
    assert(Snapshot.versions(spark, path) == Seq(3L))
    var resynced = Set.empty[Long]
    val r = Snapshot.consume(spark, path, group)(
      _ => fail("must not claim a delta from an expired base"))(
      full => resynced = ids(full))
    assert(r.mode == "resync" && r.toV == 3L)
    assert(resynced == ids(Snapshot.readSnapshot(spark, path)))
    // and the group is healthy again: next append rides the delta path
    Snapshot.append(spark, path, "event_date", delta(930L))
    var fed = Set.empty[Long]
    assert(Snapshot.consume(spark, path, group)(d => fed = ids(d))(
      _ => fail("caught-up consumer must not resync")).mode == "delta")
    assert(fed == Set(930L))
  }

  test("consumeChanges: typed frames ride delta/diff through any commit; expired base resets") {
    import spark.implicits._
    val path = buildLayout(4, "graft-consumediff")
    Snapshot.init(spark, path, "event_date")
    val group = "typed"
    var applied = Seq.empty[(Long, String)]
    var resets = 0
    def step(): Snapshot.ConsumeResult =
      Snapshot.consumeChanges(spark, path, group) { ch =>
        applied = ch.select("event_id", "_change_type").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
      } { full =>
        resets += 1
        assert(full.select("_change_type").distinct().collect()
          .map(_.getString(0)).toSeq == Seq("insert"),
          "a reset frame is the full snapshot typed as inserts")
      }
    assert(step().mode == "bootstrap" && resets == 1)
    // append → delta as typed inserts
    Snapshot.append(spark, path, "event_date",
      Seq((700L, 9L, 700L, "2024-01-05"))
        .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1))
    assert(step().mode == "delta")
    assert(applied == Seq((700L, "insert")))
    // merge-on-read delete → the consumer APPLIES retractions where
    // consume() would re-read the table
    Snapshot.deleteWhereMoR(spark, path, "event_date",
      col("event_id") === 700L)
    assert(step().mode == "diff")
    assert(applied == Seq((700L, "delete")))
    // row-preserving maintenance stays a (here empty) delta
    Snapshot.materializeDeletes(spark, path, "event_date", Seq("ts_ms"))
    applied = Seq((-1L, "sentinel"))
    assert(step().mode == "delta")
    assert(applied.isEmpty)
    // expire past the position → no base to diff against → reset
    Snapshot.append(spark, path, "event_date",
      Seq((701L, 9L, 701L, "2024-01-06"))
        .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1))
    Snapshot.expire(spark, path, "event_date", keep = 1)
    assert(step().mode == "resync" && resets == 2)
    assert(step().mode == "caught-up")
  }

  // -----------------------------------------------------------------
  // Multi-column manifest stats
  // -----------------------------------------------------------------

  test("two-column range conjunction plans STRICTLY fewer files than either single-column plan") {
    import spark.implicits._
    val path = s"${tmp("graft-twocol")}/grid"
    // 3×3 grid of files: file (i,j) holds a ∈ [10i, 10i+9], b ∈ [10j, 10j+9]
    def cell(i: Int, j: Int) =
      (0 until 10).map(k => (i * 3L + j, 10L * i + k, 10L * j + k, "2024-01-01"))
    cell(0, 0).toDF("event_id", "a", "b", "event_date").coalesce(1)
      .write.partitionBy("event_date").parquet(path)
    Snapshot.init(spark, path, "event_date", statsCols = Seq("a", "b"))
    for (i <- 0 to 2; j <- 0 to 2; if (i, j) != (0, 0))
      Snapshot.append(spark, path, "event_date",
        cell(i, j).toDF("event_id", "a", "b", "event_date").coalesce(1))
    assert(Snapshot.currentFiles(spark, path)._2.size == 9)
    val aOnly = Snapshot.filesInRanges(spark, path, Seq(("a", 0L, 9L)))
    val bOnly = Snapshot.filesInRanges(spark, path, Seq(("b", 0L, 9L)))
    val both = Snapshot.filesInRanges(spark, path,
      Seq(("a", 0L, 9L), ("b", 0L, 9L)))
    assert(aOnly.size == 3 && bOnly.size == 3,
      s"single-column plans: a=${aOnly.size}, b=${bOnly.size}")
    assert(both.size == 1,
      s"conjunction must intersect the grid to ONE file, got ${both.size}")
    assert(both.toSet.subsetOf(aOnly.toSet) && both.toSet.subsetOf(bOnly.toSet))
    // the pruned READ stays exact: same rows as the full read + predicate
    val pruned = Snapshot.readSnapshotRanges(spark, path,
        Seq(("a", 0L, 9L), ("b", 0L, 9L)))
      .where(col("a") <= 9L && col("b") <= 9L)
    val full = Snapshot.readSnapshot(spark, path)
      .where(col("a") <= 9L && col("b") <= 9L)
    assert(ids(pruned) == ids(full))
    assert(ids(pruned) == Set(0L))
    // and the scan's physical inputs are exactly the planned subset
    assert(pruned.inputFiles.length == 1,
      s"pruned read scanned ${pruned.inputFiles.length} files")
  }

  test("consumerLag classifies current/delta/diff/resync and prices the delta from metadata alone") {
    import spark.implicits._
    val path = buildLayout(4, "graft-lag")
    Snapshot.init(spark, path, "event_date", rowIds = true) // n: recorded
    def delta(id: Long, date: String) = Seq((id, 1L, id, date))
      .toDF("event_id", "user_id", "ts_ms", "event_date").coalesce(1)
    def park(g: String): Unit =
      Snapshot.consumeChanges(spark, path, g)(_ => ())(_ => ()): Unit
    park("g-expired") // v1
    Snapshot.updateWhere(spark, path, "event_date",
      col("event_id") === 1L, Map("ts_ms" -> (col("ts_ms") + 1L))) // v2
    park("g-diff") // at v2 — the NEXT update lands in its gap
    Snapshot.updateWhere(spark, path, "event_date",
      col("event_id") === 2L, Map("ts_ms" -> (col("ts_ms") + 1L))) // v3
    Snapshot.append(spark, path, "event_date", delta(800L, "2024-01-01")) // v4
    Snapshot.append(spark, path, "event_date", delta(801L, "2024-01-02")) // v5
    park("g-current")
    val byGroup = Snapshot.consumerLag(spark, path).map(l => l.group -> l).toMap
    assert(byGroup("g-current").mode == "current" &&
      byGroup("g-current").behind == 0L)
    // g-diff's gap holds an update → diff, cost unknowable
    val d = byGroup("g-diff")
    assert(d.mode == "diff" && d.behind == 3L && d.pendingRows.isEmpty)
    // park one group where only appends follow → delta, priced exactly
    // from the entries' n: counts (2 files, 2 rows), no data read
    val e = byGroup("g-expired")
    assert(e.mode == "diff") // still retained here — becomes resync below
    // a group parked at v3 sees the two appends as an attributable gap
    Snapshot.consumeChanges(spark, path, "g-delta") { _ => } { _ => }
    val dir = new java.io.File(s"$path/_consumers/g-delta")
    dir.listFiles().foreach(_.delete())
    java.nio.file.Files.write(dir.toPath.resolve("p-000000000001"),
      "#v=3".getBytes)
    val dl = Snapshot.consumerLag(spark, path)
      .find(_.group == "g-delta").get
    assert(dl.mode == "delta" && dl.behind == 2L &&
      dl.pendingFiles.contains(2L) && dl.pendingRows.contains(2L),
      s"delta pricing off: $dl")
    // expire v1 away: the group parked there loses its base → resync
    Snapshot.expire(spark, path, "event_date", keep = 2)
    val ex = Snapshot.consumerLag(spark, path)
      .find(_.group == "g-expired").get
    assert(ex.mode == "resync" && ex.pendingRows.isEmpty,
      s"expired position must classify resync: $ex")
  }

  test("Z-order compact: file skipping survives on BOTH dimensions; linear sort keeps only the leading one") {
    import spark.implicits._
    // two identical stores — a 64×64 (a, b) grid hash-scattered into 16
    // files of one partition — compacted to ~4 files two ways
    def build(tag: String): String = {
      val path = s"${tmp(s"graft-zorder-$tag")}/t"
      (for (a <- 0 until 64; b <- 0 until 64)
        yield (a.toLong * 64 + b, a.toLong, b.toLong, "2024-01-01"))
        .toDF("event_id", "a", "b", "event_date")
        .repartition(16)
        .write.partitionBy("event_date").parquet(path)
      Snapshot.init(spark, path, "event_date", statsCols = Seq("a", "b"))
      path
    }
    def quarterTarget(path: String): Long = {
      val files = new java.io.File(s"$path/event_date=2024-01-01")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      files.map(_.length).sum / 4 + 1
    }
    val lin = build("lin")
    Snapshot.compact(spark, lin, "event_date", quarterTarget(lin),
      sortCols = Seq("a"))
    val zed = build("zed")
    Snapshot.compact(spark, zed, "event_date", quarterTarget(zed),
      zOrderCols = Seq("a", "b"))
    val nLin = Snapshot.currentFiles(spark, lin)._2.size
    val nZed = Snapshot.currentFiles(spark, zed)._2.size
    assert(nLin > 1 && nZed > 1, s"fixture must keep several files: $nLin/$nZed")
    // leading-dimension slices prune on BOTH layouts
    assert(Snapshot.filesInRanges(spark, lin, Seq(("a", 0L, 15L))).size < nLin)
    assert(Snapshot.filesInRanges(spark, zed, Seq(("a", 0L, 15L))).size < nZed)
    // the SECOND dimension prunes only under the Morton layout — the
    // linear sort leaves every file spanning b's full range
    assert(Snapshot.filesInRanges(spark, lin, Seq(("b", 0L, 15L))).size == nLin,
      "a linear layout cannot skip on the non-leading dimension")
    assert(Snapshot.filesInRanges(spark, zed, Seq(("b", 0L, 15L))).size < nZed,
      "the Morton layout must skip on the second dimension too")
    // pruned reads stay exact on the z layout, both dimensions
    def evs(df: org.apache.spark.sql.DataFrame) = ids(df)
    assert(evs(Snapshot.readSnapshotRanges(spark, zed, Seq(("b", 0L, 15L)))
        .where(col("b") <= 15L)) ==
      evs(Snapshot.readSnapshot(spark, zed).where(col("b") <= 15L)))
    assert(evs(Snapshot.readSnapshotRanges(spark, zed, Seq(("a", 0L, 15L)))
        .where(col("a") <= 15L)) ==
      evs(Snapshot.readSnapshot(spark, zed).where(col("a") <= 15L)))
  }

  test("null-count stats: IS NULL / IS NOT NULL plan strictly smaller subsets, min/max alone cannot") {
    import spark.implicits._
    val path = s"${tmp("graft-nullstats")}/t"
    // three files: aux all-NULL, aux all-set, aux mixed
    def rows(ids: Seq[Long], aux: Long => Option[Long]) =
      ids.map(i => (i, aux(i), "2024-01-01"))
        .toDF("event_id", "aux", "event_date").coalesce(1)
    rows(0L to 9L, _ => None)
      .write.partitionBy("event_date").parquet(path)
    Snapshot.init(spark, path, "event_date", statsCols = Seq("aux"),
      nullCounts = true)
    Snapshot.append(spark, path, "event_date",
      rows(10L to 19L, i => Some(i)))
    Snapshot.append(spark, path, "event_date",
      rows(20L to 29L, i => if (i % 2 == 0) Some(i) else None))
    assert(Snapshot.currentFiles(spark, path)._2.size == 3)
    val isNull = Snapshot.filesInRanges(spark, path, Nil,
      isNull = Seq("aux"))
    val isNotNull = Snapshot.filesInRanges(spark, path, Nil,
      isNotNull = Seq("aux"))
    assert(isNull.size == 2, s"IS NULL must skip the all-set file: $isNull")
    assert(isNotNull.size == 2,
      s"IS NOT NULL must skip the all-NULL file: $isNotNull")
    // an all-NULL file records no bounds, so a RANGE alone must keep it
    // — the null tier is what finally skips it
    val rangeOnly = Snapshot.filesInRanges(spark, path, Seq(("aux", 10L, 19L)))
    assert(rangeOnly.size == 2,
      s"range keeps the boundless all-NULL file: $rangeOnly")
    val rangeAndNotNull = Snapshot.filesInRanges(spark, path,
      Seq(("aux", 10L, 19L)), isNotNull = Seq("aux"))
    assert(rangeAndNotNull.size == 1,
      s"range ∧ IS NOT NULL must reach one file: $rangeAndNotNull")
    // pruned reads stay exact against the full read + exact predicate
    def evs(df: org.apache.spark.sql.DataFrame) = ids(df)
    assert(evs(Snapshot.readSnapshotRanges(spark, path, Nil,
        isNull = Seq("aux")).where(col("aux").isNull)) ==
      evs(Snapshot.readSnapshot(spark, path).where(col("aux").isNull)))
    assert(evs(Snapshot.readSnapshotRanges(spark, path, Nil,
        isNotNull = Seq("aux")).where(col("aux").isNotNull)) ==
      evs(Snapshot.readSnapshot(spark, path).where(col("aux").isNotNull)))
    // a layout WITHOUT the nullCounts declaration keeps everything —
    // nullability clauses are conservative, never wrong
    val plain = s"${tmp("graft-nullstats-off")}/t"
    rows(0L to 9L, _ => None).write.partitionBy("event_date").parquet(plain)
    Snapshot.init(spark, plain, "event_date", statsCols = Seq("aux"))
    Snapshot.append(spark, plain, "event_date", rows(10L to 19L, i => Some(i)))
    assert(Snapshot.filesInRanges(spark, plain, Nil,
      isNull = Seq("aux")).size == 2)
  }

  test("STRING stats column prunes categorical slices; LONG and STRING columns coexist") {
    import spark.implicits._
    val path = s"${tmp("graft-strstats")}/cats"
    def cell(tpe: String, base: Long) =
      (0 until 8).map(k => (base + k, tpe, base + k, "2024-01-01"))
        .toDF("event_id", "event_type", "user_id", "event_date")
    cell("alpha", 0L).coalesce(1)
      .write.partitionBy("event_date").parquet(path)
    // mixed declaration: col 0 LONG (user_id), col 1 STRING (event_type)
    Snapshot.init(spark, path, "event_date",
      statsCols = Seq("user_id", "event_type"))
    Snapshot.append(spark, path, "event_date", cell("beta", 100L).coalesce(1))
    Snapshot.append(spark, path, "event_date", cell("gamma", 200L).coalesce(1))
    assert(Snapshot.currentFiles(spark, path)._2.size == 3)
    // string pruning: point slice → one file; range → two
    assert(Snapshot.filesInStringRange(spark, path, "event_type",
      "beta", "beta").size == 1)
    assert(Snapshot.filesInStringRange(spark, path, "event_type",
      "alpha", "beta").size == 2)
    // the string bounds at index 1 must not break the LONG planner at
    // index 0 (lenient numeric parse)
    assert(Snapshot.filesInRanges(spark, path,
      Seq(("user_id", 100L, 107L))).size == 1)
    // the pruned read stays exact under the usual superset contract
    val pruned = Snapshot.readSnapshotStringRange(spark, path,
        "event_type", "beta", "beta")
      .where(col("event_type") === "beta")
    assert(pruned.inputFiles.length == 1)
    assert(ids(pruned) == ids(Snapshot.readSnapshot(spark, path)
      .where(col("event_type") === "beta")))
  }

  test("string bounds: truncation is conservative, exotic bytes round-trip, byte order is Spark's") {
    import spark.implicits._
    // manifest-format safety: bounds with tabs/newlines/percent/UTF-8
    val weird = "a\tb\n%é中"
    val path = s"${tmp("graft-strweird")}/cats"
    Seq((1L, weird, "2024-01-01"), (2L, "zz", "2024-01-01"))
      .toDF("event_id", "event_type", "event_date").coalesce(1)
      .write.partitionBy("event_date").parquet(path)
    Snapshot.init(spark, path, "event_date", statsCols = Seq("event_type"))
    // the layout still resolves (parseable manifest) and the weird
    // value's file is found by its own point slice
    assert(Snapshot.filesInStringRange(spark, path, "event_type",
      weird, weird).size == 1)
    assert(Snapshot.filesInStringRange(spark, path, "event_type",
      "zzz", "zzz").isEmpty, "slice past max must prune")
    // encode/decode round-trip at the byte level
    val bs = weird.getBytes("UTF-8")
    assert(Snapshot.decStrBound(Snapshot.encStrBound(bs)).sameElements(bs))
    // truncation: lower is a <=-prefix; upper increments after truncate
    val long1 = "x" * 100 + "m"
    val lower = Snapshot.strLowerBound(long1)
    assert(lower.length == 64 && Snapshot.cmpBytes(lower,
      long1.getBytes("UTF-8")) < 0)
    val upper = Snapshot.strUpperBound(long1).get
    assert(Snapshot.cmpBytes(upper, long1.getBytes("UTF-8")) > 0,
      "incremented truncation must upper-bound the full value")
    // end-to-end conservative: a file of >cap-length strings must be
    // KEPT for a probe between its true bounds
    val path2 = s"${tmp("graft-strtrunc")}/cats"
    Seq((1L, "x" * 100 + "a", "2024-01-01"), (2L, "x" * 100 + "z", "2024-01-01"))
      .toDF("event_id", "event_type", "event_date").coalesce(1)
      .write.partitionBy("event_date").parquet(path2)
    Snapshot.init(spark, path2, "event_date", statsCols = Seq("event_type"))
    assert(Snapshot.filesInStringRange(spark, path2, "event_type",
      "x" * 100 + "m", "x" * 100 + "m").size == 1,
      "truncated bounds must keep a file containing the probe")
    assert(Snapshot.filesInStringRange(spark, path2, "event_type",
      "y", "y").isEmpty, "pruning still works past the truncation point")
  }

  test("an append inherits ALL declared stats columns; its files prune on the second column") {
    import spark.implicits._
    val path = s"${tmp("graft-statinherit")}/grid"
    (0 until 10).map(k => (k.toLong, k.toLong, 100L + k, "2024-01-01"))
      .toDF("event_id", "a", "b", "event_date").coalesce(1)
      .write.partitionBy("event_date").parquet(path)
    Snapshot.init(spark, path, "event_date", statsCols = Seq("a", "b"))
    Snapshot.append(spark, path, "event_date",
      (0 until 10).map(k => (100L + k, k.toLong, 500L + k, "2024-01-01"))
        .toDF("event_id", "a", "b", "event_date").coalesce(1))
    // both files overlap on `a`; only the appended file covers b≥500
    assert(Snapshot.filesInRanges(spark, path, Seq(("a", 0L, 9L))).size == 2)
    assert(Snapshot.filesInRanges(spark, path, Seq(("b", 500L, 509L))).size == 1)
  }

  // -----------------------------------------------------------------
  // Metadata-only aggregates: exact, DV-aware, ZERO data-file IO
  // -----------------------------------------------------------------

  test("partitionStats answers exactly from the manifest — even after every data file is destroyed") {
    import spark.implicits._
    val path = s"${tmp("graft-pstats")}/events_by_date"
    Seq((1L, Option(10L), "2024-01-01"), (2L, Option.empty[Long], "2024-01-01"),
        (3L, Option(30L), "2024-01-01"), (4L, Option(40L), "2024-01-02"),
        (5L, Option.empty[Long], "2024-01-02"), (6L, Option(60L), "2024-01-02"))
      .toDF("event_id", "aux", "event_date")
      .repartition(2, col("event_id"))
      .write.partitionBy("event_date").parquet(path)
    val v1 = Snapshot.init(spark, path, "event_date",
      statsCols = Seq("event_id", "aux"), nullCounts = true)
    def statsOf(v: Long): Map[String, org.apache.spark.sql.Row] =
      Snapshot.partitionStatsAt(spark, path, v).collect()
        .map(r => r.getString(0) -> r).toMap
    val full = statsOf(v1)
    val p1 = full("event_date=2024-01-01")
    assert(p1.getAs[Long]("n_rows") == 3L && p1.getAs[Long]("n_live") == 3L)
    assert(p1.getAs[Long]("min_event_id") == 1L &&
      p1.getAs[Long]("max_event_id") == 3L)
    assert(p1.getAs[Long]("min_aux") == 10L &&
      p1.getAs[Long]("max_aux") == 30L)
    assert(p1.getAs[Long]("nulls_aux") == 1L)
    val p2 = full("event_date=2024-01-02")
    assert(p2.getAs[Long]("n_rows") == 3L &&
      p2.getAs[Long]("min_aux") == 40L && p2.getAs[Long]("nulls_aux") == 1L)

    // a deletion vector keeps COUNTS exact (hidden rows read from the
    // sidecar, O(deleted)) while the touched partition's value stats
    // degrade to NULL — a hidden row may have held the extreme
    val (v2, marked) =
      Snapshot.deleteWhereMoR(spark, path, "event_date", col("event_id") === 4L)
    assert(marked == 1L)
    val post = statsOf(v2)
    val q2 = post("event_date=2024-01-02")
    assert(q2.getAs[Long]("n_rows") == 3L && q2.getAs[Long]("n_hidden") == 1L &&
      q2.getAs[Long]("n_live") == 2L)
    assert(q2.isNullAt(q2.fieldIndex("min_event_id")) &&
      q2.isNullAt(q2.fieldIndex("nulls_aux")),
      "DV-touched partition must degrade value stats to NULL, never guess")
    val q1 = post("event_date=2024-01-01")
    assert(q1.getAs[Long]("n_live") == 3L &&
      q1.getAs[Long]("min_event_id") == 1L,
      "untouched partition keeps exact stats through a sibling's DV")

    // THE ZERO-DATA-IO PIN: truncate every data file to nothing — any
    // read would now fail, but both versions' stats still answer byte-
    // for-byte, because they never open a data file
    val dirFs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(dirFs.nonEmpty)
    dirFs.foreach { f =>
      val w = new java.io.FileOutputStream(f)
      try w.write("not a parquet file".getBytes) finally w.close()
    }
    intercept[Exception](
      Snapshot.readVersion(spark, path, v1).count(): Unit)
    assert(statsOf(v1)("event_date=2024-01-01").getAs[Long]("n_rows") == 3L)
    assert(statsOf(v2)("event_date=2024-01-02").getAs[Long]("n_live") == 2L)
  }

  test("recorded sort order drives maintenance by default: an argument-less compact preserves Morton skipping") {
    import spark.implicits._
    val path = s"${tmp("graft-sortorder")}/t"
    (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong * 64 + b, a.toLong, b.toLong, "2024-01-01"))
      .toDF("event_id", "a", "b", "event_date")
      .repartition(16)
      .write.partitionBy("event_date").parquet(path)
    // the layout DECLARES its clustering once — ALTER TABLE WRITE
    // ORDERED BY, recorded in the manifest
    Snapshot.init(spark, path, "event_date", statsCols = Seq("a", "b"),
      zOrderSortCols = Seq("a", "b"))
    assert(Snapshot.sortOrder(spark, path) == (Nil, Seq("a", "b")))
    val target = new java.io.File(s"$path/event_date=2024-01-01")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.length).sum / 4 + 1
    // NO clustering arguments: the rewrite must resolve the recorded
    // order — without it this compact would hash-order the rows and
    // destroy both dimensions' skipping
    Snapshot.compact(spark, path, "event_date", target)
    val n = Snapshot.currentFiles(spark, path)._2.size
    assert(n > 1, s"fixture must keep several files, got $n")
    assert(Snapshot.filesInRanges(spark, path, Seq(("a", 0L, 15L))).size < n)
    assert(Snapshot.filesInRanges(spark, path, Seq(("b", 0L, 15L))).size < n,
      "the recorded Morton order must survive an argument-less compact")
    // the recorded order survives the commit (inherited meta)
    assert(Snapshot.sortOrder(spark, path) == (Nil, Seq("a", "b")))
  }

  test("countRange: interior files answer from the manifest (zero IO), only straddlers scan") {
    import spark.implicits._
    val path = s"${tmp("graft-countrange")}/t"
    // three id-disjoint files: [1,10], [11,20], [21,30]
    (0 until 3).foreach { b =>
      Seq.tabulate(10)(i => (b * 10L + i + 1, "2024-01-01"))
        .toDF("event_id", "event_date").coalesce(1)
        .write.mode("append").partitionBy("event_date").parquet(path)
    }
    Snapshot.init(spark, path, "event_date", statsCols = Seq("event_id"),
      nullCounts = true)
    // fully-interior range: the answer is pure metadata
    val r1 = Snapshot.countRange(spark, path, "event_id", 1L, 20L)
    assert(r1 == Snapshot.CountRangeResult(20L, 3L, 0L))
    // a straddling range scans ONLY the straddlers
    val r2 = Snapshot.countRange(spark, path, "event_id", 5L, 25L)
    assert(r2.count == 21L && r2.scannedFiles == 2L && r2.metadataFiles == 1L)
    // a DV-touched file loses its metadata shortcut but the answer
    // stays exact
    Snapshot.deleteWhereMoR(spark, path, "event_date",
      col("event_id") === 15L)
    val r3 = Snapshot.countRange(spark, path, "event_id", 1L, 20L)
    assert(r3.count == 19L && r3.scannedFiles == 1L)
    // the ZERO-IO pin: destroy every data file — the interior answer
    // still serves (only ranges needing a scan now fail)
    new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        val w = new java.io.FileOutputStream(f)
        try w.write("garbage".getBytes) finally w.close()
      }
    assert(Snapshot.countRange(spark, path, "event_id", 21L, 30L)
      == Snapshot.CountRangeResult(10L, 3L, 0L))
  }
}
