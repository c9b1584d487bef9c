package graft

import java.nio.file.Files

import graft.sources.Snapshot
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** RENAME + TYPE-PROMOTION evolution contracts (the tier above q62's
  * add-column path): both are metadata-only commits, pre-evolution
  * files keep serving — renamed columns fold from their retired
  * physical names, promoted columns read natively widened — and every
  * consumer surface (snapshot read, predicate DML, manifest stats,
  * sort order, maintenance, time travel, change feed) follows the
  * manifest's CURRENT names. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def genA(path: String): Unit = {
    import spark.implicits._
    Snapshot.append(spark, path, "day", Seq(
      (1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"))
      .toDF("qty", "tag", "day")): Unit
  }

  test("rename serves pre-rename files under the new name; old name is gone; append continues under the new name") {
    val path = s"${tmp("graft-evo")}/t"
    genA(path)
    val v1 = Snapshot.currentVersion(spark, path).get
    Snapshot.renameColumn(spark, path, "qty", "quantity")

    val df = Snapshot.readSnapshot(spark, path)
    assert(df.columns.toSeq == Seq("quantity", "tag", "day"),
      s"post-rename columns: ${df.columns.mkString(",")}")
    // the silent-NULL trap: old files must serve their VALUES, not NULL
    assert(df.select(sum(col("quantity"))).as(
      org.apache.spark.sql.Encoders.scalaLong).head() == 6L)

    import spark.implicits._
    Snapshot.append(spark, path, "day",
      Seq((10, "d", "d2")).toDF("quantity", "tag", "day")): Unit
    val after = Snapshot.readSnapshot(spark, path)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(after == Set((1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"),
      (10, "d", "d2")))

    // time travel: the PRE-rename version keeps the OLD schema
    assert(Snapshot.schemaOf(spark, path, v1).get.fieldNames.toSeq
      == Seq("qty", "tag", "day"))
    assert(Snapshot.readVersion(spark, path, v1).columns.contains("qty"))
  }

  test("appending under the retired name is refused for the layout's life") {
    val path = s"${tmp("graft-evo-retired")}/t"
    genA(path)
    Snapshot.renameColumn(spark, path, "qty", "quantity")
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Snapshot.append(spark, path, "day",
        Seq((9, "x", "d1")).toDF("qty", "tag", "day"))
    }
    assert(e.getMessage.contains("RETIRED"))
  }

  test("rename refusals: partition column, existing name, retired name, unknown column, lineage column") {
    val path = s"${tmp("graft-evo-refuse")}/t"
    genA(path)
    intercept[IllegalArgumentException](
      Snapshot.renameColumn(spark, path, "day", "dt"))
    intercept[IllegalArgumentException](
      Snapshot.renameColumn(spark, path, "qty", "tag"))
    intercept[IllegalArgumentException](
      Snapshot.renameColumn(spark, path, "missing", "x"))
    intercept[IllegalArgumentException](
      Snapshot.renameColumn(spark, path, "qty", Snapshot.RowIdCol))
    Snapshot.renameColumn(spark, path, "qty", "quantity")
    // the retired name can never be a rename TARGET either
    val e = intercept[IllegalArgumentException](
      Snapshot.renameColumn(spark, path, "tag", "qty"))
    assert(e.getMessage.contains("RETIRED"))
  }

  test("rename chain a -> b -> c: both retired generations fold into the final name") {
    val path = s"${tmp("graft-evo-chain")}/t"
    genA(path) // files carry 'qty'
    Snapshot.renameColumn(spark, path, "qty", "quantity")
    import spark.implicits._
    Snapshot.append(spark, path, "day",
      Seq((10, "d", "d2")).toDF("quantity", "tag", "day")): Unit // files carry 'quantity'
    Snapshot.renameColumn(spark, path, "quantity", "amount")
    val df = Snapshot.readSnapshot(spark, path)
    assert(df.columns.toSeq == Seq("amount", "tag", "day"))
    val got = df.select(col("amount")).collect().map(_.getInt(0)).toSet
    assert(got == Set(1, 2, 3, 10),
      "a generation's physical column failed to fold into the final name")
  }

  test("promotion int->long is metadata-only: old int files read as LONG; both widths append afterwards; unsafe promotions refuse") {
    val path = s"${tmp("graft-evo-promote")}/t"
    genA(path)
    Snapshot.promoteColumn(spark, path, "qty", LongType)
    val df = Snapshot.readSnapshot(spark, path)
    assert(df.schema("qty").dataType == LongType)
    assert(df.select(sum(col("qty"))).as(
      org.apache.spark.sql.Encoders.scalaLong).head() == 6L)
    import spark.implicits._
    // wide batch appends; narrow batch still accepted (reads widened)
    Snapshot.append(spark, path, "day",
      Seq((4000000000L, "w", "d3")).toDF("qty", "tag", "day")): Unit
    Snapshot.append(spark, path, "day",
      Seq((7, "n", "d3")).toDF("qty", "tag", "day")): Unit
    assert(Snapshot.readSnapshot(spark, path).select(sum(col("qty"))).as(
      org.apache.spark.sql.Encoders.scalaLong).head() == 4000000013L)
    intercept[IllegalArgumentException](
      Snapshot.promoteColumn(spark, path, "qty", IntegerType))
    intercept[IllegalArgumentException](
      Snapshot.promoteColumn(spark, path, "tag", LongType))
    intercept[IllegalArgumentException](
      Snapshot.promoteColumn(spark, path, "day", LongType))
  }

  test("promotion by APPEND: a batch carrying the wider lattice type promotes the recorded schema in its own commit") {
    val path = s"${tmp("graft-evo-widen")}/t"
    import spark.implicits._
    Snapshot.append(spark, path, "day",
      Seq((1.5f, "a", "d1")).toDF("score", "tag", "day")): Unit
    Snapshot.append(spark, path, "day",
      Seq((2.25d, "b", "d2")).toDF("score", "tag", "day")): Unit
    val df = Snapshot.readSnapshot(spark, path)
    assert(df.schema("score").dataType == DoubleType)
    val got = df.select(col("score")).collect().map(_.getDouble(0)).toSet
    assert(got == Set(1.5d, 2.25d))
    // cross-family stays a loud conflict
    val e = intercept[IllegalArgumentException] {
      Snapshot.append(spark, path, "day",
        Seq(("x", "c", "d3")).toDF("score", "tag", "day"))
    }
    assert(e.getMessage.contains("safe promotion"))
  }

  test("rename + later promotion compose: retired files fold THROUGH the widened type") {
    val path = s"${tmp("graft-evo-compose")}/t"
    genA(path) // 'qty' int files
    Snapshot.renameColumn(spark, path, "qty", "quantity")
    Snapshot.promoteColumn(spark, path, "quantity", LongType)
    import spark.implicits._
    Snapshot.append(spark, path, "day",
      Seq((4000000000L, "w", "d3")).toDF("quantity", "tag", "day")): Unit
    val df = Snapshot.readSnapshot(spark, path)
    assert(df.schema("quantity").dataType == LongType)
    assert(df.select(sum(col("quantity"))).as(
      org.apache.spark.sql.Encoders.scalaLong).head() == 4000000006L)
  }

  test("manifest stats and sort order follow the rename; existing per-file bounds stay valid verbatim") {
    val base = tmp("graft-evo-stats")
    val path = s"$base/t"
    import spark.implicits._
    val rows = (1 to 40).map(i => (i, s"t$i", if (i <= 20) "d1" else "d2"))
      .toDF("qty", "tag", "day")
    rows.repartition(col("day")).sortWithinPartitions(col("qty"))
      .write.partitionBy("day").parquet(path)
    Snapshot.init(spark, path, "day", statsCols = Seq("qty"),
      sortOrderCols = Seq("qty")): Unit
    val before = Snapshot.filesInRanges(spark, path, Seq(("qty", 1L, 5L)))
    assert(before.nonEmpty)
    Snapshot.renameColumn(spark, path, "qty", "quantity")
    // the SAME positional bounds now answer to the new name...
    val after = Snapshot.filesInRanges(spark, path, Seq(("quantity", 1L, 5L)))
    assert(after == before,
      "rename re-keyed the stats declaration but the planned subset moved")
    // ...and the old name no longer resolves (no silent wrong-column plan)
    intercept[IllegalArgumentException](
      Snapshot.filesInRanges(spark, path, Seq(("qty", 1L, 5L))))
    assert(Snapshot.sortOrder(spark, path) == (Seq("quantity"), Seq.empty))
    // the pruned READ serves folded values
    val got = Snapshot.readSnapshotRanges(spark, path,
        Seq(("quantity", 1L, 5L)))
      .where(col("quantity").between(1, 5))
      .collect().map(_.getInt(0)).toSet
    assert(got == (1 to 5).toSet)
  }

  test("predicate DML reaches pre-rename rows through the fold (deleteWhereMoR)") {
    val path = s"${tmp("graft-evo-dml")}/t"
    genA(path)
    Snapshot.renameColumn(spark, path, "qty", "quantity")
    val (_, marked) = Snapshot.deleteWhereMoR(spark, path, "day",
      col("quantity") === 2)
    assert(marked == 1L,
      "predicate on the renamed column missed a pre-rename row")
    val left = Snapshot.readSnapshot(spark, path)
      .select(col("quantity")).collect().map(_.getInt(0)).toSet
    assert(left == Set(1, 3))
  }

  test("maintenance rewrite converges renamed files to the new physical name") {
    val path = s"${tmp("graft-evo-compact")}/t"
    import spark.implicits._
    // two small files in one partition so compact has something to pack
    Snapshot.append(spark, path, "day",
      Seq((1, "a", "d1")).toDF("qty", "tag", "day")): Unit
    Snapshot.append(spark, path, "day",
      Seq((2, "b", "d1")).toDF("qty", "tag", "day")): Unit
    Snapshot.renameColumn(spark, path, "qty", "quantity")
    val moved = Snapshot.compact(spark, path, "day", targetBytes = 1L << 30)
    assert(moved.nonEmpty, "compaction found nothing to rewrite")
    val (_, files) = Snapshot.currentFiles(spark, path)
    // read ONE rewritten file's own footer: the physical name converged
    val footer = spark.read.parquet(s"$path/${files.head}").schema
    assert(footer.fieldNames.contains("quantity") &&
      !footer.fieldNames.contains("qty"),
      s"rewritten file still carries the retired name: ${footer.fieldNames.mkString(",")}")
    val after = Snapshot.readSnapshot(spark, path)
      .select(col("quantity")).collect().map(_.getInt(0)).toSet
    assert(after == Set(1, 2))
  }

  test("equality-delete key columns cannot be renamed (sidecars carry them physically)") {
    val path = s"${tmp("graft-evo-eqk")}/t"
    import spark.implicits._
    Snapshot.append(spark, path, "day",
      Seq((1, "a", "d1"), (2, "b", "d1")).toDF("qty", "tag", "day"),
      meta = Map("eqdel" -> "on")): Unit
    Snapshot.deleteByKeys(spark, path, Seq(2).toDF("qty")): Unit
    val e = intercept[IllegalArgumentException](
      Snapshot.renameColumn(spark, path, "qty", "quantity"))
    assert(e.getMessage.contains("equality-delete key"))
    // non-key columns still rename freely on an eqdel layout
    Snapshot.renameColumn(spark, path, "tag", "label"): Unit
    val df = Snapshot.readSnapshot(spark, path)
    assert(df.columns.toSeq == Seq("qty", "label", "day"))
    assert(df.collect().map(r => (r.getInt(0), r.getString(1))).toSet
      == Set((1, "a")))
  }

  test("a key index over a renamed column fails loudly at refresh (the documented boundary: rebuild over the new name)") {
    import graft.sources.KeyIndex
    val base = tmp("graft-evo-kidx")
    val path = s"$base/t"
    val idx = s"$base/i"
    import spark.implicits._
    Snapshot.append(spark, path, "day",
      Seq((1L, "a", "d1"), (2L, "b", "d2")).toDF("k", "tag", "day")): Unit
    KeyIndex.refresh(spark, path, "k", idx, buckets = 4): Unit
    Snapshot.renameColumn(spark, path, "k", "key")
    // the indexed column no longer exists under its recorded name —
    // the REFRESH ITSELF fails loudly (eager key validation against
    // the current recorded schema, r18 ADVICE), even though this
    // metadata-only gap would have delta-refreshed to a no-op scan
    val er = intercept[IllegalArgumentException](
      KeyIndex.refresh(spark, path, "k", idx, buckets = 4))
    assert(er.getMessage.contains("RETIRED"), er.getMessage)
    // and a direct probe under the stale name dies too
    intercept[Exception](
      KeyIndex.lookup(spark, path, "k", idx, Seq(2L)).collect())
    // rebuilding over the NEW name works, and probes serve folded rows
    val idx2 = s"$base/i2"
    KeyIndex.refresh(spark, path, "key", idx2, buckets = 4): Unit
    val got = KeyIndex.lookup(spark, path, "key", idx2, Seq(2L))
      .select(col("key"), col("tag")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "b")))
  }

  test("the append feed crosses add-column and multi-change evolve commits (metadata-only, row-preserving)") {
    val path = s"${tmp("graft-evo-cross")}/t"
    import spark.implicits._
    Snapshot.append(spark, path, "day",
      Seq((1, "d1"), (2, "d1")).toDF("qty", "day")): Unit
    val v1 = Snapshot.currentVersion(spark, path).get
    Snapshot.addColumn(spark, path, "note",
      org.apache.spark.sql.types.StringType): Unit
    Snapshot.evolveSchema(spark, path, Seq(
      Snapshot.RenameCol("qty", "quantity"),
      Snapshot.AddCol("tag", org.apache.spark.sql.types.StringType))): Unit
    Snapshot.append(spark, path, "day",
      Seq((3, "n", "t", "d2")).toDF("quantity", "note", "tag", "day")): Unit
    val vNow = Snapshot.currentVersion(spark, path).get
    // the gap holds add-column + evolve-schema + one append — the
    // append feed attributes it (no resync), under the FINAL names,
    // old rows absent (they did not change)
    val feed = Snapshot.changes(spark, path, v1, vNow)
    assert(feed.columns.contains("quantity") && feed.columns.contains("tag"))
    assert(feed.select("quantity").collect().map(_.getInt(0)).toSeq ==
      Seq(3))
  }

  test("lineage change feed crosses a rename: a pre-rename version diffs to the post-rename one under the NEW names") {
    val path = s"${tmp("graft-evo-feed")}/t"
    import spark.implicits._
    Snapshot.append(spark, path, "day",
      Seq((1, "a", "d1"), (2, "b", "d1")).toDF("qty", "tag", "day"),
      meta = Map("rowids" -> "on")): Unit
    val v1 = Snapshot.currentVersion(spark, path).get
    Snapshot.renameColumn(spark, path, "qty", "quantity")
    Snapshot.append(spark, path, "day",
      Seq((3, "c", "d2")).toDF("quantity", "tag", "day")): Unit
    val v3 = Snapshot.currentVersion(spark, path).get
    val feed = Snapshot.changeDiffLineage(spark, path, v1, v3)
    assert(feed.columns.contains("quantity") && !feed.columns.contains("qty"))
    val inserts = feed.where(col("_change_type") === "insert")
      .select(col("quantity")).collect().map(_.getInt(0)).toSet
    assert(inserts == Set(3))
  }
}
