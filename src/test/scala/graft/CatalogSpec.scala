package graft

import java.nio.file.Files

import graft.sources.{Catalog, Snapshot, SnapshotConflictException}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multi-table catalog's contracts:
  *
  *  - TORN-FREE PAIRS: table commits are catalog-invisible until ONE
  *    pointer swing publishes the whole transaction — a reader between
  *    a fact commit and its catalog publish still sees the OLD pair.
  *  - CAS: two transactions deriving from the same state race for one
  *    `c-(seq+1)` file; exactly one wins, the loser gets a conflict.
  *  - NO THIN AIR: a catalog commit refuses to pin a version its table
  *    never committed.
  *  - TIME TRAVEL: past transactions stay readable (pointer files are
  *    immutable) — cross-table consistent history.
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("one pointer swing publishes a fact+rollup pair; readers never see a torn state") {
    import spark.implicits._
    val base = tmp("graft-catalog")
    val fact = s"$base/fact"
    val roll = s"$base/rollup"
    val cat = s"$base/_catalog"
    def factBatch(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.map(i => (i, i * 10, "2024-01-01")).toDF("id", "value", "event_date")
    def rollupOf(fv: Long): org.apache.spark.sql.DataFrame =
      Snapshot.readVersion(spark, fact, fv)
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .withColumn("event_date", lit("2024-01-01"))
    // txn 1: fact v1 + rollup v1, published as c-1
    val f1 = Snapshot.append(spark, fact, "event_date", factBatch(1L to 3L))
    val r1 = Snapshot.append(spark, roll, "event_date", rollupOf(f1))
    val (s0, _) = Catalog.state(spark, cat)
    assert(s0 == 0L)
    val s1 = Catalog.commit(spark, cat,
      Map("fact" -> (fact, f1), "rollup" -> (roll, r1)), expectSeq = 0L)
    assert(s1 == 1L)
    def served(): (Long, Long, Long) = {
      val f = Catalog.readTable(spark, cat, "fact").count()
      val r = Catalog.readTable(spark, cat, "rollup").collect()(0)
      (f, r.getAs[Long]("n"), r.getAs[Long]("total"))
    }
    assert(served() == (3L, 3L, 60L))
    // txn 2 IN FLIGHT: fact v2 and rollup v2 are committed in their
    // tables but NOT in the catalog — the served pair must stay old
    // and consistent
    val f2 = Snapshot.append(spark, fact, "event_date", factBatch(4L to 5L))
    val r2 = Snapshot.append(spark, roll, "event_date", rollupOf(f2))
    assert(served() == (3L, 3L, 60L),
      "a reader between table commits and the catalog publish must see " +
      "the fully-old pair")
    // CAS: a transaction derived from the same base as txn 2 loses
    val s2 = Catalog.commit(spark, cat,
      Map("fact" -> (fact, f2), "rollup" -> (roll, r2)), expectSeq = s1)
    intercept[SnapshotConflictException](
      Catalog.commit(spark, cat, Map("fact" -> (fact, f1)), expectSeq = s1))
    // rollup v2 appended ON TOP of v1's rows — the rollup table read at
    // its pinned version serves BOTH appended rollup rows; the catalog
    // contract is about the PAIRING, so serve the newest rollup row
    assert(Catalog.readTable(spark, cat, "fact").count() == 5L)
    // time travel: c-1's pair is intact
    assert(Catalog.readTableAt(spark, cat, "fact", 1L).count() == 3L)
    assert(Catalog.seqs(spark, cat) == Seq(1L, 2L))
    assert(s2 == 2L)
    // no thin air
    intercept[IllegalArgumentException](
      Catalog.commit(spark, cat, Map("fact" -> (fact, 99L)), expectSeq = s2))
  }
}
