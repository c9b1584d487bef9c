package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end warehouse build: referential integrity of the written
  * star schema — the property the reference could only eyeball in a BI
  * dashboard (SURVEY §5). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private lazy val outDir: String = {
    val d = Files.createTempDirectory("graft-warehouse").toFile
    d.deleteOnExit()
    Pipeline.run(spark, SharedSpark.sf0001, d.getAbsolutePath)
    d.getAbsolutePath
  }

  private def tbl(name: String) = spark.read.parquet(s"$outDir/$name")

  test("all 7 warehouse tables are written and non-empty") {
    Seq("dim_date", "dim_customer", "dim_segment", "dim_type", "dim_part",
      "dim_order_flags", "fact_lineitem").foreach { t =>
      assert(tbl(t).count() > 0, t)
    }
  }

  test("fact grain equals lineitem; every fact FK resolves to its dim") {
    val fact = tbl("fact_lineitem")
    val li = graft.sources.Tables.load(spark, SharedSpark.sf0001, "lineitem")
    assert(fact.count() == li.count())
    def orphans(fk: String, dim: String, pk: String): Long = {
      val keys = tbl(dim).select(col(pk).as("__pk"))
      fact.join(keys, fact(fk) === col("__pk"), "left_anti").count()
    }
    assert(orphans("customer_sk", "dim_customer", "customer_sk") == 0)
    assert(orphans("part_sk", "dim_part", "part_sk") == 0)
    assert(orphans("junk_sk", "dim_order_flags", "junk_sk") == 0)
    assert(orphans("order_date_key", "dim_date", "date_key") == 0)
    assert(orphans("ship_date_key", "dim_date", "date_key") == 0)
  }

  test("snowflake chain navigates: part -> type -> segment") {
    val joined = tbl("dim_part")
      .join(tbl("dim_type").select("type_sk", "seg_sk"), Seq("type_sk"))
      .join(tbl("dim_segment"), Seq("seg_sk"))
    assert(joined.count() == tbl("dim_part").count())
    // segment really is the first word of the part type
    assert(joined.where(
      col("seg_name") =!= split(col("p_type"), " ").getItem(0)).count() == 0)
  }

  test("surrogate keys are dense 1..n in every dimension") {
    Seq("dim_customer" -> "customer_sk", "dim_part" -> "part_sk",
      "dim_type" -> "type_sk", "dim_segment" -> "seg_sk",
      "dim_order_flags" -> "junk_sk").foreach { case (t, k) =>
      val keys = tbl(t).select(k).collect().map(_.getLong(0)).sorted
      assert(keys.sameElements(1L to keys.length), t)
    }
  }

  test("a BI query over the written warehouse matches the source-side answer") {
    // B2 sales-by-month through the star schema == direct source query
    val star = tbl("fact_lineitem")
      .join(tbl("dim_date"), col("order_date_key") === col("date_key"))
      .groupBy(col("year"), col("month"))
      .agg(sum(col("revenue")).as("rev"))
    val li = graft.sources.Tables.load(spark, SharedSpark.sf0001, "lineitem")
    val o = graft.sources.Tables.load(spark, SharedSpark.sf0001, "orders")
    val direct = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("year"),
        month(col("o_orderdate")).as("month"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,4)")
        * (lit(1.0) - col("l_discount")).cast("decimal(18,4)")).cast("double"))
        .as("rev"))
    val a = star.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val b = direct.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-6, k) }
  }

  test("runJdbc lands the whole warehouse in the serving database") {
    val dbDir = Files.createTempDirectory("graft-pipe-derby").toFile
    dbDir.deleteOnExit()
    val url = s"jdbc:derby:${dbDir.getAbsolutePath}/wh;create=true"
    Pipeline.runJdbc(spark, SharedSpark.sf0001, url, factPartitions = 2)
    val want = Pipeline.warehouse(spark, SharedSpark.sf0001)
    want.foreach { case (name, df) =>
      assert(graft.sources.Sink.jdbcRead(spark, url, name).count() == df.count(), name)
    }
    // refresh is idempotent: second run truncates, not doubles
    Pipeline.runJdbc(spark, SharedSpark.sf0001, url, factPartitions = 2)
    assert(graft.sources.Sink.jdbcRead(spark, url, "fact_lineitem").count()
      == want("fact_lineitem").count())
  }
}
