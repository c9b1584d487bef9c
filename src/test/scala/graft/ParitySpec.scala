package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the reference-parity surface (Parity.scala) on
  * sf0.001. Value-level correctness is graded by the DuckDB oracle
  * (tools/check.py); these specs pin the structural semantics each
  * operator promises, so a regression fails fast in `sbt test`. */
class ParitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = SharedSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("every declared query returns rows on sf0.001") {
    SparkEntry.queries.keys.foreach { name =>
      assert(run(name).limit(1).count() == 1, s"$name returned no rows")
    }
  }

  test("q01 groups by (returnflag, linestatus) with positive sums") {
    val rows = run("q01_pricing_summary").collect()
    assert(rows.length <= 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q02 date_key is yyyyMMdd of date_actual, dates distinct") {
    val df = run("q02_dim_date")
    assert(df.count() == df.select("date_actual").distinct().count())
    val bad = df.where(
      col("date_key") =!= date_format(col("date_actual"), "yyyyMMdd").cast("int"))
    assert(bad.count() == 0)
  }

  test("q03 surrogate keys are dense 1..n in natural-key order") {
    val keys = run("q03_dim_customer_snowflake")
      .select("customer_sk").collect().map(_.getLong(0))
    assert(keys.sorted.sameElements(1L to keys.length))
  }

  test("q04 emits exactly one row per customer with orders") {
    val df = run("q04_keyed_dedup_first")
    assert(df.count() == df.select("o_custkey").distinct().count())
  }

  test("q05 fact row count == lineitem count (left joins never fan out)") {
    val li = graft.sources.Tables.load(spark, dir, "lineitem").count()
    assert(run("q05_fact_assembly").count() == li)
  }

  test("q08 adherence_ppm is exact integer division of the counts") {
    run("q08_schedule_adherence").collect().foreach { r =>
      val ppm = r.getAs[Long]("adherence_ppm")
      assert(ppm >= 0 && ppm <= 1000000L)
      assert(ppm == r.getAs[Long]("n_on_time") * 1000000L / r.getAs[Long]("n_total"))
    }
  }

  test("q10 keeps exactly bucket 3 of 20") {
    assert(run("q10_bucket_filter")
      .where(pmod(col("o_orderkey"), lit(20)) =!= 3).count() == 0)
  }

  test("q11 returns the global top 50 by totalprice") {
    val got = run("q11_top_k").agg(min("o_totalprice")).head().getDouble(0)
    val naive = graft.sources.Tables.load(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc).limit(50)
      .agg(min("o_totalprice")).head().getDouble(0)
    assert(got == naive)
    assert(run("q11_top_k").count() == 50)
  }

  test("q15 rank/row_number are consistent within each customer") {
    val bad = run("q15_window_rank")
      .where(col("price_rank") > col("price_rn"))
    assert(bad.count() == 0)
  }

  test("q17 anti-join excludes exactly the 1995 purchasers") {
    val df = run("q17_anti_join")
    val buyers95 = graft.sources.Tables.load(spark, dir, "orders")
      .where(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey").as("c_custkey")).distinct()
    assert(df.join(buyers95, Seq("c_custkey")).count() == 0)
    val total = graft.sources.Tables.load(spark, dir, "customer").count()
    assert(df.count() == total - buyers95.count())
  }
}
