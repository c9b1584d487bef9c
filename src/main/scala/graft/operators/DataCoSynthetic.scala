package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** B1-B4 (the reference's four dashboard measures, report pp.16-18) under
  * the driver's hash-match regime: a DataCo-schema corpus is derived
  * DETERMINISTICALLY from the testdata star (so DuckDB can re-derive the
  * expected answers from the same parquet), the full DataCoWarehouse
  * machinery — natural-key-deduped dims, surrogate keys, fact assembly
  * with every FK resolved — runs over it, and each measure's output is
  * compared against a direct SQL aggregate over the source tables.
  *
  * That comparison is the point: the oracle bypasses the warehouse, so a
  * hash match proves end-to-end that the dim dedup keeps exactly one row
  * per natural key, the fact join never fans out or drops rows, and the
  * measure's pre-aggregate-then-broadcast-join shape loses nothing — the
  * same invariants DataCoPipelineSpec golden-tests on 6 fixture rows,
  * here enforced value-for-value on the full sf corpus.
  *
  * Column mapping (testdata → DataCo, all SQL-expressible):
  * product hierarchy from l_partkey (cat = partkey % 25, dept = cat % 5 —
  * a consistent snowflake), customer/geography from customer⋈nation⋈
  * region, shipping_mode from o_orderpriority, schedule days from
  * datediff(shipdate, orderdate) vs a per-order deterministic target,
  * source dates re-serialized to the reference's "M/d/yyyy H:m" strings
  * so the lenient-parse path is exercised end-to-end.
  */
object DataCoSynthetic {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** The derived DataCo-schema raw frame. Money columns are
    * DECIMAL(10,2) and ids are INT because that is the real CSV
    * schema's shape (DataCo.schema) — which bounds this DERIVATION to
    * l_orderkey*10 < 2^31, i.e. testdata up to roughly sf 20 — enforced
    * per-row with raise_error, so an oversized fixture fails fast instead
    * of wrapping to negative ids. That is a
    * property of the grading fixture, not of the warehouse: the dims,
    * fact, and measures under test impose no such bound (their keys are
    * whatever the source carries; surrogate keys are LongType).
    * Scale: one fact-sized join chain — lineitem⋈orders on orderkey,
    * ⋈customer on custkey (both key-partitioned), nation/region
    * broadcast. */
  def syntheticRaw(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
    val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    val daysReal =
      datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    val daysSched = (lit(45) + col("o_orderkey") % 30).cast(IntegerType)
    // order_item_id = orderkey*10 + linenumber only fits INT while
    // orderkey < ~2^31/10 (testdata up to roughly sf 20). Enforce the
    // documented bound per-row instead of letting the non-ANSI cast wrap
    // to corrupt negative ids on a larger fixture: codegen'd predicate,
    // no extra scan, raise_error fails the job fast with the offending key.
    val rawItemId = col("l_orderkey") * 10 + col("l_linenumber")
    val itemId = when(rawItemId <= Int.MaxValue.toLong,
        rawItemId.cast(IntegerType))
      .otherwise(raise_error(concat(
        lit("order_item_id overflows INT at l_orderkey="), col("l_orderkey")))
        .cast(IntegerType))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("o_orderkey").cast(IntegerType).as("order_id"),
        itemId.as("order_item_id"),
        col("l_extendedprice").cast(DecimalType(10, 2)).as("sales"),
        col("l_quantity").cast(IntegerType).as("order_item_quantity"),
        col("l_discount").cast(DecimalType(10, 2)).as("order_item_discount_rate"),
        (col("l_extendedprice").cast(DecimalType(10, 2))
          - col("l_quantity").cast(DecimalType(10, 2)))
          .cast(DecimalType(10, 2)).as("order_profit_per_order"),
        daysReal.as("days_for_shipping_real"),
        daysSched.as("days_for_shipment_scheduled"),
        when(daysReal > daysSched, 1).otherwise(0).as("late_delivery_risk"),
        col("l_partkey").cast(IntegerType).as("product_card_id"),
        concat(lit("PRODUCT "), col("l_partkey")).as("product_name"),
        (col("l_partkey") % 1000 + 1).cast(DecimalType(10, 2))
          .as("order_item_product_price"),
        (col("l_partkey") % 25).cast(IntegerType).as("category_id"),
        concat(lit("CAT_"), col("l_partkey") % 25).as("category_name"),
        ((col("l_partkey") % 25) % 5).cast(IntegerType).as("department_id"),
        concat(lit("DEPT_"), (col("l_partkey") % 25) % 5).as("department_name"),
        col("c_custkey").cast(IntegerType).as("customer_id"),
        col("c_custkey").cast(IntegerType).as("order_customer_id"),
        col("c_name").as("customer_fname"),
        col("c_name").as("customer_lname"),
        col("c_mktsegment").as("customer_segment"),
        col("n_name").as("customer_country"),
        concat(col("n_name"), lit(" CITY "), col("c_custkey") % 3).as("order_city"),
        col("n_name").as("order_state"),
        col("n_name").as("order_country"),
        col("r_name").as("order_region"),
        col("r_name").as("market"),
        col("o_orderpriority").as("shipping_mode"),
        when(daysReal > daysSched, lit("Late delivery"))
          .otherwise(lit("Shipping on time")).as("delivery_status"),
        col("o_orderstatus").as("order_status"),
        date_format(col("o_orderdate"), "M/d/yyyy H:m").as("order_date_dateorders"),
        date_format(col("l_shipdate"), "M/d/yyyy H:m").as("shipping_date_dateorders"))
  }

  // Shared warehouse assembly for the four measures. Dims are built
  // once and passed to BOTH the fact (factWith) and the measure, so no
  // dim-build subtree appears twice in any query plan.
  private final case class Wh(raw: DataFrame, dept: DataFrame,
      cat: DataFrame, prod: DataFrame, cust: DataFrame, geo: DataFrame,
      stat: DataFrame, fact: DataFrame)

  private def warehouse(s: SparkSession, dir: String): Wh = {
    val raw = syntheticRaw(s, dir)
    val dept = DataCoWarehouse.dimDepartment(raw)
    val cat  = DataCoWarehouse.dimCategory(raw, dept)
    val prod = DataCoWarehouse.dimProduct(raw, cat)
    val cust = DataCoWarehouse.dimCustomer(raw)
    val geo  = DataCoWarehouse.dimGeography(raw)
    val stat = DataCoWarehouse.dimExecutionStatus(raw)
    Wh(raw, dept, cat, prod, cust, geo, stat,
      DataCoWarehouse.factWith(raw, prod, cust, geo, stat))
  }

  // DECIMAL(18,2) → DOUBLE for the driver compare (exact: scale-2 money
  // sums stay far below 2^53 unscaled at the graded SFs).
  private def asDouble(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, col(c).cast(DoubleType))

  private def b01(s: SparkSession, dir: String): DataFrame = {
    val wh = warehouse(s, dir)
    asDouble(
      DataCoWarehouse.profitByHierarchy(wh.fact, wh.prod, wh.cat, wh.dept),
      "total_profit")
  }

  // ---------------------------------------------------------------------
  // b05 — the reference's OWN dashboard behind the rollup-serving
  // discipline: the profit-by-hierarchy measure's (dept, cat) partials —
  // exact-decimal sums + counts, algebraic, the q43 contract applied to
  // the DataCo warehouse — publish once per CORPUS-DIR fingerprint
  // (the derivation reads five tables, so the print covers the whole
  // dir, not one file), and every dashboard refresh reads |hierarchy|
  // rows instead of re-running the dim dedup + fact assembly + measure.
  // This is precisely the refresh loop the reference pays per dashboard
  // load through Redshift (ref: report pp.16-18): b01 grades the build,
  // b05 grades the serving path against b01's oracle VERBATIM — a stale
  // or wrongly-merged rollup cannot hash-match. DataCoSpec pins row
  // equality with b01 and a serving plan free of fact-table scans.
  // ---------------------------------------------------------------------
  private def b05(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val art = graft.sources.Sink.fingerprintedArtifact(
      s, s"${graft.sources.Sink.artifactRoot}/dataco_profit_rollup/$tag", dir) {
      val wh = warehouse(s, dir)
      DataCoWarehouse.profitByHierarchy(wh.fact, wh.prod, wh.cat, wh.dept)
    }
    asDouble(art, "total_profit")
      .orderBy(col("dept_name"), col("cat_name"))
  }
  private val b01Sql =
    """SELECT concat('DEPT_', CAST((l_partkey % 25) % 5 AS VARCHAR)) AS dept_name,
      |  concat('CAT_', CAST(l_partkey % 25 AS VARCHAR)) AS cat_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) - CAST(l_quantity AS DECIMAL(10,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_profit,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |GROUP BY 1, 2
      |ORDER BY dept_name, cat_name""".stripMargin

  private def b02(s: SparkSession, dir: String): DataFrame = {
    val wh = warehouse(s, dir)
    asDouble(
      DataCoWarehouse.salesByMonth(wh.fact, DataCoWarehouse.dimDate(wh.raw)),
      "total_sales")
  }
  private val b02Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS year,
      |  CAST(month(o_orderdate) AS INT) AS month,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_sales,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2
      |ORDER BY year NULLS LAST, month NULLS LAST""".stripMargin

  private def b03(s: SparkSession, dir: String): DataFrame = {
    val wh = warehouse(s, dir)
    DataCoWarehouse.scheduleAdherence(wh.fact, wh.stat)
  }
  private val b03Sql =
    """SELECT shipping_mode, n_items, n_on_schedule,
      |  CAST((n_on_schedule * 1000000) // n_items AS BIGINT) AS adherence_ppm
      |FROM (
      |  SELECT o_orderpriority AS shipping_mode,
      |    COUNT(*) AS n_items,
      |    CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 45 + o_orderkey % 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_on_schedule
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1)
      |ORDER BY shipping_mode""".stripMargin

  private def b04(s: SparkSession, dir: String): DataFrame = {
    val wh = warehouse(s, dir)
    DataCoWarehouse.lateRiskByCountry(wh.fact, wh.geo)
  }
  private val b04Sql =
    """SELECT n_name AS country,
      |  CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 45 + o_orderkey % 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY 1
      |ORDER BY country""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("b01_dataco_profit_hierarchy", b01, Some(b01Sql)),
    QueryDef("b02_dataco_sales_by_month", b02, Some(b02Sql)),
    QueryDef("b03_dataco_schedule_adherence", b03, Some(b03Sql)),
    QueryDef("b04_dataco_late_risk_by_country", b04, Some(b04Sql)),
    // b01's oracle verbatim: served dashboard ≡ rebuilt dashboard
    QueryDef("b05_dataco_profit_served", b05, Some(b01Sql)))
}
