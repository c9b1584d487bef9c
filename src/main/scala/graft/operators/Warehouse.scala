package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's warehouse-build surface as self-contained Spark plans:
  * snowflake dimension chains with engine-generated surrogate keys, the
  * junk dimension, and star-schema fact assembly resolving every FK
  * in-engine.
  *
  * This is the architectural core of the rebuild (SURVEY §3.1-3.2): the
  * reference generates surrogate keys in the SINK (Redshift IDENTITY on
  * insert, ddl_snowflake_schema.sql:3-82) and therefore has to write
  * each dim, read it back over JDBC, and join the keys in
  * (glue_master_etl.py:117,128,245-289). Generating keys with
  * row_number() makes each dim one closed-form plan and deletes the
  * write→read-back→join dance entirely.
  *
  * Scale notes: surrogate keys come from [[SurrogateKeys.dense]]
  * (distributed sort + per-partition offsets) — same assignment as a
  * row_number window, no single-partition ceiling, so even a 10^8-row
  * dimension ranks in parallel. Fact-side joins broadcast every dim;
  * the fact itself only shuffles on its own join keys.
  */
object Warehouse {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------------
  // q18 — snowflake dim chain with parent-key resolution: segment (first
  // word of p_type) ← type ← part, the reference's dept ← cat ← product
  // shape (glue_master_etl.py:108-137, J1/J2 joins at :123,135). Each
  // level gets a dense row_number surrogate key; the child resolves its
  // parent FK by joining the parent's natural key — in-engine, no
  // read-back. Scale: all three levels are dims → broadcast joins.
  // ---------------------------------------------------------------------
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .withColumn("type_name", col("p_type"))
      .withColumn("seg_name", split(col("p_type"), " ").getItem(0))
    val seg = SurrogateKeys.dense(
      p.select(col("seg_name")).distinct(), "seg_sk", Seq(col("seg_name")))
    val typ = SurrogateKeys.dense(
      p.select(col("type_name"), col("seg_name")).distinct()
        .join(broadcast(seg), Seq("seg_name"), "left"),
      "type_sk", Seq(col("type_name")))
    p.join(broadcast(typ.select(col("type_name"), col("type_sk"), col("seg_sk"))),
        Seq("type_name"), "left")
      .select(col("p_partkey"), col("p_brand"), col("type_name"),
        col("type_sk"), col("seg_sk"))
      .orderBy(col("p_partkey"))
  }
  private val q18Sql =
    """WITH p AS (
      |  SELECT p_partkey, p_brand, p_type AS type_name,
      |    string_split(p_type, ' ')[1] AS seg_name
      |  FROM part),
      |seg AS (
      |  SELECT seg_name,
      |    row_number() OVER (ORDER BY seg_name) AS seg_sk
      |  FROM (SELECT DISTINCT seg_name FROM p)),
      |typ AS (
      |  SELECT row_number() OVER (ORDER BY type_name) AS type_sk,
      |    type_name, seg_sk
      |  FROM (SELECT DISTINCT type_name, seg_name FROM p) d
      |  LEFT JOIN seg USING (seg_name))
      |SELECT p_partkey, p_brand, type_name, type_sk, seg_sk
      |FROM p LEFT JOIN typ USING (type_name)
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // q19 — junk dimension: full-row distinct over low-cardinality flags
  // plus a derived indicator (the reference's execution-status junk dim,
  // glue_master_etl.py:166-172, A2 dedup). Scale: output is O(product of
  // flag cardinalities) — constant — after map-side partial distinct.
  // ---------------------------------------------------------------------
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val flags = o.select(
        col("o_orderstatus").as("order_status"),
        col("o_orderpriority").as("order_priority"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0).as("is_urgent"))
      .distinct()
    SurrogateKeys.dense(flags, "junk_sk",
        Seq(col("order_status"), col("order_priority")))
      .orderBy(col("junk_sk"))
  }
  private val q19Sql =
    """SELECT order_status, order_priority, is_urgent,
      |  CAST(row_number() OVER (ORDER BY order_status, order_priority) AS BIGINT) AS junk_sk
      |FROM (
      |  SELECT DISTINCT o_orderstatus AS order_status,
      |    o_orderpriority AS order_priority,
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_urgent
      |  FROM orders)
      |ORDER BY junk_sk""".stripMargin

  // ---------------------------------------------------------------------
  // q20 — star-schema fact assembly with every FK resolved in-engine
  // (entry point 2, glue_master_etl.py:291-348, minus the 5 JDBC
  // read-backs): date keys derived, customer/junk surrogate keys joined
  // from the dims built above, NULL FKs preserved via left joins.
  // Scale: the lineitem⋈orders shuffle is the only big exchange; the
  // junk dim (bounded flag-combo cardinality) is hint-broadcast, but the
  // customer dim GROWS with the data (10^7-10^8 rows at 100 TB, beyond
  // broadcast limits) so its join strategy is left to AQE — it still
  // broadcasts while the dim is small and switches to sort-merge beyond
  // the threshold instead of OOMing. No driver-side bucket loop (the
  // reference's 20-pass append at :352-362 is the shuffle's native
  // partitioning).
  // ---------------------------------------------------------------------
  private def q20(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val custDim = SurrogateKeys.dense(
      c.select(col("c_custkey")), "customer_sk", Seq(col("c_custkey")))
    val junk = q19(s, dir)
      .select(col("junk_sk"), col("order_status"), col("order_priority"))
    li.join(o, col("l_orderkey") === col("o_orderkey"), "left")
      .join(custDim, col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(junk),
        col("o_orderstatus") === col("order_status") &&
        col("o_orderpriority") === col("order_priority"), "left")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        DateKeys.dateKeyInt(col("o_orderdate")).as("order_date_key"),
        col("customer_sk"), col("junk_sk"),
        col("l_quantity").as("quantity"),
        (col("l_extendedprice").cast(DecimalType(18, 4))
          * (lit(1.0) - col("l_discount")).cast(DecimalType(18, 4)))
          .cast(DoubleType).as("revenue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
  private val q20Sql =
    """WITH cust_dim AS (
      |  SELECT row_number() OVER (ORDER BY c_custkey) AS customer_sk, c_custkey
      |  FROM customer),
      |junk AS (
      |  SELECT CAST(row_number() OVER (ORDER BY order_status, order_priority) AS BIGINT) AS junk_sk,
      |    order_status, order_priority
      |  FROM (
      |    SELECT DISTINCT o_orderstatus AS order_status,
      |      o_orderpriority AS order_priority
      |    FROM orders))
      |SELECT l_orderkey, l_linenumber,
      |  CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_date_key,
      |  customer_sk, junk_sk,
      |  l_quantity AS quantity,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4)) AS DOUBLE) AS revenue
      |FROM lineitem
      |LEFT JOIN orders ON l_orderkey = o_orderkey
      |LEFT JOIN cust_dim ON o_custkey = c_custkey
      |LEFT JOIN junk ON o_orderstatus = junk.order_status
      |              AND o_orderpriority = junk.order_priority
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q18_dim_snowflake_chain", q18, Some(q18Sql)),
    QueryDef("q19_junk_dim", q19, Some(q19Sql)),
    QueryDef("q20_fact_star", q20, Some(q20Sql), headline = true))
}
