package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition timings for optimization work (r21). Not a
  * declared surface; safe to delete. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); once()
      val runs = Seq(once(), once(), once())
      println(f"$label%-46s min=${runs.min}%6.2f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    import org.apache.spark.sql.types._
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))
    def q05of(li: org.apache.spark.sql.DataFrame) = {
      val o = Tables.load(spark, sfDir, "orders")
      val p = Tables.load(spark, sfDir, "part")
      val su = Tables.load(spark, sfDir, "supplier")
      val c = Tables.load(spark, sfDir, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"), "left")
        .join(p, col("l_partkey") === col("p_partkey"), "left")
        .join(su, col("l_suppkey") === col("s_suppkey"), "left")
        .join(c, col("o_custkey") === col("c_custkey"), "left")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          graft.operators.DateKeys.dateKeyInt(col("o_orderdate")).as("odk"),
          graft.operators.DateKeys.dateKeyInt(col("l_shipdate")).as("sdk"),
          col("l_quantity"),
          (dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")))
            .cast(DoubleType).as("revenue"),
          upper(trim(col("p_brand"))).as("brand_norm"),
          col("p_type"), col("s_name"), col("c_name"), col("o_orderpriority"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }
    time("q05 plain load")(q05of(Tables.load(spark, sfDir, "lineitem")))
    time("q05 rebalanced fact")(q05of(Tables.loadHeavy(spark, sfDir, "lineitem")))
    // d28-like: trained-merge encode over documents
    val merges = graft.operators.Bpe.trainedMerges(spark, sfDir)
    def enc(docs: org.apache.spark.sql.DataFrame) =
      graft.operators.Bpe.encodeWith(docs, merges).orderBy(col("doc_id"))
    time("d28 plain")(enc(Tables.load(spark, sfDir, "documents")))
    time("d28 rebalanced")(enc(Tables.loadHeavy(spark, sfDir, "documents")))
    spark.stop()
  }
}
