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

    val base = s"/tmp/scratch82-${sys.props("user.name")}"
    if (!new java.io.File(base).exists()) {
      Tables.load(spark, sfDir, "events")
        .withColumn("event_date", to_date(col("ts")))
        .repartition(col("event_date"))
        .sortWithinPartitions(col("event_date"), col("ts"))
        .write.partitionBy("event_date").parquet(base)
    }
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("tv"))
    println("LOOP START")
    val t0 = System.nanoTime()
    (1 to 400).foreach { _ =>
      aggOf(spark.read.parquet(base))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"LOOP DONE avg=${(System.nanoTime() - t0) / 400e9}%.3f s/iter")
    spark.stop()
  }
}
