package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-escalation timer for ARBITRARY graded slots (Bench covers the
  * headline set only): runs each named query against each given SF dir
  * with the noop sink (whole-plan materialization, Bench's rule) and
  * prints one line per (sf, slot, run). Two runs per slot — run 1
  * includes the fingerprinted store build, run 2 is the serving path —
  * so the escalation table can report both the amortized build and the
  * steady state. Usage:
  * `runMain graft.tools.ScaleBench <sfDir>[,<sfDir>...] <slot>[,<slot>...]`
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: ScaleBench <sfDir>[,<sfDir>...] <query>[,<query>...]")
    val sfDirs = args(0).split(",").toSeq.filter(_.nonEmpty)
    val names = args(1).split(",").toSeq.filter(_.nonEmpty)
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown slots: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfigs.foreach { case (k, v) =>
      builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- sfDirs; n <- names; run <- 1 to 2) {
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(n)(spark, sf)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"SCALE $sf $n run$run ${sec}%.2f s")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"SCALE $sf $n run$run FAILED ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
  }
}
