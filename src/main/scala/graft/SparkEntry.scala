package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory aggregates every operator family:
  *  - [[operators.Parity]]     q01-q17: reference-parity surface (SURVEY §2)
  *  - [[operators.Warehouse]]  q18-q20: snowflake dims, junk dim, star fact
  *  - [[operators.TextOps]]    d01-d05: exact dedup + text analysis
  *  - [[operators.Dedup]]      n01-n04: MinHash/LSH, SimHash, Jaccard
  *  - [[operators.Similarity]] v01-v03: cosine top-k, near-dup, LSH-ANN
  *  - [[operators.Multimodal]] m01: binary-column plumbing
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    operators.Parity.defs ++
    operators.Warehouse.defs ++
    operators.Analytics.defs ++
    operators.TextOps.defs ++
    operators.Dedup.defs ++
    operators.Similarity.defs ++
    operators.Multimodal.defs

  /** Names benchmarked by graft.Bench each round. */
  val headlines: Seq[String] = allDefs.filter(_.headline).map(_.name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_profit_by_hierarchy")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
