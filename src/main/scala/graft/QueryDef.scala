package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle over the same parquet tables.
  *
  * Contract (driver): the correctness gate sorts columns by name and
  * hash-compares values — so every computed column is aliased identically
  * on both sides, every query carries a deterministic ORDER BY, and
  * floating-point aggregates are computed in DECIMAL then cast to DOUBLE
  * so both engines produce bit-identical values.
  *
  * @param headline included in the per-round benchmark (Bench.scala)
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
