package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSparkSession}

/** The two `private[sql]` bridges graft's SQL DML layer needs, exposed
  * from inside the `org.apache.spark.sql` package tree — the standard
  * extension-library idiom (Delta ships under `org.apache.spark.sql
  * .delta`, Iceberg's Spark module under `org.apache.spark.sql
  * .catalyst.…`, both for exactly this reason): Spark 4 moved the
  * Expression↔Column seam behind `private[sql] ExpressionUtils`, and a
  * LogicalPlan only becomes a DataFrame through `private[sql]
  * Dataset.ofRows`. Nothing else from the private surface is touched,
  * and both wrapped calls are the stable idioms every Spark connector
  * relies on.
  *
  * Why the DML layer needs them: an analyzed `UPDATE`/`MERGE` hands us
  * resolved catalyst `Expression`s (assignment values, the ON
  * condition) and a resolved source `LogicalPlan`; executing through
  * the library's [[graft.sources.Snapshot]] primitives means turning
  * those back into the public `Column`/`DataFrame` vocabulary. */
object GraftShim {

  /** Wrap a catalyst expression as a public Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The catalyst expression behind a public Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over an analyzed logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Re-tag a batch DataFrame as a STREAMING one — the V1 `Source
    * .getBatch` contract (MicroBatchExecution asserts `isStreaming`),
    * met the way Delta's source meets it: compile the batch plan to
    * its InternalRow RDD and rebuild the frame with the streaming
    * flag. The compiled plan is spliced verbatim, so the batch-side
    * pruning (manifest file planning, DV subtraction) is preserved. */
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[ClassicSparkSession].internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
}
