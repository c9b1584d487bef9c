package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense 1..n surrogate keys WITHOUT a single-partition window.
  *
  * `row_number().over(Window.orderBy(...))` funnels the whole input
  * through one task — fine at dim scale, a straggler at 10⁷-10⁸ rows.
  * This is the scale path the Warehouse scaladoc promised: a global
  * sort (range partitioning + per-partition sort, fully distributed),
  * then each row's key = rows-before-it-globally + 1, assembled from
  * per-partition row counts:
  *
  *   - within its (range) partition a row's 0-based index is
  *     `monotonically_increasing_id() - (partition_id << 33)` — the id
  *     is partitionMask + row position, so the subtraction recovers the
  *     position without leaving Tungsten;
  *   - the rows BEFORE its partition are a running sum of per-partition
  *     counts — an O(#partitions)-row aggregate, windowed in one task
  *     over partition ids (never data), broadcast back.
  *
  * The r21 rewrite: the original implementation dropped to
  * `sorted.rdd.zipWithIndex()` + `createDataFrame`, which (a)
  * deserializes and re-encodes every row crossing the RDD boundary,
  * (b) runs an EAGER per-partition count job at construction time, and
  * (c) erases statistics and partitioning — the resulting
  * `Scan ExistingRDD` has unknown size, so every fact⋈dim join planned
  * as a SortMergeJoin that hash-shuffled the whole fact on the dim key
  * (q20 shuffled its full wide fact on o_custkey before the final
  * range sort re-shuffled it again). The DataFrame form keeps size
  * estimates (dims broadcast again), stays whole-stage-codegen'd, and
  * shares the sort exchange between the counts branch and the data
  * branch instead of recomputing the scan.
  *
  * Determinism: when `order` is a total order (a unique natural key —
  * what every call site has after natural-key dedup), the assignment
  * equals `row_number() OVER (ORDER BY order)` exactly, independent of
  * the input's partitioning AND of where the range sampler happens to
  * place partition boundaries — the key is "rows before this row in
  * the global sort order + 1", which no boundary placement can change
  * (asserted in SurrogateKeysSpec against the window form and under
  * adversarial repartitioning). The key column is prepended to the
  * schema.
  *
  * Replaces the reference's sink-side IDENTITY keys
  * (ddl_snowflake_schema.sql:3-82) like the window form did, but
  * without its scale ceiling.
  */
object SurrogateKeys {

  def dense(df: DataFrame, keyName: String, order: Seq[Column]): DataFrame = {
    val pidCol = s"__${keyName}_pid"
    val monoCol = s"__${keyName}_mono"
    val cntCol = s"__${keyName}_cnt"
    val offCol = s"__${keyName}_off"
    val sorted = df.sort(order: _*)
      .withColumn(pidCol, spark_partition_id().cast("long"))
      .withColumn(monoCol, monotonically_increasing_id())
    // rows before each partition: counts are O(#partitions) rows, so the
    // single-task running-sum window holds partition IDs, never data
    val w = Window.orderBy(col(pidCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col(pidCol))
      .agg(count(lit(1)).as(cntCol))
      .select(col(pidCol),
        coalesce(sum(col(cntCol)).over(w), lit(0L)).as(offCol))
    sorted
      .join(broadcast(offsets), Seq(pidCol))
      .withColumn(keyName,
        col(offCol) + (col(monoCol) - shiftleft(col(pidCol), 33)) + lit(1L))
      .select(col(keyName) +: df.columns.map(col): _*)
  }
}
