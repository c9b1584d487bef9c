package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense 1..n surrogate keys WITHOUT a single-partition window.
  *
  * `row_number().over(Window.orderBy(...))` funnels the whole input
  * through one task — fine at dim scale, a straggler at 10⁷-10⁸ rows.
  * This is the scale path the Warehouse scaladoc promised: sort (range
  * partitioning + per-partition sort, fully distributed) then
  * zipWithIndex, which computes per-partition counts in one lightweight
  * pass and assigns each partition a starting offset — no partition
  * ever sees more than its share of rows, no driver-side data movement
  * (only the per-partition COUNTS cross the driver).
  *
  * Determinism: when `order` is a total order (a unique natural key —
  * what every call site has after natural-key dedup), the assignment
  * equals `row_number() OVER (ORDER BY order)` exactly, independent of
  * the input's partitioning (asserted in SurrogateKeysSpec against the
  * window form and under adversarial repartitioning). The key column is
  * prepended to the schema.
  *
  * Replaces the reference's sink-side IDENTITY keys
  * (ddl_snowflake_schema.sql:3-82) like the window form did, but
  * without its scale ceiling.
  */
object SurrogateKeys {

  def dense(df: DataFrame, keyName: String, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.sort(order: _*)
    val schema = StructType(
      StructField(keyName, LongType, nullable = false) +: sorted.schema.fields)
    val keyed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq((i + 1L) +: row.toSeq)
    }
    spark.createDataFrame(keyed, schema)
  }
}
