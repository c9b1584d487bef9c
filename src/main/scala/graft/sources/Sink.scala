package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Warehouse sinks. Replaces the reference's write patterns:
  *
  *  - TRUNCATE-then-append "soft overwrite" (S5, glue_master_etl.py:
  *    46-59 + 8 call sites) → atomic `mode(Overwrite)`; the reference's
  *    version leaves the table empty if the job dies mid-append.
  *  - driver-side hash-bucket append loops (glue_master_etl.py:150-162,
  *    352-362: the full plan re-executed once per bucket, 20-50×) →
  *    ONE write with `repartition(n, key)`; the shuffle's native hash
  *    partitioning is exactly the reference's pmod(hash(key), n) split,
  *    executed once.
  *
  * Scale: per-key repartitioning also sets up downstream co-located
  * reads; pair with partitionBy for predicate-prunable layouts.
  */
object Sink {

  /** Atomic overwrite (reference: TRUNCATE + append, non-atomic). */
  def overwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Single-pass keyed write: n shuffle partitions hashed on key — the
    * reference's N-bucket driver loop as one distributed write. */
  def overwriteBucketed(df: DataFrame, path: String, key: String, n: Int): Unit =
    df.repartition(n, col(key)).write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned layout for partition-pruned scans (the
    * 100 TB default: prune before you read). */
  def overwritePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** Catalog-backed bucketed + sorted table: two tables bucketed the
    * same way join with ZERO shuffle (no Exchange in the plan — proven
    * in SourcesSpec). At 100 TB this is the layout for fact↔fact joins
    * that recur on the same key: pay the partitioning once at write
    * time, never again at read time. */
  def saveBucketedTable(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .mode(SaveMode.Overwrite).saveAsTable(table)
}
