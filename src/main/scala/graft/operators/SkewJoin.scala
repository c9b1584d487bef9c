package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew
  * splitting isn't enough (extreme single-key hot spots, e.g. a null-ish
  * default key holding 10% of a 100 TB fact).
  *
  * Left (large, skewed) rows get a salt in [0, n) derived by hashing the
  * FULL row (xxhash64 over all columns — deterministic, so a retried
  * task re-derives the same salt; `rand(seed)` is only seeded per
  * PARTITION and re-rolls different values when a lost partition is
  * recomputed, which can silently duplicate/drop join rows under
  * retry). Right (small but not broadcastable) rows are replicated n×
  * with every salt; the join key becomes (key, salt), spreading each
  * hot key over n shuffle partitions. Result equals the plain equi-join
  * (asserted in the spec).
  *
  * Caveat: because the salt is a pure function of the row, BYTE-IDENTICAL
  * duplicate rows of a hot key all land on the same salt — if the hot
  * key's rows are uniform (plausible for the null-ish default-key case),
  * this spreads nothing. When a unique-ish column exists (event id, file
  * offset), include it in the row before salting or use `saltedBy`.
  *
  * Prefer, in order: broadcast (if the right side fits), AQE skew join
  * (spark.sql.adaptive.skewJoin, on by default), then this.
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, key: String, n: Int,
      joinType: String = "inner"): DataFrame =
    saltedBy(left, right, key, n, left.columns.toSeq, joinType)

  /** As [[salted]], but the salt hashes only `saltCols` — pass a
    * unique-ish column (event id, file offset) to spread hot keys whose
    * rows are otherwise byte-identical. Still deterministic under task
    * retry (the salt is a pure function of the named columns). */
  def saltedBy(left: DataFrame, right: DataFrame, key: String, n: Int,
      saltCols: Seq[String], joinType: String = "inner"): DataFrame = {
    require(n > 0)
    require(saltCols.nonEmpty)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(saltCols.map(col): _*), lit(n)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
