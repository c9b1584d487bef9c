package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k: keeps the k smallest (sort_key, payload)
  * pairs, ordered lexicographically, as a TypedImperativeAggregate.
  *
  * Why not `row_number() OVER (PARTITION BY g ORDER BY ...)`: a rank
  * window sorts EVERY row of a group on one task, so per-key top-k at
  * raw-row grain inherits the group skew — one hot key (a domain with
  * 10⁹ documents) is one task sorting the whole key even though only k
  * rows survive. This aggregate's state is at most k pairs per group
  * PER AGGREGATION SITE: map-side partial aggregation caps what each
  * mapper emits at k pairs per key, the shuffle carries ≤ mappers·k
  * rows per key instead of the key's full row count, and the reduce
  * side merges k-bounded buffers. Skew changes nothing — a hot key
  * costs each mapper the same k-bounded heap as a cold one.
  *
  * Why not `slice(array_sort(collect_list(...)), 1, k)`: collect_list's
  * partial state is the UNBOUNDED group slice — the truncation happens
  * after the full list is materialized and shuffled, which is exactly
  * the failure this exists to avoid.
  *
  * Sort key: BIGINT or DOUBLE. Doubles are carried internally as the
  * order-preserving IEEE-754→long transform (flip the low 63 bits of
  * negative-sign patterns: `bits ^ ((bits >> 63) & Long.MaxValue)`, an
  * involution), so the long-ordered heap IS double order; eval inverts
  * the transform, returning the exact input double. ±0.0 collapse to
  * +0.0 before the transform so numerically-equal keys tie (and break
  * on payload) exactly as a SQL ORDER BY would. NaN keys sort greatest
  * — the same "largest double" rank Spark's ascending sort gives them
  * — so they are kept only when a group has fewer than k finite keys.
  * Descending top-k (largest cosine first) is the caller negating the
  * key: `of(-cosine, id, k)` keeps the k largest cosines in descending
  * order, ties broken by ascending payload, and `-key` on the output
  * recovers the exact cosine (IEEE negation is lossless).
  *
  * Payload: a non-null BIGINT, or a struct of non-null BIGINTs when a
  * group needs extra columns carried through the aggregation (ordering
  * is lexicographic across the struct fields, so putting a unique id
  * first keeps tie-breaks identical to the single-payload form while
  * trailing fields ride along to the output).
  *
  * Determinism: pairs are totally ordered (the leading payload field is
  * a unique id in every use here), so the k smallest are well-defined
  * regardless of partitioning or merge order — the buffer is a max-heap
  * of the current k best, and merge is elementwise offer.
  *
  * Null keys or payloads are skipped, matching rank-window rows that
  * sort last.
  */
case class TopKSmallest(
    keyChild: Expression,
    payloadChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKSmallest.Buffer]
  with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = keyChild
  override def right: Expression = payloadChild
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKSmallest =
    copy(keyChild = newLeft, payloadChild = newRight)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSmallest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSmallest =
    copy(inputAggBufferOffset = newOffset)

  override def checkInputDataTypes(): TypeCheckResult = {
    val keyOk = keyChild.dataType match {
      case LongType | DoubleType => true
      case _ => false
    }
    val payloadOk = payloadChild.dataType match {
      case LongType => true
      case s: StructType => s.nonEmpty && s.forall(_.dataType == LongType)
      case _ => false
    }
    if (!keyOk) TypeCheckResult.TypeCheckFailure(
      s"topk_smallest key must be BIGINT or DOUBLE, got ${keyChild.dataType}")
    else if (!payloadOk) TypeCheckResult.TypeCheckFailure(
      s"topk_smallest payload must be BIGINT or a struct of BIGINTs, " +
        s"got ${payloadChild.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def keyIsDouble: Boolean = keyChild.dataType == DoubleType

  /** Payload arity: 1 for the bare-BIGINT form, field count for structs. */
  private def payloadWidth: Int = payloadChild.dataType match {
    case s: StructType => s.length
    case _ => 1
  }

  override def dataType: DataType = ArrayType(
    new StructType().add("key", keyChild.dataType, nullable = false)
      .add("payload", payloadChild.dataType, nullable = false),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_smallest"

  override def createAggregationBuffer(): TopKSmallest.Buffer =
    new TopKSmallest.Buffer(k, payloadWidth)

  override def update(
      buffer: TopKSmallest.Buffer, input: InternalRow): TopKSmallest.Buffer = {
    val kv = keyChild.eval(input)
    val pv = payloadChild.eval(input)
    if (kv != null && pv != null) {
      val key = kv match {
        case d: Double => TopKSmallest.sortableOf(d)
        case l: Long => l
      }
      val payload = pv match {
        case row: InternalRow =>
          val arr = new Array[Long](row.numFields)
          var i = 0
          var ok = true
          while (i < arr.length) {
            if (row.isNullAt(i)) ok = false else arr(i) = row.getLong(i)
            i += 1
          }
          if (ok) arr else null
        case l: Long => Array(l)
      }
      if (payload != null) buffer.offer(key, payload)
    }
    buffer
  }

  override def merge(
      buffer: TopKSmallest.Buffer,
      other: TopKSmallest.Buffer): TopKSmallest.Buffer = {
    other.foreach(buffer.offer)
    buffer
  }

  override def eval(buffer: TopKSmallest.Buffer): Any = {
    val doubleKey = keyIsDouble
    val structPayload = payloadChild.dataType.isInstanceOf[StructType]
    new GenericArrayData(buffer.sortedEntries.map { e =>
      val keyOut: Any =
        if (doubleKey) TopKSmallest.doubleOf(e.key) else e.key
      val payloadOut: Any =
        if (structPayload)
          new GenericInternalRow(e.payload.map(l => l: Any))
        else e.payload(0)
      new GenericInternalRow(Array[Any](keyOut, payloadOut))
    })
  }

  override def serialize(buffer: TopKSmallest.Buffer): Array[Byte] = {
    val entries = buffer.sortedEntries
    val w = payloadWidth
    val bb = ByteBuffer.allocate(4 + entries.length * 8 * (1 + w))
    bb.putInt(entries.length)
    entries.foreach { e =>
      bb.putLong(e.key)
      var i = 0
      while (i < w) { bb.putLong(e.payload(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKSmallest.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val w = payloadWidth
    val buf = new TopKSmallest.Buffer(k, w)
    var i = 0
    while (i < n) {
      val key = bb.getLong
      val payload = new Array[Long](w)
      var j = 0
      while (j < w) { payload(j) = bb.getLong; j += 1 }
      buf.offer(key, payload)
      i += 1
    }
    buf
  }
}

object TopKSmallest {

  /** Order-preserving IEEE-754 double → signed long: non-negative bit
    * patterns pass through, negative-sign patterns get their low 63
    * bits flipped so more-negative doubles map to more-negative longs.
    * ±0.0 collapse to +0.0 first (SQL ordering treats them equal). The
    * transform is an involution; [[doubleOf]] is the same operation. */
  def sortableOf(d: Double): Long = {
    val n = if (d == 0.0) 0.0 else d
    val b = java.lang.Double.doubleToLongBits(n)
    b ^ ((b >> 63) & Long.MaxValue)
  }

  /** Inverse of [[sortableOf]] — exact, modulo the ±0.0 collapse. */
  def doubleOf(l: Long): Double =
    java.lang.Double.longBitsToDouble(l ^ ((l >> 63) & Long.MaxValue))

  final case class Entry(key: Long, payload: Array[Long])

  private def compareEntries(a: Entry, b: Entry): Int = {
    val c = java.lang.Long.compare(a.key, b.key)
    if (c != 0) return c
    var i = 0
    while (i < a.payload.length) {
      val pc = java.lang.Long.compare(a.payload(i), b.payload(i))
      if (pc != 0) return pc
      i += 1
    }
    0
  }

  /** Max-heap of the current k smallest entries: offer rejects anything
    * not better than the worst once full, so state never exceeds k. */
  final class Buffer(k: Int, payloadWidth: Int) {
    private val heap = new java.util.PriorityQueue[Entry](
      math.min(k, 16),
      // max-heap: largest (key, payload) at the head, evicted first
      (a: Entry, b: Entry) => compareEntries(b, a))

    def offer(key: Long, payload: Array[Long]): Unit = {
      require(payload.length == payloadWidth,
        s"payload width ${payload.length} != $payloadWidth")
      val e = Entry(key, payload)
      if (heap.size < k) heap.offer(e)
      else if (compareEntries(e, heap.peek()) < 0) {
        heap.poll(); heap.offer(e)
      }
    }
    def offer(e: Entry): Unit = offer(e.key, e.payload)
    def foreach(f: Entry => Unit): Unit = heap.forEach(e => f(e))
    def sortedEntries: Array[Entry] =
      heap.toArray(Array.empty[Entry]).sortWith(compareEntries(_, _) < 0)
  }

  /** groupBy(...).agg(TopKSmallest.of(key, payload, k)) — ascending
    * array<struct<key,payload>> of the k smallest pairs per group. Key
    * may be BIGINT or DOUBLE; payload BIGINT or a struct of BIGINTs
    * (see the class scaladoc for ordering and the descending idiom). */
  def of(key: Column, payload: Column, k: Int): Column =
    Bridge.column(TopKSmallest(
      Bridge.expression(key), Bridge.expression(payload), k)
      .toAggregateExpression())
}
