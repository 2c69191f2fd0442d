package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** The k smallest child values of a group, ascending — the
  * O(k)-state aggregate behind every "keep the cap smallest members"
  * trim (`slice(array_sort(collect_list(x)), 1, k)` computes the same
  * array but BUFFERS THE WHOLE GROUP first: a flood key at 100 TB
  * holds every member in one in-memory aggregation buffer that cannot
  * spill — the ADVICE r21 executor-OOM mode, and VERDICT r21 #3's ask).
  *
  * State per group is a ≤ k-element max-heap (the largest of the kept
  * k at the root, evicted when a smaller value arrives), so map-side
  * partial aggregation reduces ANY flood to k values per task before
  * the exchange, and the merge side holds tasks × k, never the flood.
  * Ordering is the child type's natural interpreted ordering — the
  * exact ordering array_sort uses — so the result array is
  * bit-identical to the collect-sort-slice form (ChunkSemanticSpec's
  * flood spec pins the trim set; FunctionsSpec pins the aggregate).
  *
  * Plans as ObjectHashAggregate (typed buffer). Its sort-based
  * fallback (past `spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold` distinct groups per task) is a spillable
  * per-task external sort — unlike the collect_list buffer, nothing
  * here ever holds a group's full membership.
  */
case class BoundedMinK(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedMinK.Buf]
    with UnaryLike[Expression] {

  require(k >= 1, s"bounded_min_k needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_min_k requires an orderable child, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_min_k"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): BoundedMinK.Buf =
    new BoundedMinK.Buf(k, ordering)

  override def update(buf: BoundedMinK.Buf, input: InternalRow): BoundedMinK.Buf = {
    val v = child.eval(input)
    if (v != null) buf.offer(v, copyBeforeKeep = true)
    buf
  }

  override def merge(buf: BoundedMinK.Buf, other: BoundedMinK.Buf): BoundedMinK.Buf = {
    other.foreachKept(v => buf.offer(v, copyBeforeKeep = false))
    buf
  }

  override def eval(buf: BoundedMinK.Buf): Any =
    new GenericArrayData(buf.sortedAscending)

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def serialize(buf: BoundedMinK.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    val copyBuf = new Array[Byte](4096)
    buf.foreachKept { v =>
      row.update(0, v)
      val u = proj(row)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, copyBuf)
    }
    out.writeInt(-1)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinK.Buf = {
    val buf = createAggregationBuffer()
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    var len = in.readInt()
    while (len >= 0) {
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val u = new UnsafeRow(1)
      u.pointTo(rowBytes, len)
      buf.offer(InternalRow.copyValue(u.get(0, child.dataType)),
        copyBeforeKeep = false)
      len = in.readInt()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedMinK =
    copy(child = newChild)
}

object BoundedMinK {

  /** ≤ k-element max-heap of kept values; root = largest kept, so a
    * smaller arrival evicts it in O(log k). Values handed to `offer`
    * with `copyBeforeKeep = true` are deep-copied ONLY when actually
    * kept (update-path values alias the scanner's reused row buffers;
    * merge/deserialize values are already owned).
    */
  final class Buf(k: Int, ordering: Ordering[Any]) {
    private val heap = new java.util.PriorityQueue[Any](
      math.min(k, 64), ordering.reverse)

    def offer(v: Any, copyBeforeKeep: Boolean): Unit =
      if (heap.size < k) {
        heap.offer(if (copyBeforeKeep) InternalRow.copyValue(v) else v)
      } else if (ordering.compare(v, heap.peek()) < 0) {
        heap.poll()
        heap.offer(if (copyBeforeKeep) InternalRow.copyValue(v) else v)
      }

    def foreachKept(f: Any => Unit): Unit = heap.forEach(v => f(v))

    def sortedAscending: Array[Any] = {
      val arr = heap.toArray
      java.util.Arrays.sort(arr,
        ordering.asInstanceOf[java.util.Comparator[AnyRef]])
      arr.asInstanceOf[Array[Any]]
    }
  }

  /** Column API: `boundedMinK(c, k)` ≡ `slice(array_sort(collect_list(c)), 1, k)`
    * with O(k) aggregation state.
    */
  def boundedMinK(c: Column, k: Int): Column =
    Bridge.column(BoundedMinK(Bridge.expression(c), k).toAggregateExpression())
}
