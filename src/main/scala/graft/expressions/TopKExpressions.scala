package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded max-heap over (a, b) long pairs, ordered lexicographically —
  * the k SMALLEST pairs survive. Mutable, allocation-free per offer.
  */
final class LongPairHeap(val k: Int) {
  val as = new Array[Long](math.max(k, 1))
  val bs = new Array[Long](math.max(k, 1))
  var n = 0

  @inline private def lt(a1: Long, b1: Long, a2: Long, b2: Long): Boolean =
    a1 < a2 || (a1 == a2 && b1 < b2)

  def offer(a: Long, b: Long): Unit =
    if (n < k) {
      as(n) = a; bs(n) = b; n += 1
      var i = n - 1
      while (i > 0 && lt(as((i - 1) / 2), bs((i - 1) / 2), as(i), bs(i))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && lt(a, b, as(0), bs(0))) {
      as(0) = a; bs(0) = b
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var big = i
        if (l < n && lt(as(big), bs(big), as(l), bs(l))) big = l
        if (r < n && lt(as(big), bs(big), as(r), bs(r))) big = r
        if (big == i) done = true else { swap(i, big); i = big }
      }
    }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ta = as(i); as(i) = as(j); as(j) = ta
    val tb = bs(i); bs(i) = bs(j); bs(j) = tb
  }

  /** Indices 0..n-1 sorted ascending by (a, b). */
  def sortedIdx: Array[Int] =
    Array.range(0, n).sortWith((i, j) => lt(as(i), bs(i), as(j), bs(j)))
}

/** Typed-imperative top-k aggregate: keeps the k lexicographically
  * SMALLEST (a, b) long pairs of the group in a bounded heap and returns
  * them ascending as `array<struct<a,b>>`.
  *
  * This replaces the two-phase row_number window tail of the top-k
  * queries: the window form SORTS every scored row twice (partial
  * WindowGroupLimit still sorts each partition before pruning); this is
  * an ObjectHashAggregate — per-partition state is queries x k pairs,
  * the shuffle carries only those partials, and nothing is ever sorted
  * but the final k-row merge. Identical output to
  * `row_number over (order by a, b) <= k` by construction (same
  * lexicographic order, same k cutoff).
  */
case class TopKSmallestPairs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongPairHeap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_smallest_pairs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(StructField(_, LongType, _, _), StructField(_, LongType, _, _))) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_smallest_pairs needs struct<long,long>, got ${other.sql}")
    }

  override def createAggregationBuffer(): LongPairHeap = new LongPairHeap(k)

  override def update(buf: LongPairHeap, input: InternalRow): LongPairHeap = {
    val s = child.eval(input)
    if (s != null) {
      val row = s.asInstanceOf[InternalRow]
      // Skip pairs with a null field — the row_number window form this
      // replaces sorts nulls last, so they never make the top k either.
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        buf.offer(row.getLong(0), row.getLong(1))
      }
    }
    buf
  }

  override def merge(buf: LongPairHeap, other: LongPairHeap): LongPairHeap = {
    var i = 0
    while (i < other.n) { buf.offer(other.as(i), other.bs(i)); i += 1 }
    buf
  }

  override def eval(buf: LongPairHeap): Any = {
    val idx = buf.sortedIdx
    new GenericArrayData(idx.map(i =>
      new GenericInternalRow(Array[Any](buf.as(i), buf.bs(i))): Any))
  }

  override def serialize(buf: LongPairHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.as(i)); bb.putLong(buf.bs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongPairHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new LongPairHeap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSmallestPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSmallestPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** `array<struct<a,b>>` of the k smallest (a, b) pairs, ascending. */
  def topKSmallestPairs(pair: Column, k: Int): Column =
    column(TopKSmallestPairs(expression(pair), k).toAggregateExpression())
}
