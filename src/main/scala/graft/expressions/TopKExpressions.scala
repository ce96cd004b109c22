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
      // Skip pairs with a null field: a null score is a malformed row
      // (e.g. a length-mismatched embedding) and must never rank. NB
      // this matches the DuckDB oracle's nulls-LAST ascending sort, and
      // deliberately DIVERGES from Spark's nulls-FIRST window sort —
      // under which one malformed row would take the #1 slot.
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

/** Element-wise `sum(k * arr)` over long arrays — one fixed-width
  * accumulator per group.
  *
  * This is the "classes ride in a vector" aggregate for the NB scorer:
  * the row form (`crossJoin(classes)` then `groupBy(doc, class)`)
  * materializes docs x buckets x |classes| rows through the join and
  * hash-agg machinery — 3 BILLION rows at the 50x smoke with 20 classes,
  * and linear in |classes|. Here each (doc, bucket) row contributes its
  * whole per-class weight column with one multiply-add loop, so the
  * aggregated row count stays docs x buckets no matter how many classes
  * (a fastText-style 176-language router pays arithmetic, not rows).
  *
  * A null/absent array contributes nothing (matching the row form, where
  * an unseen bucket's `log2(0 + 1) = 0` terms vanish); elements past
  * `numElems` are ignored, shorter arrays count as zero-padded.
  */
case class SumScaledLongArrays(
    kChild: Expression,
    arrChild: Expression,
    numElems: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numElems >= 1, "sum_scaled_long_arrays needs numElems >= 1")

  override def children: Seq[Expression] = Seq(kChild, arrChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sum_scaled_long_arrays"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (kChild.dataType, arrChild.dataType) match {
      case (LongType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sum_scaled_long_arrays needs (bigint, array<bigint>), got $other")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numElems)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val kv = kChild.eval(input)
    val av = arrChild.eval(input)
    if (kv != null && av != null) {
      val k = kv.asInstanceOf[Long]
      val arr = av.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(numElems, arr.numElements())
      var i = 0
      while (i < n) { buf(i) += k * arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numElems) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numElems)
    var i = 0
    while (i < numElems) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](numElems)
    var i = 0
    while (i < numElems) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SumScaledLongArrays =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SumScaledLongArrays =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(kChild = newChildren(0), arrChild = newChildren(1))
}

object TopKExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** `array<struct<a,b>>` of the k smallest (a, b) pairs, ascending. */
  def topKSmallestPairs(pair: Column, k: Int): Column =
    column(TopKSmallestPairs(expression(pair), k).toAggregateExpression())

  /** Element-wise `sum(k * arr)` as a length-`numElems` long array. */
  def sumScaledLongArrays(k: Column, arr: Column, numElems: Int): Column =
    column(SumScaledLongArrays(expression(k), expression(arr), numElems)
      .toAggregateExpression())
}
