package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group k-extreme DECIMAL aggregate:
  * `bottomk_dec(v, k, desc)` keeps the k smallest (or, with
  * `desc = true`, k largest) decimal values of the group — a MULTISET,
  * duplicates retained — and returns them extreme-first (ascending for
  * smallest, descending for largest) as `array<decimal>` of the
  * child's exact type.
  *
  * Exists for `cdc.IncrementalView`'s MIN/MAX maintenance: the view
  * stores each group's k-extreme buffer so deletions of the current
  * extremum are absorbed locally instead of forcing a per-delete
  * group recompute, and the buffer must be EXACT decimals (the
  * engine-wide exact-accumulator stance — `topk_by`'s double score
  * would put IEEE noise on a bit-exactness contract). Like `topk_by`
  * it is a TypedImperativeAggregate, so it is map-side combinable:
  * each map partition reduces to a ≤k-element heap and the exchange
  * carries one small buffer per (group × partition) — the one-shot
  * view compute never collects a group's full value list, which is
  * what makes view (re)initialization safe on billion-row groups.
  *
  * The heap orders evict-candidate-first (largest first in asc mode),
  * so a full buffer replaces its root in O(log k). Multiset
  * determinism: the only tie is an exactly-equal decimal, and
  * rejecting a candidate equal to the current root leaves an
  * identical multiset — merge-order- and partitioning-independent.
  */
case class BottomKDec(
    valueExpr: Expression,
    kExpr: Expression,
    descExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Decimal]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val desc: Boolean = descExpr.eval().asInstanceOf[Boolean]
  private lazy val decType: DecimalType =
    valueExpr.dataType.asInstanceOf[DecimalType]

  /** Head = the element a full buffer evicts first: the LARGEST kept
    * value when keeping smallest, the smallest when keeping largest. */
  private def evictFirst: Ordering[Decimal] =
    if (desc) Ordering[Decimal].reverse else Ordering[Decimal]

  override def children: Seq[Expression] = Seq(valueExpr, kExpr, descExpr)

  override def dataType: DataType = ArrayType(decType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (!valueExpr.dataType.isInstanceOf[DecimalType])
      TypeCheckResult.TypeCheckFailure(
        s"bottomk_dec value must be decimal, got ${valueExpr.dataType}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("bottomk_dec k must be an int literal")
    else if (kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure("bottomk_dec k must be positive")
    else if (!descExpr.foldable || descExpr.dataType != BooleanType)
      TypeCheckResult.TypeCheckFailure(
        "bottomk_dec desc must be a boolean literal")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.PriorityQueue[Decimal] =
    mutable.PriorityQueue.empty(evictFirst)

  private def insert(buf: mutable.PriorityQueue[Decimal], v: Decimal): Unit = {
    if (buf.size < k) buf.enqueue(v)
    else if (evictFirst.lt(v, buf.head)) { buf.dequeue(); buf.enqueue(v) }
  }

  override def update(
      buf: mutable.PriorityQueue[Decimal],
      input: InternalRow): mutable.PriorityQueue[Decimal] = {
    val v = valueExpr.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Decimal])
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[Decimal],
      other: mutable.PriorityQueue[Decimal]): mutable.PriorityQueue[Decimal] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Decimal]): Any =
    // `sorted` puts the SMALLEST-under-ordering first: under natural
    // order that is ascending (head = min), under the reversed order
    // descending (head = max) — index 0 is the group extreme either way
    new GenericArrayData(buf.toArray.sorted(evictFirst).map(identity[Any]))

  override def serialize(buf: mutable.PriorityQueue[Decimal]): Array[Byte] = {
    val items = buf.toArray.map(_.toJavaBigDecimal.unscaledValue.toByteArray)
    val bb = java.nio.ByteBuffer.allocate(4 + items.map(4 + _.length).sum)
    bb.putInt(items.length)
    items.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Decimal] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.enqueue(Decimal(new java.math.BigDecimal(
        new java.math.BigInteger(b), decType.scale),
        decType.precision, decType.scale))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDec =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDec =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDec =
    copy(valueExpr = newChildren(0), kExpr = newChildren(1),
      descExpr = newChildren(2))

  override def prettyName: String = "bottomk_dec"
}

object BottomKDec {
  /** Register `bottomk_dec` in the session's function registry
    * (idempotent) — the per-session twin of the GraftExtensions
    * route, the TopKBy.register pattern. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottomk_dec",
      exprs => BottomKDec(exprs(0), exprs(1), exprs(2)), "built-in")
}
