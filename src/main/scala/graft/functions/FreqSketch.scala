package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch: `freq_sketch(term, k)` summarizes
  * a string stream with at most `k` counters and returns
  * `array<struct<term: string, est: bigint>>` (est DESC, term ASC).
  *
  * Guarantees (the classic MG bounds, FreqSketchSpec pins both):
  *  - every item with true frequency > N/(k+1) is present;
  *  - each estimate undercounts by at most N/(k+1).
  *
  * This is the bounded-memory answer to "top terms over 100 TB": an
  * exact groupBy must shuffle every distinct term; the sketch is a
  * fixed-size buffer per (group × map partition) that merges
  * associatively (count-sum, then decrement by the (k+1)-st largest and
  * drop non-positives — the standard merge that preserves the MG
  * error bound). Estimates depend on merge order in the last N/(k+1)
  * counts — it is a sketch, not a deterministic aggregate, so callers
  * verify candidates exactly (one semi-join) when exact counts matter:
  * q_heavy_hitters carries the exact oracle-backed formulation, and the
  * spec drives this sketch against it.
  */
case class FreqSketch(
    termExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(termExpr, kExpr)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (termExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"freq_sketch term must be string, got ${termExpr.dataType}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("freq_sketch k must be an int literal")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure("freq_sketch k must be positive")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** The Misra-Gries decrement step — see [[FreqSketch.mgShrink]]. */
  private def shrink(buf: mutable.HashMap[UTF8String, Long]): Unit =
    FreqSketch.mgShrink(buf, k)

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val t = termExpr.eval(input)
    if (t != null) {
      val term = t.asInstanceOf[UTF8String]
      buf.get(term) match {
        case Some(c) => buf.update(term, c + 1)
        case None =>
          buf.update(term.clone(), 1L) // escape the reused row buffer
          shrink(buf)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    shrink(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) => InternalRow(t, c) })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val items = buf.toArray
    val total = 4 + items.map(it => 12 + it._1.numBytes()).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(items.length)
    items.foreach { case (t, c) =>
      bb.putInt(t.numBytes()); bb.put(t.getBytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(termExpr = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "freq_sketch"
}

object FreqSketch {
  /** Register `freq_sketch` in the session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_sketch", exprs => FreqSketch(exprs(0), exprs(1)), "built-in")

  /** The Misra-Gries decrement step, shared by the aggregate and the
    * streaming shard state (streaming.IncrementalHeavyHitters): once a
    * buffer overflows to more than `k` entries, subtract the (k+1)-st
    * largest count from everything and drop non-positives (≤ k survive
    * by construction; the standard merge that preserves the N/(k+1)
    * undercount bound). */
  def mgShrink[K](buf: mutable.HashMap[K, Long], k: Int): Unit = {
    if (buf.size <= k) return
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val dec = counts(counts.length - (k + 1)) // (k+1)-st largest
    buf.filterInPlace((_, c) => c > dec).mapValuesInPlace((_, c) => c - dec)
  }
}
