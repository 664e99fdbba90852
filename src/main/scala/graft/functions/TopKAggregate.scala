package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate: `topk_by(score, id, k)` keeps the
  * k best `(score, id)` pairs (score DESC, id ASC on ties) and returns
  * them best-first as `array<struct<score: double, id: bigint>>`.
  *
  * This exists because the `row_number().over(Window.partitionBy(g))`
  * top-k idiom shuffles and sorts EVERY candidate row per group before
  * discarding all but k. As a TypedImperativeAggregate the operator is
  * map-side combinable: each map partition reduces its candidates to a
  * ≤k-element heap, so the exchange carries one small buffer per
  * (group × partition) instead of the full candidate set, and no sort
  * is planned at all. At 100 TB this is the difference between
  * shuffling N·C scored rows and shuffling N (see SimilarityOps IVF).
  *
  * The heap orders worst-first so inserts against a full buffer are a
  * single O(log k) root replacement. Determinism holds for MULTISETS,
  * duplicates included: the only tie the (score DESC, id ASC) order
  * admits is an exact-duplicate (score, id) tuple, and when a full
  * buffer rejects a candidate equal to its worst element the surviving
  * multiset is identical either way — so the bounded heap maintains
  * exactly the k-best multiset of the rows seen, merge-order- and
  * partitioning-independent, matching the row_number window
  * formulation row for row (TopKDuplicatesSpec pins this against the
  * window under randomized duplication and repartitioning).
  */
case class TopKBy(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  // Worst elements compare greatest so PriorityQueue.head is the one to evict.
  private def worstFirst: Ordering[(Double, Long)] = TopKBy.WorstFirst

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by score must be double, got ${scoreExpr.dataType}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by id must be bigint, got ${idExpr.dataType}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("topk_by k must be an int literal")
    else if (kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure("topk_by k must be positive")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def insert(
      buf: mutable.PriorityQueue[(Double, Long)],
      cand: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else if (worstFirst.lt(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      insert(buf, (s.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(worstFirst) // ascending worseness = best first
    new GenericArrayData(sorted.map { case (s, id) => InternalRow(s, id) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))

  override def prettyName: String = "topk_by"
}

object TopKBy {
  /** Lower score ⇒ worse; on score ties, larger id ⇒ worse. */
  val WorstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Register `topk_by`, `topk_str_by` and `argmax_by` in the session
    * (idempotent). The analyzer wraps the bare AggregateFunction in an
    * AggregateExpression. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by", exprs => TopKBy(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_str_by", exprs => TopKStrBy(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "argmax_by", exprs => ArgMaxBy(exprs(0), exprs(1), exprs(2)), "built-in")
  }
}

/** [[TopKBy]] with a string payload that is also the tie-break:
  * `topk_str_by(score, term, k)` keeps the k best `(score, term)`
  * pairs — score DESC, term ASC (binary) on ties — and returns them
  * best-first as `array<struct<score: double, term: string>>`.
  *
  * Exists for per-group "top terms/labels" pipelines (TF-IDF top
  * terms): the tie-break is the term's binary byte order, which is the
  * same total order an independent SQL engine applies with default
  * (binary) collation, so results stay cross-engine deterministic
  * without inventing a portable numeric id per term. Same bounded-heap
  * scale argument as [[TopKBy]]: map-side combinable, ≤k elements per
  * (group × partition) on the exchange, no sort in the plan.
  */
case class TopKStrBy(
    scoreExpr: Expression,
    strExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, org.apache.spark.unsafe.types.UTF8String)]] {

  import org.apache.spark.unsafe.types.UTF8String

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  private def worstFirst: Ordering[(Double, UTF8String)] = TopKStrBy.WorstFirst

  override def children: Seq[Expression] = Seq(scoreExpr, strExpr, kExpr)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("term", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_str_by score must be double, got ${scoreExpr.dataType}")
    else if (strExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_str_by term must be string, got ${strExpr.dataType}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("topk_str_by k must be an int literal")
    else if (kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure("topk_str_by k must be positive")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, UTF8String)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def insert(
      buf: mutable.PriorityQueue[(Double, UTF8String)],
      cand: (Double, UTF8String)): Boolean = {
    if (buf.size < k) { buf.enqueue(cand); true }
    else if (worstFirst.lt(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand); true }
    else false
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, UTF8String)],
      input: InternalRow): mutable.PriorityQueue[(Double, UTF8String)] = {
    val s = scoreExpr.eval(input)
    val t = strExpr.eval(input)
    if (s != null && t != null) {
      // Clone lazily: only a candidate that actually enters the heap
      // needs to escape the reused row buffer.
      val cand = (s.asInstanceOf[Double], t.asInstanceOf[UTF8String])
      if (buf.size < k || worstFirst.lt(cand, buf.head))
        insert(buf, (cand._1, cand._2.clone()))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, UTF8String)],
      other: mutable.PriorityQueue[(Double, UTF8String)])
      : mutable.PriorityQueue[(Double, UTF8String)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, UTF8String)]): Any = {
    val sorted = buf.toArray.sorted(worstFirst) // best first
    new GenericArrayData(sorted.map { case (s, t) => InternalRow(s, t) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, UTF8String)]): Array[Byte] = {
    val items = buf.toArray
    val total = 4 + items.map(it => 12 + it._2.numBytes()).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(items.length)
    items.foreach { case (s, t) =>
      bb.putDouble(s); bb.putInt(t.numBytes()); bb.put(t.getBytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, UTF8String)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.enqueue((s, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStrBy =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKStrBy =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStrBy =
    copy(scoreExpr = newChildren(0), strExpr = newChildren(1), kExpr = newChildren(2))

  override def prettyName: String = "topk_str_by"
}

object TopKStrBy {
  import org.apache.spark.unsafe.types.UTF8String

  /** Lower score ⇒ worse; on score ties, binary-larger term ⇒ worse. */
  val WorstFirst: Ordering[(Double, UTF8String)] = new Ordering[(Double, UTF8String)] {
    override def compare(a: (Double, UTF8String), b: (Double, UTF8String)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else a._2.compareTo(b._2)
    }
  }
}

/** Mutable argmax state: the best (score, id) seen and its payload. */
final class ArgMaxBuffer(
    var set: Boolean = false,
    var score: Double = 0.0,
    var id: Long = 0L,
    var value: Any = null)

/** Per-group argmax with a deterministic tie-break:
  * `argmax_by(payload, score, id)` returns the payload of the row with
  * the greatest score — on score ties, the smallest id wins. Unlike
  * Spark's `max_by` (whose value+ordering agg buffer degrades to
  * SortAggregate whenever either side is non-primitive), this is a
  * TypedImperativeAggregate, so it plans as a partial
  * ObjectHashAggregate: no sort of the candidate rows at all and one
  * buffer per group per map partition on the exchange. Built for the
  * IVF assignment argmax where the candidate set is corpus × centroids
  * but the result is one row per corpus vector (SimilarityOps).
  */
case class ArgMaxBy(
    payload: Expression,
    scoreExpr: Expression,
    idExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxBuffer] {

  override def children: Seq[Expression] = Seq(payload, scoreExpr, idExpr)

  override def dataType: DataType = payload.dataType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"argmax_by score must be double, got ${scoreExpr.dataType}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"argmax_by id must be bigint, got ${idExpr.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): ArgMaxBuffer = new ArgMaxBuffer()

  private def better(buf: ArgMaxBuffer, s: Double, id: Long): Boolean =
    !buf.set || s > buf.score || (s == buf.score && id < buf.id)

  override def update(buf: ArgMaxBuffer, input: InternalRow): ArgMaxBuffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null &&
        better(buf, s.asInstanceOf[Double], id.asInstanceOf[Long])) {
      buf.set = true
      buf.score = s.asInstanceOf[Double]
      buf.id = id.asInstanceOf[Long]
      // Copy: the payload may be backed by a reused row buffer.
      buf.value = InternalRow.copyValue(payload.eval(input))
    }
    buf
  }

  override def merge(buf: ArgMaxBuffer, other: ArgMaxBuffer): ArgMaxBuffer = {
    if (other.set && better(buf, other.score, other.id)) {
      buf.set = true; buf.score = other.score; buf.id = other.id
      buf.value = other.value
    }
    buf
  }

  override def eval(buf: ArgMaxBuffer): Any = if (buf.set) buf.value else null

  // Shuffle format: one UnsafeRow of (set, score, id, payload).
  private lazy val rowSchema =
    Array[DataType](BooleanType, DoubleType, LongType, dataType)
  private lazy val proj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(rowSchema)

  override def serialize(buf: ArgMaxBuffer): Array[Byte] =
    proj(InternalRow(buf.set, buf.score, buf.id, buf.value)).getBytes

  override def deserialize(bytes: Array[Byte]): ArgMaxBuffer = {
    val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(4)
    row.pointTo(bytes, bytes.length)
    new ArgMaxBuffer(row.getBoolean(0), row.getDouble(1), row.getLong(2),
      InternalRow.copyValue(row.get(3, dataType)))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxBy =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxBy =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMaxBy =
    copy(payload = newChildren(0), scoreExpr = newChildren(1),
      idExpr = newChildren(2))

  override def prettyName: String = "argmax_by"
}
