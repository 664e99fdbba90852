package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector sum over an `array<float>` / `array<double>`
  * column: `vec_sum(embedding)` returns `array<double>` with
  * `out[i] = Σ row.embedding[i]`.
  *
  * This is the aggregate that makes centroid updates (k-means / IVF
  * training) scale: the alternative — `posexplode` every component and
  * `groupBy(cid, pos)` — multiplies the exchanged row count by the
  * vector dimension (N×d skinny rows, each with shuffle-key overhead).
  * As a TypedImperativeAggregate the sum is map-side combinable: each
  * map partition folds its vectors into ONE double[] per group, so the
  * exchange carries (groups × partitions) fixed-size buffers
  * regardless of N. Plans as an ObjectHashAggregate pair (see
  * KMeansSpec's plan assertion).
  *
  * Null vectors are skipped; a dimension mismatch inside one group
  * fails fast (data corruption, not a semantics choice). Double
  * accumulation is order-dependent in the last bits — callers that
  * need cross-engine parity round the derived means (the engine's
  * cosine convention, see q_kmeans_update).
  */
case class VecSum(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def children: Seq[Expression] = Seq(child)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"vec_sum expects array<float|double>, got $other")
  }

  /** Empty array = "nothing seen yet" (dimension unknown until the
    * first vector arrives). */
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def add(buf: Array[Double], v: ArrayData): Array[Double] = {
    val n = v.numElements()
    val out = if (buf.isEmpty) new Array[Double](n) else buf
    require(out.length == n,
      s"vec_sum: mixed vector dimensions in one group (${out.length} vs $n)")
    var i = 0
    if (isFloat) while (i < n) { out(i) += v.getFloat(i); i += 1 }
    else while (i < n) { out(i) += v.getDouble(i); i += 1 }
    out
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf.length == other.length,
      s"vec_sum: mixed vector dimensions across partitions (${buf.length} vs ${other.length})")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bb.getInt)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSum =
    copy(child = newChildren(0))

  override def prettyName: String = "vec_sum"
}

object VecSum {
  /** Register `vec_sum` in the session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_sum", exprs => VecSum(exprs(0)), "built-in")
}
