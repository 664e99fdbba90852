package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `zone_bloom(value, expectedItems)` — a per-GROUP bloom filter as a
  * serialized binary, the membership half of the table store's zone
  * maps (`cdc.BucketStats`).
  *
  * Why a bloom and not a distinct set: on a HASH-bucketed store a
  * point predicate's rows land in few buckets, but each bucket's
  * min/max spans the whole domain — range stats can't prune. Exact
  * per-bucket value sets would prune, but their build is unbounded
  * (`collect_set` materializes every distinct value in the agg
  * buffer — a 100 TB bucket with 10M distinct strings OOMs the
  * executor). The bloom is the bounded-memory answer: a FIXED-size
  * buffer per (group × partition) regardless of cardinality, merged
  * associatively, with one-sided error in the safe direction — a
  * false positive keeps a bucket that could have been skipped, never
  * the reverse.
  *
  * Input is the column's CANONICAL STRING encoding (BucketStats'
  * domain encoding) so probe-time bounds hash identically; bytes put
  * are the UTF-8 bytes of that string.
  */
case class BloomAgg(
    child: Expression,
    nExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  private lazy val expectedItems: Long =
    nExpr.eval().asInstanceOf[Number].longValue()

  override def children: Seq[Expression] = Seq(child, nExpr)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "zone_bloom"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"zone_bloom value must be string, got ${child.dataType}")
    else if (!nExpr.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(nExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        "zone_bloom expectedItems must be an integral literal")
    else if (nExpr.eval() == null ||
        nExpr.eval().asInstanceOf[Number].longValue() <= 0)
      TypeCheckResult.TypeCheckFailure(
        "zone_bloom expectedItems must be positive")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, BloomAgg.Fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putBinary(v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = BloomAgg.serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] =
    BloomAgg.serialize(buf)

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomAgg.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren(0), nExpr = newChildren(1))
}

object BloomAgg {
  /** 3% — at the stats sidecar's job (skip-or-open a whole bucket) a
    * false positive costs one extra bucket scan, so the buffer stays
    * small (~0.9 KB per 1k expected items). */
  val Fpp = 0.03

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** Driver-side probe of a serialized zone bloom. */
  def mightContain(bytes: Array[Byte], canonical: String): Boolean =
    deserialize(bytes).mightContainBinary(
      canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zone_bloom", exprs => BloomAgg(exprs(0), exprs(1)), "built-in")
}
