package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `z_interleave(a, b)` — Morton (Z-order) interleave of two
  * NON-NEGATIVE 32-bit bucket ids into one long: bit i of `a` lands at
  * bit 2i+1, bit i of `b` at bit 2i. Sorting rows by this value
  * clusters them so that ANY axis-aligned rectangle in (a, b) space
  * touches O(√files) of a range-partitioned layout instead of all of
  * them — the property multi-dimensional data-skipping layouts are
  * built on (see operators.ZOrder).
  *
  * Inputs MUST be ≥ 0 (enforced — negative ids would set bit 63 of the
  * long and silently invert the signed sort order of the z-values, the
  * one property the layout exists to provide; round-4 advice). Bucket
  * ids from width_bucket are 0-based and ≤ 2^31-1, so every legitimate
  * producer is in range by construction.
  *
  * Codegen'd: the interleave is the classic constant-time bit-spread
  * (4 shift-mask rounds per operand), no loops, stays inside
  * whole-stage codegen.
  */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_interleave expects (int, int), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZInterleave.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZInterleave.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "z_interleave"
}

object ZInterleave {
  /** Spread the low 32 bits of v to the even bit positions of a long. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Int, b: Int): Long = {
    if (a < 0 || b < 0)
      throw new IllegalArgumentException(
        s"z_interleave requires non-negative bucket ids, got ($a, $b) — " +
          "a negative id would invert the signed z-value ordering")
    (spread(a) << 1) | spread(b)
  }

  /** Register `z_interleave` in the session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_interleave", exprs => ZInterleave(exprs(0), exprs(1)), "built-in")
}
