package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

/** `z_interleave_n(c0, c1, ..., c{n-1})` — N-ARY Morton interleave
  * (round-13 verdict #6): bit i of column j lands at bit
  * i·n + (n−1−j), so for n = 2 the layout is bit-identical to
  * [[ZInterleave]] and for any n the "all dims small ⇒ z small"
  * containment holds. The 63 sign-safe bits are split evenly: each
  * column gets ⌊63/n⌋ bits (21 at n = 3 — far above the 16-bit bucket
  * grids the layouts use) and an id outside [0, 2^⌊63/n⌋) fails
  * loudly, never silently truncates or flips the sign bit.
  *
  * Codegen'd: children evaluate inline, the interleave is one static
  * call over a stack int[] — stays inside whole-stage codegen. */
case class ZInterleaveN(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure(
        s"z_interleave_n needs >= 2 columns, got ${children.size}")
    else if (children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_interleave_n expects int columns, got " +
        children.map(_.dataType).mkString(", "))

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Int](children.size)
    var j = 0
    while (j < children.size) {
      val v = children(j).eval(input)
      if (v == null) return null
      vals(j) = v.asInstanceOf[Int]
      j += 1
    }
    ZInterleave.interleaveN(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val fill = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        int[] $arr = new int[${children.size}];
        $fill
        ${ev.value} = graft.functions.ZInterleave.interleaveN($arr);
      }""", isNull = ev.isNull, value = ev.value)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZInterleaveN =
    copy(children = newChildren)

  override def prettyName: String = "z_interleave_n"
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

  /** N-ary Morton: bit i of vals(j) lands at bit i·n + (n−1−j); each
    * dimension gets ⌊63/n⌋ bits. Out-of-range ids fail loudly (the
    * [[interleave]] rationale, generalized). */
  def interleaveN(vals: Array[Int]): Long = {
    val n = vals.length
    require(n >= 2, s"z_interleave_n needs >= 2 dims, got $n")
    val bits = 63 / n
    val cap = 1L << bits
    var z = 0L
    var j = 0
    while (j < n) {
      val v = vals(j)
      if (v < 0 || v >= cap)
        throw new IllegalArgumentException(
          s"z_interleave_n dim $j id $v outside [0, $cap) at n=$n " +
            "(bit budget 63/n per dimension)")
      var i = 0
      while (i < bits) {
        if ((v & (1 << i)) != 0) z |= 1L << (i * n + (n - 1 - j))
        i += 1
      }
      j += 1
    }
    z
  }

  /** Register `z_interleave` and `z_interleave_n` (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_interleave", exprs => ZInterleave(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_interleave_n", exprs => ZInterleaveN(exprs), "built-in")
  }
}
