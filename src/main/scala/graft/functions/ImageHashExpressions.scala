package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Perceptual image hashing for the image near-dup family
  * (SURVEY.md §2-B dedup-near row; the image bridge the round-9
  * verdict asked for).
  *
  * dHash (difference hash): over a 9-wide × 8-tall grayscale
  * thumbnail, bit `r*8 + c` is set iff `pixel(r, c+1) > pixel(r, c)`
  * — 8 horizontal gradient signs per row, 64 bits total. Gradient
  * SIGNS survive global brightness/contrast shifts (any monotone
  * per-pixel transform), which is what makes dHash a near-dup signal
  * rather than a byte checksum. The 64-bit output rides the exact
  * SimHash band machinery (4 × 16-bit bands, hamming verify).
  *
  * One compiled pass per row over the decoded pixel array (the
  * SimHash64 posture: no shuffle, no per-element lambda
  * interpretation; CodegenFallback costs one call boundary).
  */
case class DHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  /** 9 × 8 thumbnail, row-major. */
  val Width = 9
  val Height = 8

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dhash64 expects array<int> (9x8 row-major grayscale), got $t")
    }

  /** Null on malformed input (wrong length, null pixel) — the
    * decode-error row drops out of banding instead of failing the
    * corpus job; the malformed-guard spec pins this. */
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != Width * Height) return null
    var h = 0L
    var r = 0
    while (r < Height) {
      var c = 0
      while (c < Width - 1) {
        val i = r * Width + c
        if (arr.isNullAt(i) || arr.isNullAt(i + 1)) return null
        if (arr.getInt(i + 1) > arr.getInt(i))
          h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def withNewChildInternal(c: Expression): DHash64 =
    copy(child = c)
}

object ImageHashExpressions {
  def builder(exprs: Seq[Expression]): DHash64 = {
    if (exprs.length != 1) throw new IllegalArgumentException(
      s"dhash64 takes (pixels), got ${exprs.length} args")
    DHash64(exprs.head)
  }

  /** Register dhash64 in the session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("dhash64", builder, "built-in")
}
