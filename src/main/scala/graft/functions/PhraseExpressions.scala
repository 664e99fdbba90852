package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `phrase_count(tokens, 'w1 w2 …')` — exact adjacent-in-order phrase
  * occurrences in a token array, as ONE compiled per-row pass.
  *
  * The HOF formulation (`size(filter(sequence(0, n-m), i -> w[i] = …))`)
  * materializes an index array per row and interprets its lambda per
  * POSITION — the same per-element interpretation cost that moved
  * simhash/minhash/rollhash into expressions (scaladoc above
  * [[SimHash64]]); measured 6.5× on q_phrase_search at sf0.1. The
  * phrase argument must be a foldable string: its terms are split once
  * at plan time, and eval is a tight two-level loop over the row's own
  * tokens (CodegenFallback costs only the call boundary).
  */
case class PhraseCount(tokens: Expression, phrase: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = tokens
  override def right: Expression = phrase
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, phrase.dataType) match {
      case (ArrayType(StringType, _), StringType) if phrase.foldable =>
        if (terms.nonEmpty) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("phrase_count: empty phrase")
      case (ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckFailure(
          "phrase_count's phrase must be a literal string")
      case (t1, t2) =>
        TypeCheckResult.TypeCheckFailure(
          s"phrase_count expects (array<string>, string), got ($t1, $t2)")
    }

  private lazy val terms: Array[UTF8String] =
    Option(phrase.eval(null)).map(_.asInstanceOf[UTF8String].toString
      .split(" ").filter(_.nonEmpty).map(UTF8String.fromString)).getOrElse(Array.empty)

  override def nullSafeEval(arr: Any, _p: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = terms.length
    var count = 0L
    var i = 0
    while (i <= n - m) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val t = a.getUTF8String(i + j)
        ok = t != null && t == terms(j)
        j += 1
      }
      if (ok) count += 1
      i += 1
    }
    count
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, phrase = newRight)
}

object PhraseExpressions {
  def builder(exprs: Seq[Expression]): PhraseCount = {
    require(exprs.length == 2, "phrase_count takes (tokens, phrase)")
    PhraseCount(exprs.head, exprs(1))
  }

  /** Register phrase_count in the session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("phrase_count", builder, "built-in")
}
