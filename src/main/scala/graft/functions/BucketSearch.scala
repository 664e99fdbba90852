package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Branchless-hot-path bucket assignment for [[graft.plans.OrderedPrefix]]:
  * binary search of the row's composite order key `(ord, tie)` over the
  * broadcast equi-depth cutoff arrays, returning the 1-based bucket id
  * `1 + |{i : (cutsOrd[i], cutsTie[i]) < (ord, tie)}|` (a lower bound in
  * the classic sense — cutoffs are sorted ascending by (o, t)).
  *
  * Why an expression and not `size(filter(cuts, ...))`: Spark's
  * higher-order functions are CodegenFallback — an interpreted lambda
  * eval per array element, ~253 expression-tree walks per ROW on the
  * scan hot path. This emits a tight O(log n) loop inside whole-stage
  * codegen (same pattern as [[VectorDot]]). The tie column keeps its
  * native type: codegen compares via `ctx.genComp` (any orderable type),
  * interpreted eval via `TypeUtils.getInterpretedOrdering`.
  *
  * Null contract (must mirror `sort_array`'s struct ordering, which
  * sorts null fields FIRST ascending, so cutoffs and probes agree):
  *  - null cutoff arrays (key absent from the broadcast sample) → bucket 1;
  *  - null `ord` → null (OrderedPrefix drops null-ord rows upstream);
  *  - null tie values sort before non-null ones.
  *
  * Any monotone assignment yields identical final ranks/sums/maxes —
  * cutoff choice (and therefore sampling noise) affects load balance
  * only, never results.
  */
case class CompositeLowerBound(cutsOrd: Expression, cutsTie: Expression,
    ord: Expression, tie: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(cutsOrd, cutsTie, ord, tie)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = ord.nullable
  private def tieType: DataType = tie.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    (cutsOrd.dataType, cutsTie.dataType, ord.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(et, _), DoubleType)
          if et == tieType =>
        TypeUtils.checkForOrderingExpr(tieType, prettyName)
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<tieType>, double, tie), got " +
          s"(${cutsOrd.dataType}, ${cutsTie.dataType}, ${ord.dataType}, $tieType)")
    }

  @transient private lazy val ordOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(DoubleType)
  @transient private lazy val tieOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(tieType)

  override def eval(input: InternalRow): Any = {
    val co = cutsOrd.eval(input)
    if (co == null) return 1
    val o = ord.eval(input)
    if (o == null) return null
    val oArr = co.asInstanceOf[ArrayData]
    val ct = cutsTie.eval(input)
    val tArr = if (ct == null) null else ct.asInstanceOf[ArrayData]
    val tv = tie.eval(input)
    var lo = 0
    var hi = oArr.numElements()
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      val c = ordOrdering.compare(
        java.lang.Double.valueOf(oArr.getDouble(m)), o)
      val less =
        if (c != 0) c < 0
        else {
          val cv = if (tArr == null || tArr.isNullAt(m)) null
                   else tArr.get(m, tieType)
          if (cv == null) tv != null // nulls first
          else if (tv == null) false
          else tieOrdering.compare(cv, tv) < 0
        }
      if (less) lo = m + 1 else hi = m
    }
    lo + 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coEv = cutsOrd.genCode(ctx)
    val ctEv = cutsTie.genCode(ctx)
    val oEv = ord.genCode(ctx)
    val tEv = tie.genCode(ctx)
    val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
    val m = ctx.freshName("m"); val less = ctx.freshName("less")
    val cov = ctx.freshName("cov"); val cmp = ctx.freshName("cmp")
    val ctv = ctx.freshName("ctv")
    val tieJava = CodeGenerator.javaType(tieType)
    val tieGet = CodeGenerator.getValue(ctEv.value.toString, tieType, m)
    val resultCode =
      code"""
        ${coEv.code}
        ${oEv.code}
        boolean ${ev.isNull} = false;
        int ${ev.value} = 1;
        if (!${coEv.isNull} && ${oEv.isNull}) {
          ${ev.isNull} = true;
        } else if (!${coEv.isNull}) {
          ${ctEv.code}
          ${tEv.code}
          int $lo = 0;
          int $hi = ${coEv.value}.numElements();
          while ($lo < $hi) {
            int $m = ($lo + $hi) >>> 1;
            double $cov = ${coEv.value}.getDouble($m);
            int $cmp = ${ctx.genComp(DoubleType, cov, oEv.value.toString)};
            boolean $less;
            if ($cmp != 0) {
              $less = $cmp < 0;
            } else if (${ctEv.isNull} || ${ctEv.value}.isNullAt($m)) {
              $less = !${tEv.isNull};
            } else if (${tEv.isNull}) {
              $less = false;
            } else {
              $tieJava $ctv = $tieGet;
              $less = ${ctx.genComp(tieType, ctv, tEv.value.toString)} < 0;
            }
            if ($less) { $lo = $m + 1; } else { $hi = $m; }
          }
          ${ev.value} = $lo + 1;
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

object BucketSearch {
  /** Register `composite_lower_bound` in the session's function registry
    * (idempotent) — the repo's convention for invoking custom
    * expressions from the Column API via `expr(...)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "composite_lower_bound",
      exprs => CompositeLowerBound(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
}
