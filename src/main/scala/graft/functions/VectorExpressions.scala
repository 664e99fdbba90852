package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the similarity hot path (SURVEY.md §4
  * names cosine similarity as the one perf-justified custom expression).
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback: the lambda is interpreted per element and an
  * intermediate array is allocated per row, which made the banded
  * embedding near-dup query ~70 s at sf0.1. This expression emits a
  * tight primitive loop inside whole-stage codegen (no allocation, no
  * virtual calls) — same sequential left-to-right double accumulation,
  * so results are bit-identical to the HOF formulation and to the
  * DuckDB oracle's fold.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.$lGet($i) * (double)$b.$rGet($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** `vec_l2sq(a, b)` — squared L2 distance Σ(aᵢ−bᵢ)², the PQ trainer/
  * encoder hot loop (round 14): `ProductQuant.nearest` scores
  * N·m·K codeword candidates, and the zip_with-diff formulation paid
  * an interpreted lambda plus an array allocation per candidate
  * (ScaleCurve caught one 16× task burning 86 s in `ZipWith.eval`).
  * The accumulation is the SAME sequential left-to-right
  * (a−b)·(a−b) fold the HOF form computed — each difference rounded
  * once, then squared, then added — so results are bit-identical to
  * `vec_dot(zip_with(a, b, (x, y) -> x - y), same)` and to the DuckDB
  * oracle's `sum((a - b) * (a - b))`. */
case class VectorL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_l2sq expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double)$a.$lGet($i) - (double)$b.$rGet($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorL2Sq =
    copy(left = newLeft, right = newRight)
}

/** `argmin_l2sq6(rs, cws)` — index of the nearest codeword: for each
  * candidate array cws[c] (ascending c), compute the same sequential
  * (rs−cw)² fold as [[VectorL2Sq]], round it to 6 digits with EXACTLY
  * Spark's `round(x, 6)` double arithmetic (the codegen'd
  * `java.math.BigDecimal.valueOf(x).setScale(6, HALF_UP)` — NaN/Inf
  * pass through), and return the first index attaining the minimum
  * (ties → smallest index, NaN ordered largest via `Double.compare` —
  * the `min_by(code, struct(d2, code))` ordering).
  *
  * This collapses the PQ trainer/encoder hot path (round-14
  * optimization): the previous shape joined every subvector row
  * against all K codeword ROWS (N·m·K rows through the operator
  * pipeline — 16.4M at sf0.1 — then a groupBy exchange to argmin),
  * where this expression scans the K candidates in one tight
  * codegen'd loop per subvector row: N·m rows total, no argmin
  * exchange, bit-identical result (ProductQuantSpec pins equality
  * against the min_by formulation on the full corpus). */
case class ArgMinL2Sq6(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) => true
      case _ => false
    }
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"argmin_l2sq6 expects (array<double>, array<array<double>>), " +
        s"got ${left.dataType} / ${right.dataType}")
  }

  // Round-14 optimization (guide §1.2 step 2 "per-task work"): the
  // original loop rounded EVERY candidate distance with
  // BigDecimal.valueOf(x).setScale(6, HALF_UP) — ~2.5 µs each through
  // Double.toString — which at N·m rows × K codewords (10.7M calls per
  // PQ train/encode pass at sf0.1) was ~25–40 CPU-seconds, the entire
  // hot cost of the PQ pipeline. round6 is MONOTONE non-decreasing, so
  // min_c round6(d2_c) = round6(min_c d2_c): one raw double pass finds
  // the minimum, ONE BigDecimal call rounds it, and the smallest-code
  // tie-break only needs rounded values for candidates within 2e-6 of
  // the raw minimum (round6(y) == round6(x) with y ≥ x forces
  // y − x ≤ 1e-6 + 2 ulp, so anything farther provably rounds higher).
  // Bit-identical to the round-every-candidate formulation — including
  // NaN (ordered largest, so an all-NaN row keeps returning its first
  // index) and +Inf pass-through — pinned by ProductQuantSpec's
  // equality test against the min_by pipeline.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val rs = a.asInstanceOf[ArrayData]
    val cws = b.asInstanceOf[ArrayData]
    val k = cws.numElements()
    if (k == 0) return null
    val accs = new Array[Double](k)
    var rawMin = Double.NaN
    var c = 0
    while (c < k) {
      val cw = cws.getArray(c)
      val n = math.min(rs.numElements(), cw.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = rs.getDouble(i) - cw.getDouble(i)
        acc += d * d
        i += 1
      }
      accs(c) = acc
      if (c == 0 || java.lang.Double.compare(acc, rawMin) < 0) rawMin = acc
      c += 1
    }
    val rRef = ArgMinL2Sq6.round6(rawMin)
    c = 0
    while (c < k) {
      val acc = accs(c)
      // fast reject: provably rounds to a larger bucket (NaN/Inf fall
      // through to the exact comparison below)
      if (!(acc - rawMin > 2e-6) &&
          java.lang.Double.compare(ArgMinL2Sq6.round6(acc), rRef) == 0)
        return c
      c += 1
    }
    -1 // unreachable: the raw minimum itself always matches
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val buf = ctx.addMutableState("double[]", "argminAccBuf")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k"); val c = ctx.freshName("c")
      val cw = ctx.freshName("cw"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val rRef = ctx.freshName("rRef")
      val rawMin = ctx.freshName("rawMin"); val best = ctx.freshName("best")
      s"""
         |int $k = $b.numElements();
         |int $best = -1;
         |if ($k > 0) {
         |  if ($buf == null || $buf.length < $k) $buf = new double[$k];
         |  double $rawMin = Double.NaN;
         |  for (int $c = 0; $c < $k; $c++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $cw = $b.getArray($c);
         |    int $n = java.lang.Math.min($a.numElements(), $cw.numElements());
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $d = $a.getDouble($i) - $cw.getDouble($i);
         |      $acc += $d * $d;
         |    }
         |    $buf[$c] = $acc;
         |    if ($c == 0 || java.lang.Double.compare($acc, $rawMin) < 0) $rawMin = $acc;
         |  }
         |  double $rRef = graft.functions.ArgMinL2Sq6$$.MODULE$$.round6($rawMin);
         |  for (int $c = 0; $c < $k; $c++) {
         |    if (!($buf[$c] - $rawMin > 2e-6) &&
         |        java.lang.Double.compare(
         |          graft.functions.ArgMinL2Sq6$$.MODULE$$.round6($buf[$c]), $rRef) == 0) {
         |      $best = $c;
         |      break;
         |    }
         |  }
         |}
         |${ev.isNull} = $best < 0;
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMinL2Sq6 =
    copy(left = newLeft, right = newRight)
}

object ArgMinL2Sq6 {
  /** Spark's exact `round(x, 6)` double arithmetic — NaN/Inf pass
    * through (shared by the interpreted and codegen'd paths). */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}

object VectorExpressions {
  /** Register `vec_dot` + `vec_l2sq` + `argmin_l2sq6` in the session's
    * function registry (idempotent); usable from both the Column API
    * (via expr) and SQL. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_l2sq", exprs => VectorL2Sq(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "argmin_l2sq6", exprs => ArgMinL2Sq6(exprs(0), exprs(1)), "built-in")
  }
}
