package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Signed-random-projection (SRP) LSH buckets for embedding columns —
  * the scale path for cosine near-duplicate detection, pairing with the
  * id-banded exact join the same way MinHash+LSH pairs with exact
  * Jaccard (reference behavior: vijayleom/mysql-postgres-debezium-cdc
  * materializes exact copies; near-dup families are this engine's
  * LLM-pipeline extension).
  *
  * `srp_buckets(embedding, bands, bitsPerBand)` → `array<int>` of
  * length `bands`. Plane `p = band*bitsPerBand + j` contributes bit
  * `j` of its band's bucket: the sign of the projection of the vector
  * onto a pseudo-random ±1 (Rademacher) hyperplane. Vectors whose
  * angle is small agree on most signs, so near-duplicates collide in
  * at least one band w.h.p. — the band bucket becomes an equi-join
  * key, never an all-pairs comparison.
  *
  * Sizing rule: an UNCORRELATED pair still collides in a band with
  * probability ~2^-bitsPerBand, so expected random candidates are
  * ~bands·n²/2^(bitsPerBand+1). Keep `bitsPerBand ≈ log2(n) + margin`
  * (up to 30 supported) so random collisions per vector stay O(1);
  * near-dup recall degrades only geometrically with the extra bits and
  * is recovered by adding bands (ScaleStressSpec pins both effects).
  *
  * Determinism is the whole design: hyperplane signs are derived from
  * `k = p*dims + i` by integer arithmetic that stays inside signed
  * 64-bit range —
  * {{{
  *   h1 = (k * 2654435761) mod 2^32
  *   h2 = ((h1 xor (h1 >> 16)) * 40503) mod 2^32
  *   sign = if (((h2 xor (h2 >> 15)) and 1) == 1) +1 else -1
  * }}}
  * — and the projection accumulates float-widened doubles in array
  * order, so an independent engine (the DuckDB oracle) recomputes the
  * identical buckets from the identical parquet bytes. No RNG state,
  * no seed file, no partitioning dependence.
  *
  * Codegen: a tight two-level primitive loop inside whole-stage
  * codegen (same reasoning as [[VectorDot]] — a higher-order-function
  * formulation would interpret a lambda per element and allocate per
  * row).
  */
case class SrpBuckets(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression {

  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 30,
    s"srp_buckets needs bands>0 and 0<bitsPerBand<=30, got $bands/$bitsPerBand")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_buckets expects array<float|double>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val dims = x.numElements()
    val isFloat = elemIsFloat
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0
      var j = 0
      while (j < bitsPerBand) {
        val p = b * bitsPerBand + j
        var acc = 0.0
        var i = 0
        while (i < dims) {
          val k = p.toLong * dims + i
          val h1 = (k * 2654435761L) % 4294967296L
          val h2 = ((h1 ^ (h1 >> 16)) * 40503L) % 4294967296L
          val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
          acc += (if (((h2 ^ (h2 >> 15)) & 1L) == 1L) v else -v)
          i += 1
        }
        if (acc >= 0.0) bucket |= (1 << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      val dims = ctx.freshName("dims"); val out = ctx.freshName("out")
      val b = ctx.freshName("b"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val k = ctx.freshName("k"); val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2"); val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket"); val v = ctx.freshName("v")
      s"""
         |int $dims = $x.numElements();
         |int[] $out = new int[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $bucket = 0;
         |  for (int $j = 0; $j < $bitsPerBand; $j++) {
         |    int $p = $b * $bitsPerBand + $j;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dims; $i++) {
         |      long $k = (long) $p * $dims + $i;
         |      long $h1 = ($k * 2654435761L) % 4294967296L;
         |      long $h2 = (($h1 ^ ($h1 >> 16)) * 40503L) % 4294967296L;
         |      double $v = (double) $x.$get($i);
         |      $acc += ((($h2 ^ ($h2 >> 15)) & 1L) == 1L) ? $v : -$v;
         |    }
         |    if ($acc >= 0.0) $bucket |= (1 << $j);
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SrpBuckets =
    copy(child = c)

  override def prettyName: String = "srp_buckets"
}

object SrpExpressions {
  /** Strict extraction of a foldable non-null integer literal — a
    * column or NULL argument becomes a clear analysis-time error
    * instead of an obscure runtime ClassCastException/NPE (same
    * contract as [[TextHashExpressions.simhash64Builder]]). */
  private[functions] def intLit(fn: String, arg: String, e: Expression): Int = {
    val ok = e.foldable && (e.dataType match {
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }) && e.eval() != null
    if (!ok) throw new IllegalArgumentException(
      s"$fn's $arg argument must be a non-null integer literal, got $e")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** Shared strict builder — both the per-session registration below
    * and [[graft.GraftExtensions]] install this one, so the argument
    * contract can't fork between the two paths. */
  def bucketsBuilder(exprs: Seq[Expression]): SrpBuckets = {
    if (exprs.length != 3) throw new IllegalArgumentException(
      s"srp_buckets takes (embedding, bands, bitsPerBand), got ${exprs.length} args")
    SrpBuckets(exprs(0),
      intLit("srp_buckets", "bands", exprs(1)),
      intLit("srp_buckets", "bitsPerBand", exprs(2)))
  }

  /** Register `srp_buckets` in the session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "srp_buckets", bucketsBuilder, "built-in")
}
