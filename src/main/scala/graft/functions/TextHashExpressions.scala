package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row text-hashing expressions (SURVEY.md §2-B text/dedup rows).
  *
  * SimHash and MinHash are pure functions of one document's token
  * array, so they belong in the scan, not in an explode + 64-column
  * aggregation (the first implementation shuffled every token row).
  * These expressions do one compiled pass per document — no shuffle,
  * no per-element lambda interpretation (the expression's eval is a
  * single JIT-compiled method; CodegenFallback only costs the call
  * boundary).
  *
  * Hashing uses Spark's own XxHash64 so values line up with the SQL
  * `xxhash64` function family.
  */

/** 64-bit SimHash over a token array: bit b is the sign of
  * Σ_tokens (±1 by token-hash bit b).
  *
  * Two per-token hash strategies:
  *  - default (xxhash64, seed 42): best avalanche, lines up with the
  *    SQL `xxhash64` family;
  *  - `portable = true`: a pair of modular polynomial hashes over the
  *    token's Unicode CODE POINTS packed as `(h31 << 31) | h131` — each
  *    fold is expressible as a DuckDB `list_reduce`, so the WHOLE
  *    simhash (votes, banding, hamming) can be recomputed by an
  *    independent engine for cross-engine verification. Effective
  *    width is 61 bits (both folds are < 2^30); the top bits vote
  *    uniformly to 0 in every engine, so comparisons are unaffected.
  */
case class SimHash64(child: Expression, portable: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got $t")
    }

  private def polyPair(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var h1 = 0L; var h2 = 0L
    var i = 0
    val n = str.length
    // Fold UNICODE CODE POINTS, not UTF-16 units: DuckDB's
    // `split(w, '')` yields one element per code point (combining
    // marks included, surrogate pairs joined), so folding charAt units
    // would diverge from the oracle on any non-BMP character.
    while (i < n) {
      val cp = str.codePointAt(i)
      h1 = (h1 * 31 + cp) % 1000000007L
      h2 = (h2 * 131 + cp) % 998244353L
      i += Character.charCount(cp)
    }
    (h1 << 31) | h2
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = if (portable) polyPair(s)
          else XxHash64Function.hash(s, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** MinHash signature over a shingle array: element k is
  * min over shingles of xxhash64(shingle, seed = k).
  *
  * Accepts `array<string>` (hash the shingle text per seed) or
  * `array<long>` (shingles pre-hashed once by the producer — the
  * DedupOps.shingleArrays representation; re-seeding then mixes ONE
  * 8-byte value per seed instead of re-hashing a ~20-char string 32
  * times, which is the dominant per-row cost of signature building). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string> or array<long>, got $t")
    }

  private lazy val longInput: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        if (longInput) {
          val v = arr.getLong(i)
          var k = 0
          while (k < numHashes) {
            val h = XxHash64Function.hash(v, LongType, k.toLong)
            if (h < mins(k)) mins(k) = h
            k += 1
          }
        } else {
          val s = arr.getUTF8String(i)
          var k = 0
          while (k < numHashes) {
            val h = XxHash64Function.hash(s, StringType, k.toLong)
            if (h < mins(k)) mins(k) = h
            k += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** Modular polynomial rolling hash over a string's UTF-16 code units:
  * h = (h·31 + unit) mod 1e9+7, h₀ = 0. One compiled pass per document;
  * the HOF formulation (`aggregate(split(text,''), …)`) interprets its
  * lambda per character AND materializes a one-string-per-char array —
  * both disappear here. Matches the reference fold in TextOpsSpec and
  * DuckDB's list_reduce oracle (identical for BMP text, which is all
  * the corpus contains). */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rollhash expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      h = (h * 31 + s.charAt(i)) % 1000000007L // operands stay positive
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
}

object TextHashExpressions {
  /** The ONE simhash64 builder (used by both `register` and
    * GraftExtensions): the optional second argument must be a
    * non-null literal boolean — a column, an int, or a NULL literal
    * would otherwise be silently coerced to portable=false and the
    * query would compute xxhash signatures while its oracle expects
    * the portable fold. */
  def simhash64Builder(exprs: Seq[Expression]): SimHash64 = {
    val portable = exprs.drop(1) match {
      case Seq() => false
      case Seq(p) if p.foldable &&
          p.dataType == org.apache.spark.sql.types.BooleanType &&
          p.eval() != null =>
        p.eval().asInstanceOf[Boolean]
      case _ => throw new IllegalArgumentException(
        "simhash64's optional second argument must be a non-null boolean literal")
    }
    SimHash64(exprs.head, portable)
  }

  /** Shared strict builder for `minhash_sig(tokens, n)` — validates the
    * signature width the same way [[simhash64Builder]] validates its
    * flag, and is installed by both registration paths. */
  def minhashSigBuilder(exprs: Seq[Expression]): MinHashSignature = {
    if (exprs.length != 2) throw new IllegalArgumentException(
      s"minhash_sig takes (tokens, n), got ${exprs.length} args")
    MinHashSignature(exprs(0),
      SrpExpressions.intLit("minhash_sig", "n", exprs(1)))
  }

  /** Register simhash64 / minhash_sig / rollhash in the session
    * (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64", simhash64Builder, "built-in")
    reg.createOrReplaceTempFunction("minhash_sig", minhashSigBuilder, "built-in")
    reg.createOrReplaceTempFunction("rollhash",
      exprs => RollingHash(exprs.head), "built-in")
  }
}
