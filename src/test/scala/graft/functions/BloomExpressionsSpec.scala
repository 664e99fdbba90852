package graft.functions

import graft.TestSpark
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** Pins the codegen'd bloom probe that replaced the Scala-UDF prefilter
  * in q_decontaminate_bloom (round-7 verdict, "what's wrong" #4):
  *
  *  1. semantics — agrees with `BloomFilter.mightContainLong` exactly
  *     (zero false negatives on inserted keys; identical verdicts on a
  *     random probe set, false positives included) on BOTH the
  *     interpreted eval and the codegen path that a DataFrame filter
  *     compiles;
  *  2. null contract — null probe and corrupt/null filter bytes → NULL;
  *  3. plan shape — the filter compiles with no ScalaUDF / BatchEval
  *     node, so the scan-side whole-stage span stays intact.
  */
class BloomExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkBloom(keys: Seq[Long]): BloomFilter = {
    val bf = BloomFilter.create(10000, 0.01)
    keys.foreach(bf.putLong)
    bf
  }

  test("dataframe probe (codegen path) matches mightContainLong verdicts") {
    val inserted = (0L until 500L).map(_ * 7919L + 3L)
    val bf = mkBloom(inserted)
    val probes = (0L until 4000L).map(i => i * 104729L % 1000003L) ++ inserted
    val got = probes.toDF("h")
      .withColumn("m", BloomExpressions.probe(spark, bf, col("h")))
      .as[(Long, Boolean)].collect().toMap
    probes.foreach { h => assert(got(h) === bf.mightContainLong(h), s"h=$h") }
    // sanity: every inserted key present, and filtering is selective
    inserted.foreach(h => assert(got(h)))
    val kept = probes.count(got)
    assert(kept < probes.size, "filter admitted everything — not selective")
  }

  test("interpreted eval agrees with codegen on the same expression") {
    val bf = mkBloom(Seq(1L, 42L, 99L))
    val fx = Literal(BloomExpressions.serialize(bf), BinaryType)
    val bc = spark.sparkContext.broadcast(bf)
    Seq(1L, 2L, 42L, 43L, 99L, 100L).foreach { h =>
      val e = BloomMightContain(fx, Literal(h, LongType))
      assert(e.eval(InternalRow.empty) === bf.mightContainLong(h))
      // broadcast-backed form agrees too (same per-row verdicts)
      val p = BloomProbe(Literal(h, LongType), bc)
      assert(p.eval(InternalRow.empty) === bf.mightContainLong(h))
    }
    assert(BloomProbe(Literal(null, LongType), bc).eval(InternalRow.empty) == null)
  }

  test("null probe and corrupt filter bytes yield NULL") {
    val bf = mkBloom(Seq(5L))
    val fx = Literal(BloomExpressions.serialize(bf), BinaryType)
    assert(BloomMightContain(fx, Literal(null, LongType)).eval(InternalRow.empty) == null)
    val corrupt = Literal(Array[Byte](1, 2, 3), BinaryType)
    assert(BloomMightContain(corrupt, Literal(7L, LongType)).eval(InternalRow.empty) == null)
    // DataFrame filter over the corrupt bytes drops every row (NULL ≠ true)
    BloomExpressions.register(spark)
    val n = Seq(1L, 2L).toDF("h")
      .filter(call_function("bloom_might_contain", lit(Array[Byte](1, 2, 3)), col("h")))
      .count()
    assert(n === 0L)
  }

  test("compiled plan contains no ScalaUDF (whole-stage span intact)") {
    val bf = mkBloom(Seq(3L))
    val df = Seq(1L, 2L, 3L).toDF("h")
      .filter(BloomExpressions.probe(spark, bf, col("h")))
    val qe: QueryExecution = df.queryExecution
    val physical = qe.executedPlan.toString()
    assert(!physical.contains("ScalaUDF"), physical)
    assert(!physical.contains("BatchEvalPython"), physical)
    assert(df.count() === 1L)
  }
}
