package graft.functions

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded aggregates must return exactly what the row_number-window
  * formulations they replaced returned — same values, same order, same
  * ties — and must be partitioning-independent (the map-side-combine
  * path merges per-partition heaps). */
class TopKAggregateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topkBy(score: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column, k: Int) =
    call_function("topk_by", score, id, lit(k))

  // 3 groups × 200 candidates with planted score ties.
  private lazy val cand = {
    TopKBy.register(spark)
    (0 until 600).map { i =>
      (i % 3L, i.toLong, (i % 7).toDouble) // score ties everywhere
    }.toDF("g", "id", "score")
  }

  test("topk_by matches the row_number window formulation, ties included") {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val expected = cand
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select("g", "id", "score", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

    val got = cand.groupBy("g")
      .agg(topkBy(col("score"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.id"), col("col.score"),
        (col("pos") + 1).cast("long").as("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

    assert(got == expected)
  }

  test("topk_by is partitioning-independent (map-side merge is exact)") {
    def run(parts: Int) = cand.repartition(parts).groupBy("g")
      .agg(topkBy(col("score"), col("id"), 7).as("top"))
      .select(col("g"), col("top"))
      .collect().map(r => (r.getLong(0), r.getSeq[Any](1).mkString(","))).toSet
    assert(run(1) == run(13))
  }

  test("topk_by with k larger than the group returns the whole group ranked") {
    val one = Seq((1L, 10L, 0.5), (1L, 11L, 0.9)).toDF("g", "id", "score")
    val rows = one.groupBy("g").agg(topkBy(col("score"), col("id"), 100).as("t"))
      .select(explode(col("t.id"))).as[Long].collect().toSeq
    assert(rows == Seq(11L, 10L))
  }

  test("argmax_by picks max score, smallest id on ties, and carries any payload") {
    val df = Seq(
      (1L, 3L, 2.0, "c"), (1L, 1L, 2.0, "a"), (1L, 2L, 1.0, "b"),
      (2L, 9L, -1.0, "z"), (2L, 8L, -1.0, "y")
    ).toDF("g", "id", "score", "tag")
    val got = df.groupBy("g")
      .agg(call_function("argmax_by", struct(col("tag"), col("id")),
        col("score"), col("id")).as("best"))
      .select(col("g"), col("best.tag"), col("best.id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "a", 1L), (2L, "y", 8L)))
  }

  test("argmax_by survives shuffle serialization with array payloads") {
    val df = (0 until 400).map { i =>
      (i % 4L, i.toLong, (i % 11).toDouble, Array.fill(8)(i.toFloat))
    }.toDF("g", "id", "score", "vec")
    def run(parts: Int) = df.repartition(parts).groupBy("g")
      .agg(call_function("argmax_by", struct(col("id"), col("vec")),
        col("score"), col("id")).as("b"))
      .select(col("g"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // best = highest score, smallest id: score 10 first occurs at i=10,21,32,43 → g=i%4
    assert(run(3) == run(17))
    assert(run(3) == Set((2L, 10L), (1L, 21L), (0L, 32L), (3L, 43L)))
  }

  test("argmax_by of an empty group set yields no rows, all-null input yields null") {
    val df = Seq((1L, Option.empty[Double], 5L)).toDF("g", "score", "id")
    val r = df.groupBy("g")
      .agg(call_function("argmax_by", col("id"), col("score"), col("id")).as("b"))
      .collect()
    assert(r.length == 1 && r(0).isNullAt(1))
  }

  // ---- topk_str_by (string payload + binary-order tie-break) ----

  // 4 groups × 250 terms; every score repeats so the string tie-break
  // decides most of the ranking.
  private lazy val terms = {
    TopKBy.register(spark)
    (0 until 1000).map { i =>
      (i % 4L, f"term${i % 37}%03d-${i % 5}", (i % 6).toDouble)
    }.toDF("g", "term", "score")
  }

  test("topk_str_by matches the row_number window formulation, string ties included") {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("term"))
    val expected = terms.distinct()
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 6)
      .select("g", "term", "score", "rn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet

    val got = terms.distinct().groupBy("g")
      .agg(call_function("topk_str_by", col("score"), col("term"), lit(6)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.term"), col("col.score"),
        (col("pos") + 1).cast("long").as("rn"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet

    assert(got == expected)
  }

  test("topk_str_by is partitioning-independent and survives shuffle serialization") {
    def run(parts: Int) = terms.repartition(parts).distinct().groupBy("g")
      .agg(call_function("topk_str_by", col("score"), col("term"), lit(9)).as("top"))
      .select(col("g"), col("top").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(run(1) == run(13))
  }

  test("topk_str_by clones strings out of reused row buffers") {
    // Long strings (off-heap UTF8String backing) in a wide scan: if the
    // aggregate kept references into the reused row, results would be
    // garbage after the buffer advances.
    val df = (0 until 300).map { i =>
      (i % 2L, ("x" * 50) + f"$i%04d", i.toDouble)
    }.toDF("g", "term", "score")
    val got = df.groupBy("g")
      .agg(call_function("topk_str_by", col("score"), col("term"), lit(2)).as("t"))
      .select(col("g"), col("t.term"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
    assert(got(0L) == List(("x" * 50) + "0298", ("x" * 50) + "0296"))
    assert(got(1L) == List(("x" * 50) + "0299", ("x" * 50) + "0297"))
  }
}
