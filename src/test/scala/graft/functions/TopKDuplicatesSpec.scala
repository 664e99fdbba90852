package graft.functions

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Duplicate-input semantics of the bounded top-k aggregates (round-3
  * advice): the only tie the (score DESC, id ASC) total order admits is
  * an exact-duplicate tuple, and rejecting a candidate equal to a full
  * buffer's worst element leaves an identical multiset — so the heap
  * must return exactly the k-best MULTISET, matching the row_number
  * window formulation row for row and independent of partitioning.
  * This spec feeds duplicated rows (1–4 copies each) through both
  * formulations under several physical partitionings and compares the
  * per-group output as an ordered list (duplicates counted). */
class TopKDuplicatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 groups × ~120 base rows, each row replicated 1–4 times, with
  // planted score ties BETWEEN distinct ids (i % 5) so both tie kinds
  // (distinct-id score ties and exact-duplicate rows) cross the k edge.
  private lazy val dup = {
    TopKBy.register(spark)
    val rng = new scala.util.Random(42)
    val rows = (0 until 480).flatMap { i =>
      val copies = 1 + rng.nextInt(4)
      Seq.fill(copies)((i % 4L, i.toLong, (i % 5).toDouble))
    }
    rng.shuffle(rows).toDF("g", "id", "score")
  }

  private def windowTopK(k: Int): Map[Long, Seq[(Double, Long)]] = {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    dup.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("g", "score", "id")
      .collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2))))
      .groupBy(_._1).map { case (g, rs) => (g, rs.map(_._2).sorted(
        Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])).toSeq) }
  }

  private def aggTopK(k: Int, parts: Int): Map[Long, Seq[(Double, Long)]] =
    dup.repartition(parts).groupBy("g")
      .agg(call_function("topk_by", col("score"), col("id"), lit(k)).as("top"))
      .select(col("g"), col("top"))
      .collect()
      .map { r =>
        val arr = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getDouble(0), x.getLong(1)))
        (r.getLong(0), arr.toSeq)
      }.toMap

  test("topk_by on duplicated rows equals the window top-k multiset") {
    for (k <- Seq(1, 3, 7, 25)) {
      val expected = windowTopK(k)
      for (parts <- Seq(1, 7, 32)) {
        assert(aggTopK(k, parts) == expected,
          s"k=$k parts=$parts diverged from the window formulation")
      }
    }
  }

  test("topk_str_by on duplicated rows equals the window top-k multiset") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 300).flatMap { i =>
      Seq.fill(1 + rng.nextInt(3))((i % 3L, f"t${i % 40}%03d", (i % 5).toDouble))
    }
    val df = rng.shuffle(rows).toDF("g", "term", "score")
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("term"))
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 9).select("g", "score", "term")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getString(2))))
      .groupBy(_._1).map { case (g, rs) => (g, rs.map(_._2).sorted(
        Ordering.Tuple2(Ordering[Double].reverse, Ordering[String])).toSeq) }
    for (parts <- Seq(1, 11)) {
      val got = df.repartition(parts).groupBy("g")
        .agg(call_function("topk_str_by", col("score"), col("term"), lit(9)).as("top"))
        .select(col("g"), col("top"))
        .collect()
        .map { r =>
          val arr = r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getDouble(0), x.getString(1)))
          (r.getLong(0), arr.toSeq)
        }.toMap
      assert(got == expected, s"parts=$parts diverged from the window formulation")
    }
  }
}
