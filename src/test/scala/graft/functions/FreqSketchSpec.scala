package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries bounds under Spark's partial/merge aggregation paths. */
class FreqSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish stream: term_i appears ~ n/i times, plus noise terms. */
  private def stream(n: Int): Seq[String] =
    (1 to 20).flatMap(i => Seq.fill(n / i)(s"hot_$i")) ++
      (0 until n).map(i => s"noise_${i % (n / 2)}")

  private def sketch(terms: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    FreqSketch.register(spark)
    val rows = terms.toDF("term").repartition(parts)
    rows.agg(call_function("freq_sketch", col("term"), lit(k)).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("every item above N/(k+1) survives, on any partitioning") {
    val terms = stream(2000)
    val n = terms.size.toLong
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 40
    for (parts <- Seq(1, 4, 13)) {
      val sk = sketch(terms, k, parts)
      val mustKeep = exact.filter(_._2 > n / (k + 1)).keySet
      assert(mustKeep.subsetOf(sk.keySet),
        s"parts=$parts lost ${mustKeep -- sk.keySet}")
      assert(sk.size <= k, s"parts=$parts kept ${sk.size} > k=$k")
    }
  }

  test("estimates undercount by at most N/(k+1) and never overcount") {
    val terms = stream(2000)
    val n = terms.size.toLong
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 40
    val sk = sketch(terms, k, 4)
    sk.foreach { case (t, est) =>
      val truth = exact.getOrElse(t, 0L)
      assert(est <= truth, s"$t overcounted: $est > $truth")
      assert(truth - est <= n / (k + 1), s"$t undercounted too far: $est vs $truth")
    }
  }

  test("sketch candidates ⊇ the exact q_heavy_hitters result") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.SparkEntry.queries("q_heavy_hitters")(spark, dir)
      .select("term").as[String].collect().toSet
    FreqSketch.register(spark)
    // 0.1% threshold → k = 1999 guarantees freq > N/(k+1) = N·0.05% kept;
    // use k = 2048.
    val sk = graft.table(spark, dir, "documents")
      .select(explode(split(trim(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .agg(call_function("freq_sketch", col("term"), lit(2048)).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.term")).as[String].collect().toSet
    assert(exact.subsetOf(sk), s"sketch missed ${exact -- sk}")
  }
}
