package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `bottomk_dec` — the bounded k-extreme decimal aggregate behind
  * IncrementalView's MIN/MAX buffers. The contract: exactly the
  * k-smallest (or largest) MULTISET of the group, extreme-first,
  * independent of partitioning (map-side merge exact), duplicates
  * retained, exact decimals end to end. */
class BottomKDecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(vals: (String, String)*) = {
    BottomKDec.register(spark)
    vals.toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(38,10)").as("v"))
  }

  private def run(d: org.apache.spark.sql.DataFrame, k: Int, desc: Boolean) =
    d.groupBy("g")
      .agg(expr(s"bottomk_dec(v, $k, $desc)").as("b"))
      .as[(String, Seq[BigDecimal])].collect().toMap

  test("k smallest / largest multisets, duplicates retained, extreme-first") {
    val d = df(("a", "3.5"), ("a", "1.25"), ("a", "1.25"), ("a", "9"),
      ("a", "0.5"), ("b", "7"))
    val lo = run(d, 3, desc = false)
    assert(lo("a") == Seq(BigDecimal("0.5"), BigDecimal("1.25"),
      BigDecimal("1.25")).map(_.setScale(10)), lo("a"))
    assert(lo("b") == Seq(BigDecimal("7").setScale(10)))
    val hi = run(d, 2, desc = true)
    assert(hi("a") == Seq(BigDecimal("9"), BigDecimal("3.5"))
      .map(_.setScale(10)), hi("a"))
  }

  test("k beyond the group returns the whole group ranked") {
    val d = df(("a", "2"), ("a", "1"))
    assert(run(d, 8, desc = false)("a") ==
      Seq(BigDecimal("1"), BigDecimal("2")).map(_.setScale(10)))
  }

  test("partitioning-independent: merge path equals single-partition run") {
    val vals = (1 to 500).map(i => ("g", ((i * 7919) % 977).toString))
    val one = run(df(vals: _*).coalesce(1), 5, desc = false)
    val many = run(df(vals: _*).repartition(13), 5, desc = false)
    assert(one == many)
    // the shuffle exercised serialize/deserialize; also pin the values
    val expect = vals.map(v => BigDecimal(v._2)).sorted.take(5)
      .map(_.setScale(10))
    assert(many("g") == expect)
  }

  test("nulls are skipped; all-null group yields an empty array") {
    BottomKDec.register(spark)
    val d = Seq(("a", Some("1")), ("a", None), ("b", None))
      .toDF("g", "v")
      .select(col("g"), col("v").cast("decimal(38,10)").as("v"))
    val got = run(d, 3, desc = false)
    assert(got("a") == Seq(BigDecimal("1").setScale(10)))
    assert(got("b").isEmpty)
  }

  test("non-decimal value is rejected at analysis") {
    BottomKDec.register(spark)
    val d = Seq(("a", 1.0)).toDF("g", "v")
    val e = intercept[Exception](
      d.groupBy("g").agg(expr("bottomk_dec(v, 3, false)")).collect())
    assert(e.getMessage.contains("decimal"), e.getMessage)
  }
}
