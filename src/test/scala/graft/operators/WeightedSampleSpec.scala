package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala derivation for q_sample_weighted_det (A-ES
  * keys from MessageDigest md5, explicit sort) plus the statistical
  * sanity a weighted sampler owes: selection frequency must rise with
  * weight.
  */
class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def key(docId: Long, nChars: Long): Double = {
    val h = java.lang.Long.parseLong(md5hex(docId.toString).take(6), 16)
    math.log((h + 1) / 16777217.0) / math.max(nChars, 1L).toDouble
  }

  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_sample_weighted_det == plain-Scala A-ES top-100 on sf0.001") {
    val docs = graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toSeq
    val expect = docs.map { case (id, nc) => (id, nc, key(id, nc)) }
      .sortBy { case (id, _, k) => (-k, id) }.take(100).zipWithIndex
      .map { case ((id, nc, k), i) => (id, nc, r9(k), i + 1L) }.toSet
    val got = graft.SparkEntry.queries("q_sample_weighted_det")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == expect)
    assert(got.size == 100)
  }

  test("selection probability grows with weight (A-ES law, 2k-doc corpus)") {
    // planted two-weight corpus: 1000 docs at weight 100, 1000 at 400.
    // P(pick) ∝ w under A-ES; the heavy half must dominate the sample
    // (E[heavy picks] = 80 of 100; binomial σ≈4, so ≥65 is a >3σ-safe
    // one-sided bound while still rejecting an unweighted sampler,
    // whose E=50 sits 3.8σ below it).
    val docs = (1L to 2000L).map(i => (i, if (i <= 1000) 100L else 400L))
    val picks = docs.map { case (id, w) => (id, w, key(id, w)) }
      .sortBy { case (id, _, k) => (-k, id) }.take(100)
    val heavy = picks.count(_._2 == 400L)
    assert(heavy >= 65, s"heavy-weight picks only $heavy/100")
  }
}
