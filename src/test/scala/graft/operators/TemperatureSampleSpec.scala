package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala derivation for q_sample_temperature
  * (MessageDigest coin, explicit p^0.3 rate arithmetic) plus the
  * flattening law: the sampled language distribution must sit closer
  * to uniform than the corpus distribution it rebalances.
  */
class TemperatureSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q_sample_temperature == plain-Scala rate + coin derivation") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "lang").as[(Long, String)].collect().toSeq
      .filter(_._2 != null)
    val cl = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = cl.values.sum
    val w = cl.view.mapValues(c => math.pow(c / n.toDouble, 0.3)).toMap
    // decimal normalizer, matching both engines' order-independent sum
    val sumw = w.values.map(x => BigDecimal(x).setScale(10,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val t = cl.map { case (l, c) =>
      l -> math.min(1.0, 0.2 * n * (w(l) / sumw) / c) * 16777216.0 }
    val expect = docs.filter { case (id, l) =>
      java.lang.Long.parseLong(md5hex(s"temp:$l:$id").take(6), 16) < t(l)
    }.toSet
    val got = graft.SparkEntry.queries("q_sample_temperature")(spark, sfDir)
      .as[(Long, String)].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty)

    // flattening law: L1 distance to uniform shrinks vs the corpus
    def l1ToUniform(m: Map[String, Long]): Double = {
      val tot = m.values.sum.toDouble
      m.values.map(v => math.abs(v / tot - 1.0 / m.size)).sum
    }
    val sampled = got.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(sampled.keySet == cl.keySet, "a language vanished from the sample")
    assert(l1ToUniform(sampled) < l1ToUniform(cl),
      s"sample not flatter: ${l1ToUniform(sampled)} vs ${l1ToUniform(cl)}")
  }
}
