package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala derivation for q_bm25: textbook Okapi BM25
  * computed with explicit maps and folds over the collected corpus,
  * plus the ranking laws a retrieval scorer owes (more matched terms →
  * higher score at equal lengths; longer doc → lower score at equal
  * term counts).
  */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Q = Seq("hash", "join", "filter")
  private val K1 = 1.2; private val B = 0.75

  private def bm25(docs: Seq[(Long, String)]): Seq[(Long, Double, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split(" ").toSeq }
    val n = toks.size.toLong
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
    val df = Q.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    val scored = toks.flatMap { case (id, w) =>
      val dl = w.length
      val terms = Q.filter(w.contains)
      if (terms.isEmpty) None
      else Some(id -> terms.map { t =>
        val tf = w.count(_ == t).toLong
        val c = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        BigDecimal(c).setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }.sum)
    }
    scored.sortBy { case (id, sc) => (-sc, id) }.take(20).zipWithIndex.map {
      case ((id, sc), i) =>
        (id, BigDecimal(sc.toDouble).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble, i + 1L)
    }
  }

  test("q_bm25 == plain-Scala Okapi fold on sf0.001") {
    val docs = graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = graft.SparkEntry.queries("q_bm25")(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, Long)].collect().toSeq.sortBy(_._3)
    assert(got == bm25(docs))
    assert(got.size == 20)
  }

  test("ranking laws on a planted corpus") {
    val filler = (1 to 40).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, s"hash join filter $filler"),     // all three terms
      (2L, s"hash join x $filler"),          // two terms, same length
      (3L, s"hash x y $filler"),             // one term, same length
      (4L, s"hash x y $filler $filler"),     // one term, twice the length
      (5L, filler))                          // no terms — must not appear
    val r = bm25(docs).map(x => x._1 -> x._2).toMap
    assert(!r.contains(5L))
    assert(r(1L) > r(2L) && r(2L) > r(3L), s"term-coverage law broke: $r")
    assert(r(3L) > r(4L), s"length-normalization law broke: $r")
  }
}
