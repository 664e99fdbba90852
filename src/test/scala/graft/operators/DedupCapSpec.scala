package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DF-capped containment (round-6 verdict #2): on a planted corpus
  * where 300 documents share one boilerplate sentence, the uncapped
  * shingle self-join generates ~df²/2 candidate pairs from that single
  * hot shingle; the df ≤ 256 cap removes it from the representation and
  * the candidate set collapses to the genuinely-related pairs. The
  * capped semantics are pinned by an independent plain-Scala
  * derivation (string shingles, df filter, pairwise containment).
  */
class DedupCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val boiler = "all rights reserved this page is auto generated content"
  // 300 hot docs: shared boilerplate + unique tail (df(boiler shingles)=300 > 256)
  private val hotDocs = (1 to 300).map { i =>
    (i.toLong, s"$boiler unique$i token$i filler$i")
  }
  // planted containment pair, no boilerplate: 1001's shingles ⊂ 1002's
  private val contained = "alpha beta gamma delta epsilon zeta"
  private val plantedDocs = Seq(
    (1001L, contained),
    (1002L, s"$contained eta theta iota kappa"),
    (1003L, "totally unrelated words appear only here once each time"))
  private lazy val docs = (hotDocs ++ plantedDocs).toDF("doc_id", "text")

  private def candidatePairs(sh: org.apache.spark.sql.DataFrame): Long =
    sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("b.doc_id") > col("a.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()

  test("df cap collapses the hot-shingle candidate blow-up") {
    val sh = DedupOps.shingles(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    val uncapped = candidatePairs(sh)
    val capped = candidatePairs(DedupOps.dfCappedShingles(sh, 256))
    // 300 docs sharing the boilerplate alone force 300·299/2 = 44 850 pairs
    assert(uncapped >= 44850L, s"planting failed: uncapped=$uncapped")
    assert(capped <= 10L, s"cap ineffective: capped=$capped")
    assert(uncapped / math.max(1L, capped) >= 1000L,
      s"reduction only ${uncapped}→${capped}")
  }

  test("capped containment matches an independent plain-Scala derivation") {
    val sh = DedupOps.shingles(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    val got = DedupOps.containmentPairs(DedupOps.dfCappedShingles(sh, 256), 0.9)
      .select("d1", "d2", "containment")
      .as[(Long, Long, Double)].collect().toSet

    // independent derivation: string shingles, df ≤ 256, pairwise
    def shingleSet(text: String): Set[String] = {
      val w = text.trim.split(" ")
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val all = (hotDocs ++ plantedDocs).map { case (id, t) => id -> shingleSet(t) }
    val df = all.flatMap(_._2).groupBy(identity).map { case (s, xs) => s -> xs.size }
    val cappedSets = all.map { case (id, s) => id -> s.filter(df(_) <= 256) }
      .filter(_._2.nonEmpty)
    val expect = (for {
      (d1, s1) <- cappedSets; (d2, s2) <- cappedSets if d2 > d1
      inter = (s1 & s2).size if inter > 0
      c = BigDecimal(inter.toDouble / math.min(s1.size, s2.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= 0.9
    } yield (d1, d2, c)).toSet
    assert(expect.contains((1001L, 1002L, 1.0)), "planting failed")
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("capped query equals uncapped on a corpus with no hot shingles (sf0.001)") {
    val sfDir = "/root/testdata/sf0.001"
    val capped = graft.SparkEntry.queries("q_dedup_containment_capped")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    val uncapped = graft.SparkEntry.queries("q_dedup_containment")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped == uncapped,
      s"cap changed the answer on a benign corpus: ${capped.size} vs ${uncapped.size}")
  }
}
