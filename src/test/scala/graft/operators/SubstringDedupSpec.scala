package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala derivation for q_dedup_substring: a direct
  * gram-index fold (mutable maps, explicit interval merge) over the
  * corpus, plus a planted corpus exercising the contract's edges —
  * keep-first ordering, any-alignment detection (the case fixed
  * passages miss), within-doc repeats, overlapping-span merge, and
  * sub-window docs.
  */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 8

  /** Brute-force keep-first substring-dedup report. */
  private def brute(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split(" ").toSeq }
    val occ = scala.collection.mutable.Map.empty[String, List[(Long, Int)]]
    for ((id, w) <- toks; i <- 0 to w.length - K)
      occ(w.slice(i, i + K).mkString(" ")) =
        (id, i) :: occ.getOrElse(w.slice(i, i + K).mkString(" "), Nil)
    val dup = occ.values.filter(_.size >= 2).flatMap { os =>
      val first = os.minBy(identity)
      os.filter(_ != first)
    }.toSeq
    toks.map { case (id, w) =>
      val iv = dup.filter(_._1 == id).map(o => (o._2, o._2 + K - 1)).sortBy(_._1)
      val merged = iv.foldLeft(List.empty[(Int, Int)]) {
        case (Nil, x) => List(x)
        case ((s, e) :: rest, (s2, e2)) =>
          if (s2 <= e) (s, math.max(e, e2)) :: rest else (s2, e2) :: (s, e) :: rest
      }
      val dupToks = merged.map { case (s, e) => e - s + 1 }.sum.toLong
      (id, w.length.toLong, merged.size.toLong, dupToks,
        BigDecimal(dupToks.toDouble / w.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
  }

  private def run(dir: String): Set[(Long, Long, Long, Long, Double)] =
    graft.SparkEntry.queries("q_dedup_substring")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSet

  test("q_dedup_substring == brute-force gram-index fold on sf0.001") {
    val docs = graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(run("/root/testdata/sf0.001") == brute(docs))
  }

  test("planted corpus: alignment, keep-first, merge, sub-window edges") {
    val w = (1 to 40).map(i => s"w$i")
    val rep = w.take(12).mkString(" ") // 12-token repeat, 5 dup 8-grams
    val docs = Seq(
      // doc 1: first occurrence — must NOT be charged
      (1L, rep + " " + (100 to 110).map(i => s"u$i").mkString(" ")),
      // doc 2: repeat at alignment offset 3 (fixed 8-passages miss this)
      (2L, "x1 x2 x3 " + rep + " " + (200 to 206).map(i => s"v$i").mkString(" ")),
      // doc 3: within-doc repeat — two copies, second is the dup
      (3L, rep + " mid1 mid2 " + rep),
      // doc 4: shorter than the window — no grams at all
      (4L, "a b c d e f g"),
      (5L, (300 to 330).map(i => s"z$i").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("subdedup").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' as lang", "'t' as source",
        "cast(length(text) as long) as n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run(dir)
    assert(got == brute(docs))
    val byId = got.map(r => r._1 -> r).toMap
    // doc 1 is the global first occurrence: zero spans
    assert(byId(1L)._3 == 0L)
    // doc 2's off-alignment repeat found: one span of exactly 12 tokens
    assert(byId(2L)._3 == 1L && byId(2L)._4 == 12L)
    // doc 3: BOTH copies are dups of doc 1's first occurrence — two
    // non-adjacent merged spans (5 overlapping grams each → 12 tokens)
    assert(byId(3L)._3 == 2L && byId(3L)._4 == 24L)
    // doc 4: sub-window, reported with zero dups
    assert(byId(4L) == (4L, 7L, 0L, 0L, 0.0))

    // the applied form: cleaned text == brute-force uncovered tokens
    val cleanGot = graft.SparkEntry.queries("q_dedup_substring_clean")(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    assert(cleanGot == bruteClean(docs))
    val cleanById = cleanGot.map(r => r._1 -> r).toMap
    // doc 2 keeps its unique prefix and tail; the 12-token repeat is gone
    assert(cleanById(2L)._2 ==
      "x1 x2 x3 " + (200 to 206).map(i => s"v$i").mkString(" "))
    // doc 1 (the first occurrence) survives verbatim
    assert(cleanById(1L)._2 ==
      rep + " " + (100 to 110).map(i => s"u$i").mkString(" "))
    // doc 3 keeps only the glue between its two duplicated copies
    assert(cleanById(3L)._2 == "mid1 mid2")
  }

  test("q_dedup_substring_clean == brute-force uncovered tokens on sf0.001") {
    val docs = graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = graft.SparkEntry.queries("q_dedup_substring_clean")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long)].collect().toSet
    assert(got == bruteClean(docs))
  }

  /** Brute-force keep-first cleaned text: tokens not covered by any
    * duplicate-gram interval, reassembled in order. */
  private def bruteClean(docs: Seq[(Long, String)]): Set[(Long, String, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split(" ").toSeq }
    val occ = scala.collection.mutable.Map.empty[String, List[(Long, Int)]]
    for ((id, w) <- toks; i <- 0 to w.length - K)
      occ(w.slice(i, i + K).mkString(" ")) =
        (id, i) :: occ.getOrElse(w.slice(i, i + K).mkString(" "), Nil)
    val dup = occ.values.filter(_.size >= 2).flatMap { os =>
      val first = os.minBy(identity)
      os.filter(_ != first)
    }.toSeq.groupBy(_._1)
    toks.map { case (id, w) =>
      val covered = dup.getOrElse(id, Nil)
        .flatMap(o => o._2 until o._2 + K).toSet
      val keptToks = w.indices.filterNot(covered).map(w)
      (id, keptToks.mkString(" "), keptToks.size.toLong)
    }.toSet
  }
}
