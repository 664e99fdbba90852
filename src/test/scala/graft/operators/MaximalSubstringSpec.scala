package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** `SubstringDedup.maximalRuns` — maximal duplicated substrings with
  * true lengths (the Lee-et-al. contract under the every-K-window
  * relaxation) — pinned against a BRUTE-FORCE all-substrings check on
  * a planted corpus: for every document, every interval is tested
  * directly for "all of its K-windows are duplicated grams", maximal
  * such intervals collected, and the operator must emit exactly that
  * set with exactly those lengths. */
class MaximalSubstringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = SubstringDedup.K

  /** Brute force, mirroring the operator's keep-first semantics: a
    * gram occurrence is a DUP iff it is not the corpus-wide
    * (doc_id, pos)-lexicographic first of a gram seen >= 2 times. */
  private def bruteForce(docs: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split(" ").toSeq }
    val occs = for {
      (id, w) <- toks if w.size >= K
      p <- 0 to (w.size - K)
    } yield (w.slice(p, p + K).mkString(" "), id, p)
    val byGram = occs.groupBy(_._1).filter(_._2.size >= 2)
    val dupStarts = byGram.values.flatMap { os =>
      val first = os.map(o => (o._2, o._3)).min
      os.map(o => (o._2, o._3)).filterNot(_ == first)
    }.toSet
    // maximal stride-1 runs of duplicated starts, per doc
    dupStarts.groupBy(_._1).flatMap { case (id, ss) =>
      val sorted = ss.map(_._2).toSeq.sorted
      val runs = sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, e0) :: rest, p) if p == e0 + 1 => (s0, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      runs.map { case (s0, e0) =>
        (id, s0.toLong, (e0 - s0 + 1 + K - 1).toLong)
      }
    }.toSet
  }

  private def operator(docs: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    val raw = docs.toDF("doc_id", "text")
    SubstringDedup.maximalRuns(
      SubstringDedup.dupIntervals(SubstringDedup.tokenize(raw)))
      .as[(Long, Long, Long)].collect().toSet
  }

  private def words(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$tag$i")

  test("planted repeats: run-length arithmetic exact (a 20-token repeat " +
      "is one span of length 20 on the SECOND occurrence only)") {
    val repeat = words("r", 20)
    val docs = Seq(
      1L -> (words("a", 5) ++ repeat ++ words("b", 6)).mkString(" "),
      2L -> (words("c", 3) ++ repeat ++ words("d", 4)).mkString(" "))
    val got = operator(docs)
    // doc 1 holds the corpus-first occurrence of every repeat gram —
    // charged nothing; doc 2's copy is one maximal 20-token span
    // starting at token 3, i.e. 13 consecutive duplicated gram starts
    assert(got == Set((2L, 3L, 20L)), got)
    assert(got == bruteForce(docs))
  }

  test("overlapping-but-not-consecutive dup grams split into separate " +
      "maximal substrings (the island-vs-run distinction)") {
    // two 8-token repeats placed 3 apart in doc 2: dup starts {3, 6}
    // are non-consecutive, so TWO spans of 8 — not one 11-token span
    // (the 9-token substrings spanning the gap do not repeat)
    val r1 = words("x", 8)
    val r2 = words("y", 8)
    val gap = words("g", 0)
    val docs = Seq(
      1L -> (r1 ++ words("p", 9) ++ r2).mkString(" "),
      2L -> (words("q", 3) ++ r1.take(3) ++ r1 ++ words("z", 5)).mkString(" "))
    val got = operator(docs)
    assert(got == bruteForce(docs), s"got $got vs ${bruteForce(docs)}")
  }

  test("20 seeded random corpora with planted repeats of lengths 8..40 " +
      "(cross-doc, within-doc, adjacent, overlapping) match brute force " +
      "exactly") {
    val rnd = new scala.util.Random(20260821L)
    (1 to 20).foreach { trial =>
      // small vocab so accidental gram repeats also occur
      def tok() = s"w${rnd.nextInt(12)}"
      val nDocs = 3 + rnd.nextInt(3)
      val base = (0 until nDocs).map { d =>
        d.toLong -> Vector.fill(10 + rnd.nextInt(30))(tok())
      }.toMap
      // plant: copy a random slice of one doc into another (or itself)
      val planted = (1 to 2 + rnd.nextInt(3)).foldLeft(base) { (acc, _) =>
        val from = rnd.nextInt(nDocs).toLong
        val to = rnd.nextInt(nDocs).toLong
        val src = acc(from)
        if (src.size < K) acc
        else {
          val len = K + rnd.nextInt(math.min(33, src.size - K + 1))
          val off = rnd.nextInt(src.size - len + 1)
          val slice = src.slice(off, off + len)
          val dst = acc(to)
          val ins = rnd.nextInt(dst.size + 1)
          acc.updated(to, dst.take(ins) ++ slice ++ dst.drop(ins))
        }
      }
      val docs = planted.toSeq.sortBy(_._1)
        .map { case (id, w) => id -> w.mkString(" ") }
      assert(operator(docs) == bruteForce(docs), s"trial $trial drifted")
    }
  }
}
