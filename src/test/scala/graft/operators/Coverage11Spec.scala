package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala derivations for the round-7 Coverage11
  * additions that have non-trivial semantics beyond their oracle SQL:
  * kNN majority-vote classification and per-source token-budget
  * sampling (the greedy-prefix property the SQL encodes implicitly).
  */
class Coverage11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("q_knn_classify == plain-Scala brute-force vote") {
    val vecs = graft.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = vecs.filter(_._1 < 20).map { case (qid, qv, _) =>
      val top5 = vecs.filter(_._1 != qid)
        .map { case (id, v, lab) => (id, lab, cos(v, qv)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(5)
      val (label, votes) = top5.groupBy(_._2).view.mapValues(_.size).toSeq
        .minBy { case (lab, n) => (-n, lab) }
      (qid, label, votes.toLong)
    }.toSet
    val got = graft.SparkEntry.queries("q_knn_classify")(spark, sfDir)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == expect)
    assert(got.size == 20)
  }

  test("IVF kNN classification mostly agrees with brute force (recall-style)") {
    val brute = graft.SparkEntry.queries("q_knn_classify")(spark, sfDir)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._2).toMap
    val ivf = graft.SparkEntry.queries("q_knn_classify_ivf")(spark, sfDir)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(ivf.keySet == brute.keySet)
    val agree = brute.count { case (q, lab) => ivf(q) == lab }
    assert(agree >= (brute.size * 0.8).toInt,
      s"IVF agreed on $agree of ${brute.size} predictions")
  }

  test("q_top_ngrams == plain-Scala bigram count with total-order tie-break") {
    val texts = graft.table(spark, sfDir, "documents")
      .select("text").as[String].collect()
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val w = t.trim.split(" ", -1)
      if (w.length >= 2)
        (0 until w.length - 1).foreach { i =>
          val bg = s"${w(i)} ${w(i + 1)}"
          counts(bg) = counts.getOrElse(bg, 0L) + 1
        }
    }
    val expect = counts.toSeq.sortBy { case (bg, n) => (-n, bg) }.take(20)
    val got = graft.SparkEntry.queries("q_top_ngrams")(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(got == expect)
  }

  test("q_source_overlap == plain-Scala all-pairs jaccard matrix") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    val shingles = docs.map { case (id, src, text) =>
      val w = text.trim.split(" ")
      val sh = if (w.length < 3) Set.empty[String]
        else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
      (id, src, sh)
    }
    val pairs = for {
      i <- shingles.indices; j <- (i + 1) until shingles.length
      (id1, s1, a) = shingles(i); (id2, s2, b) = shingles(j)
      if a.nonEmpty && b.nonEmpty
      inter = (a & b).size
      if inter > 0
      jac = BigDecimal(inter.toDouble / (a.size + b.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac >= 0.8
    } yield (Seq(s1, s2).min, Seq(s1, s2).max)
    val expect = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.SparkEntry.queries("q_source_overlap")(spark, sfDir)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expect)
    assert(got.nonEmpty, "corpus must contain planted near-dups")
  }

  test("q_ngram_coverage == plain-Scala eval-vs-train gram containment") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    def grams(t: String): Set[String] = {
      val w = t.trim.split(" ")
      if (w.length < 8) Set.empty
      else (0 to w.length - 8).map(i => (i until i + 8).map(w).mkString(" ")).toSet
    }
    val train = docs.filter(_._1 % 10 != 0).flatMap(d => grams(d._2)).toSet
    val expect = docs.filter(_._1 % 10 == 0).flatMap { case (id, t) =>
      val g = grams(t)
      if (g.isEmpty) None
      else {
        val cov = g.count(train)
        Some(id -> ((g.size.toLong, cov.toLong,
          BigDecimal(cov.toDouble / g.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
      }
    }.toMap
    val got = graft.SparkEntry.queries("q_ngram_coverage")(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q_corpus_prep == plain-Scala quality -> dedup -> budget composition") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    // stage 1: alpha-ratio above the 25th percentile (Spark's
    // continuous-interpolation definition: idx = p*(n-1))
    val alphas = docs.map { case (id, _, t) =>
      id -> t.count(c => c >= 'a' && c <= 'z').toDouble / t.length }.toMap
    val sorted = alphas.values.toArray.sorted
    val idx = 0.25 * (sorted.length - 1)
    val lo = idx.toInt
    val cut = if (lo == sorted.length - 1) sorted(lo)
      else sorted(lo) + (sorted(lo + 1) - sorted(lo)) * (idx - lo)
    val quality = docs.filter { case (id, _, _) => alphas(id) > cut }
    // stage 2: keep min doc_id per normalized text
    val keep = quality.groupBy { case (_, _, t) => t.trim.toLowerCase }
      .map { case (_, g) => g.map(_._1).min }.toSet
    val deduped = quality.filter { case (id, _, _) => keep(id) }
    // stage 3: greedy md5-order budget per source
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = deduped
      .map { case (id, src, t) => (id, src, t.trim.split("\\s+").length.toLong) }
      .groupBy(_._2).iterator.flatMap { case (_, rows) =>
        rows.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
          .scanLeft((0L, "", 0L, 0L)) { case ((_, _, _, cum), (id, src, t)) =>
            (id, src, t, cum + t) }
          .drop(1)
          .takeWhile { case (_, _, t, cum) => cum - t < 600 }
      }.toSet
    val got = graft.SparkEntry.queries("q_corpus_prep")(spark, sfDir)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q_token_budget selects exactly the greedy per-source prefix") {
    val picked = graft.SparkEntry.queries("q_token_budget")(spark, sfDir)
      .as[(Long, String, Long, Long)].collect()
    val all = graft.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // greedy prefix in md5 order: in iff running total BEFORE it < 600
    val expect = all
      .map { case (id, src, text) =>
        (id, src, text.trim.split("\\s+").length.toLong) }
      .groupBy(_._2).iterator.flatMap { case (_, docs) =>
        docs.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
          .scanLeft((0L, "", 0L, 0L)) { case ((_, _, _, cum), (id, src, t)) =>
            (id, src, t, cum + t) }
          .drop(1)
          .takeWhile { case (_, _, t, cum) => cum - t < 600 }
      }.toSet
    assert(picked.toSet == expect)
    // the NEXT doc in each source's order would have crossed the budget:
    // every source's selected token mass is >= 600 or the whole source
    val bySource = picked.groupBy(_._2)
    val totals = all.groupBy(_._2).view
      .mapValues(_.map(_._3.trim.split("\\s+").length.toLong).sum).toMap
    bySource.foreach { case (src, rows) =>
      val mass = rows.map(_._3).sum
      assert(mass >= 600 || mass == totals(src),
        s"$src stopped early: $mass of ${totals(src)}")
    }
  }
}
