package graft.operators

import graft.TestSpark
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 second wave: MMR diversified re-rank, the ANN recall-vs-
  * nprobe tuning curve, and the corpus-prep funnel. Pins:
  * (1) MMR equals an independent sequential greedy implementation run
  *     over the same integer candidate/pair scores (the unrolled
  *     DataFrame steps vs a plain-Scala loop);
  * (2) MMR picks are 5 distinct candidates per query, led by the
  *     brute-force top-1;
  * (3) recall@10 is monotone non-decreasing in nprobe and bounded by
  *     k — the property that makes the curve a tuning instrument;
  * (4) the funnel is a PARTITION of the corpus (stage counts sum to
  *     the document count) and its kept count equals q_corpus_prep's
  *     row count — the funnel explains the flagship exactly. */
class Coverage22Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  /** The query's own candidate frame (qid, vec_id, rel6, rn ≤ 12),
    * re-derived with the same expressions. */
  private def candidates() = {
    val e = graft.table(spark, sfDir, "embeddings")
    val vq = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    SimilarityOps.bruteForceTopK(e, vq, 12)
      .select(col("qid"), col("vec_id"),
        round(col("cos") * 1000000, 0).cast("long").as("rel6"), col("rn"))
  }

  private def pairSims() = {
    VectorOps.ensure(spark)
    val e = graft.table(spark, sfDir, "embeddings")
    val ce = candidates().select("qid", "vec_id").join(e, "vec_id")
      .select(col("qid"), col("vec_id"), col("embedding"))
    ce.alias("a").join(ce.alias("b"),
        col("a.qid") === col("b.qid") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.qid").as("qid"), col("a.vec_id").as("id1"),
        col("b.vec_id").as("id2"),
        round(round(VectorOps.cosine(col("a.embedding"), col("b.embedding")), 6)
          * 1000000, 0).cast("long").as("sim6"))
  }

  test("q_retrieval_mmr equals a sequential greedy MMR over the same " +
      "integer scores, with 5 distinct picks per query led by the top-1") {
    val cand = candidates().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sims = pairSims().collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    // independent greedy loop: argmax 7·rel6 − 3·maxsim6, (score desc,
    // vec_id) tie-break — no DataFrame machinery
    val expected = cand.map(_._1).distinct.sorted.flatMap { qid =>
      val pool = cand.filter(_._1 == qid).sortBy(_._4)
      var selected = Vector(pool.head)
      var out = Vector((qid, 1L, pool.head._2, pool.head._3, 0L,
        pool.head._3 * 7))
      for (t <- 2 to 5) {
        val rem = pool.filterNot(c => selected.exists(_._2 == c._2))
        val scored = rem.map { c =>
          val maxsim = selected.map(s => sims((qid, c._2, s._2))).max
          (c, maxsim, c._3 * 7 - maxsim * 3)
        }
        val best = scored.minBy { case (c, _, sc) => (-sc, c._2) }
        selected :+= best._1
        out :+= ((qid, t.toLong, best._1._2, best._1._3, best._2, best._3))
      }
      out
    }.toSet
    val got = run("q_retrieval_mmr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected, s"MMR mismatch:\n got=$got\n exp=$expected")
    // shape: 3 queries × 5 distinct picks, pick 1 = brute-force rank 1
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.size == 5 && rows.map(_._3).size == 5)
      val first = rows.find(_._2 == 1L).get
      val top1 = cand.filter(c => c._1 == qid && c._4 == 1L).head
      assert(first._3 == top1._2, s"qid $qid pick 1 must be the top-1")
    }
  }

  test("MMR diversifies: mean pairwise similarity of the picked set " +
      "is no higher than the plain top-5's, summed over queries") {
    val sims = pairSims().collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    def meanPairSim(qid: Long, ids: Seq[Long]): Double = {
      val ps = for (a <- ids; b <- ids if a != b) yield sims((qid, a, b))
      ps.sum.toDouble / ps.size
    }
    val cand = candidates().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val mmr = run("q_retrieval_mmr").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val qids = Seq(0L, 1L, 2L)
    val mmrSum = qids.map(q =>
      meanPairSim(q, mmr.filter(_._1 == q).map(_._2).toSeq)).sum
    val topSum = qids.map(q =>
      meanPairSim(q,
        cand.filter(c => c._1 == q && c._3 <= 5).map(_._2).toSeq)).sum
    assert(mmrSum <= topSum,
      s"MMR must not be less diverse than top-5: $mmrSum vs $topSum")
  }

  test("q_hybrid_mmr diversifies the fused ranking: picks are 5 distinct " +
      "members of the fused top-10 per query, led by the fused top-1, " +
      "and equal a sequential greedy over the same integer scores") {
    val fused = graft.SparkEntry.queries("q_hybrid_retrieval_multi")(
        spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))) // qid, doc, rnk
    val got = run("q_hybrid_mmr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val fusedSet = fused.map(f => (f._1, f._2)).toSet
    assert(got.forall(g => fusedSet.contains((g._1, g._3))),
      "every pick must come from the fused top-10")
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.length == 5 && rows.map(_._3).distinct.length == 5)
      val first = rows.find(_._2 == 1L).get._3
      val top1 = fused.filter(f => f._1 == qid && f._3 == 1L).head._2
      assert(first == top1, s"qid $qid pick 1 must be the fused top-1")
    }
    // independent sequential greedy over (rank-derived rel6, pair sim6)
    import spark.implicits._
    val candDf = fused.toSeq.toDF("qid", "vec_id", "rnk")
      .select(col("qid"), col("vec_id"),
        ((lit(11L) - col("rnk")) * lit(100000L)).as("rel6"),
        col("rnk").as("rn"))
    val e = graft.table(spark, sfDir, "embeddings")
    val ce = candDf.select("qid", "vec_id").join(e, "vec_id")
      .select(col("qid"), col("vec_id"), col("embedding"))
    graft.functions.VectorOps.ensure(spark)
    val sims = ce.alias("a").join(ce.alias("b"),
        col("a.qid") === col("b.qid") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.qid"), col("a.vec_id").as("id1"),
        col("b.vec_id").as("id2"),
        round(round(VectorOps.cosine(col("a.embedding"), col("b.embedding")), 6)
          * 1000000, 0).cast("long").as("sim6"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    val cand = candDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = cand.map(_._1).distinct.sorted.flatMap { qid =>
      val pool = cand.filter(_._1 == qid).sortBy(_._4)
      var selected = Vector(pool.head)
      var out = Vector((qid, 1L, pool.head._2, pool.head._3, 0L,
        pool.head._3 * 7))
      for (t <- 2 to 5) {
        val rem = pool.filterNot(c => selected.exists(_._2 == c._2))
        val scored = rem.map { c =>
          val maxsim = selected.map(s => sims((qid, c._2, s._2))).max
          (c, maxsim, c._3 * 7 - maxsim * 3)
        }
        val best = scored.minBy { case (c, _, sc) => (-sc, c._2) }
        selected :+= best._1
        out :+= ((qid, t.toLong, best._1._2, best._1._3, best._2, best._3))
      }
      out
    }.toSet
    assert(got.toSet == expected,
      s"hybrid MMR mismatch:\n got=${got.toSet}\n exp=$expected")
  }

  test("q_sim_ann_recall_curve: hits monotone non-decreasing in nprobe " +
      "per query and bounded by k = 10") {
    val rows = run("q_sim_ann_recall_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet == Set(0L, 1L, 2L))
    assert(rows.forall(r => r._3 >= 0 && r._3 <= 10))
    rows.groupBy(_._1).foreach { case (qid, qr) =>
      val byNp = qr.sortBy(_._2).map(_._3)
      assert(byNp.size == 3, s"qid $qid must have 3 curve points")
      assert(byNp.zip(byNp.tail).forall { case (a, b) => a <= b },
        s"qid $qid recall curve must be monotone: $byNp")
    }
    // more probes must help somewhere on this corpus, or the curve
    // carries no tuning signal
    val byNp = rows.groupBy(_._2).map { case (np, g) => np -> g.map(_._3).sum }
    assert(byNp(8L) >= byNp(2L))
  }

  test("q_corpus_funnel partitions the corpus and its kept count " +
      "equals q_corpus_prep's output") {
    val funnel = run("q_corpus_funnel").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val total = graft.table(spark, sfDir, "documents").count()
    assert(funnel.map(_._3).sum == total,
      s"funnel must partition all $total docs: $funnel")
    assert(funnel.map(_._1).toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
    val names = funnel.map(r => r._1 -> r._2).toMap
    val expectNames = Map(1L -> "quality_cut", 2L -> "duplicate",
      3L -> "over_budget", 4L -> "kept")
    names.foreach { case (id, n) => assert(expectNames(id) == n) }
    // the funnel explains the flagship: kept == q_corpus_prep rows
    val kept = funnel.find(_._1 == 4L).map(_._3).getOrElse(0L)
    val prep = run("q_corpus_prep").count()
    assert(kept == prep, s"kept $kept must equal q_corpus_prep rows $prep")
    // the budget stage must actually cut on this corpus (600-token
    // budget per source over a multi-thousand-token corpus)
    assert(funnel.exists(r => r._1 == 3L && r._3 > 0))
    assert(kept > 0)
  }

  test("q_corpus_funnel counts real duplicates on a planted corpus — " +
      "the stage the shipped corpus (zero exact dups) cannot exercise") {
    import spark.implicits._
    // 40 docs: 5 zero-alpha (quality-cut), 10 sharing 3 distinct
    // pure-letter texts (alpha = 1 > any p25 cut, so 7 duplicates
    // MUST reach the dedup stage), 25 ordinary uniques
    val docs = (0 until 40).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      val text =
        if (i >= 30) s"dupsharedtextpayload${('a' + i % 3).toChar}"
        else if (i % 7 == 0) "1234 5678 90!!"
        else s"unique document $i with plenty of alphabetic words here"
      (i.toLong, src, text)
    }
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val funnel = run0("q_corpus_funnel", dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toMap
    assert(funnel.values.sum == 40L, s"must partition all docs: $funnel")
    assert(funnel.getOrElse(1L, 0L) >= 5L, s"quality stage: $funnel")
    assert(funnel.getOrElse(2L, 0L) == 7L,
      s"exactly 7 planted duplicates must land in the dedup stage: $funnel")
    assert(funnel.getOrElse(4L, 0L) ==
      run0("q_corpus_prep", dir).count(), "kept must equal the flagship")
  }

  private def run0(name: String, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("q_resample_locf: every key covers the full calendar span, absent " +
      "days are zero-filled, and the carried peak is a true LOCF") {
    val rows = run("q_resample_locf").collect().map(r =>
      (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    val orders = graft.table(spark, sfDir, "orders")
    val total = orders.count()
    assert(rows.map(_._3).sum == total, "fill must not invent orders")
    // dense spine: same day-count for every key, equal to the span
    val span = rows.map(_._2).distinct.size
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, kr) =>
      assert(kr.map(_._2).distinct.size == span && kr.size == span,
        s"key $k spine must be dense: ${kr.size} vs $span")
    }
    // real gaps exist and are zero-filled at this SF
    assert(rows.exists(_._3 == 0L), "no gap days — fill untested")
    // LOCF: replay each key's days in order — a gap day must carry
    // exactly the last observed value (leading gaps stay null)
    byKey.foreach { case (k, kr) =>
      var carried: Option[Double] = None
      kr.sortBy(_._2.toEpochDay).foreach { case (_, day, n, peak) =>
        if (n > 0L) {
          assert(peak.isDefined, s"$k $day: observed day must keep its peak")
          carried = peak
        } else assert(peak == carried, // LOCF copies bits — exact equality
          s"$k $day: gap must carry $carried, got $peak")
      }
    }
  }
}
