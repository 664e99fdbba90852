package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Coverage19 — chi-square drift, grid percentiles, the Gini stump
  * family, and hard-negative mining. Each query is pinned against an
  * independent driver-side brute force over the sf0.001 corpus (the
  * Coverage16Spec pattern): the distributed plan's grid/cumulative
  * tricks must reproduce the naive per-row recomputation exactly.
  */
class Coverage19Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect()

  /** (doc_id, lang, source, n_chars, n_tokens) for every doc. */
  private lazy val rows: Seq[(Long, String, String, Long, Long)] =
    graft.table(spark, sfDir, "documents")
      .selectExpr("doc_id", "lang", "source", "CAST(n_chars AS BIGINT)",
        "CAST(size(split(trim(text), ' ')) AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
      .toSeq

  // ---- chi-square drift ----------------------------------------------

  test("q_chisq_drift matches a naive per-cell brute force") {
    val byLen = rows.groupBy(_._5).view.mapValues(_.size.toLong).toMap
    val nTot = rows.size.toLong
    val grid = byLen.keys.toSeq.sorted
    val expected = rows.groupBy(_._3).toSeq.sortBy(_._1).map {
      case (src, rs) =>
        val n = rs.size.toLong
        val mine = rs.groupBy(_._5).view.mapValues(_.size.toLong).toMap
        val sumFp = grid.map { l =>
          val cb = byLen(l)
          val o = mine.getOrElse(l, 0L).toDouble
          val e = n.toDouble * cb / nTot
          val or = (cb - mine.getOrElse(l, 0L)).toDouble
          val er = (nTot - n).toDouble * cb / nTot
          val ts = (o - e) * (o - e) / e
          val tr = (or - er) * (or - er) / er
          // the plan floors each term at 1e-6 into a BIGINT (the
          // cross-engine-safe fixed-point reduction); replicate
          math.floor(ts * 1000000).toLong + math.floor(tr * 1000000).toLong
        }.sum
        val chisq = sumFp.toDouble / 1000000
        (src, chisq, grid.size.toLong - 1, n)
    }
    val got = run("q_chisq_drift")
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("chi-square is zero when every source shares one distribution") {
    // planted: 3 sources, identical length histograms → every O == E,
    // so the statistic itself must vanish (fed through the SAME sweep
    // the streaming twin and the batch plan share — round-12 advice:
    // assert the chi-square, not just the planted counts)
    val planted = for {
      s <- Seq("a", "b", "c"); l <- Seq(5L, 9L)
    } yield graft.streaming.IncrementalKsDrift.Cell(s, l, 4L)
    val got = graft.streaming.IncrementalChiSqDrift.chisqOf(planted)
    assert(got.map(_.source) == Seq("a", "b", "c"))
    assert(got.forall(r => r.chisq == 0.0 && r.dof == 1L && r.n == 8L),
      got.mkString(", "))
  }

  // ---- grid percentiles -----------------------------------------------

  test("q_grid_percentile matches an exact sorted-scan brute force") {
    val expected = rows.groupBy(_._3).toSeq.sortBy(_._1).flatMap {
      case (src, rs) =>
        val bs = rs.map(r => math.min(r._4 / 16, 63L)).sorted
        val n = bs.size.toLong
        Seq(50L, 90L, 99L).map { p =>
          val thresh = (p * n + 99) / 100
          // percentile = bucket of the thresh-th smallest value (1-based)
          val b = bs((thresh - 1).toInt)
          (src, p, b * 16, n)
        }
    }
    val got = run("q_grid_percentile")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  // ---- Gini stump -------------------------------------------------------

  /** Brute-force stump search: every (feature, bucket) candidate scored
    * from raw per-doc rows. Returns candidates ranked exactly as the
    * plan ranks them. */
  private def bruteStump(rs: Seq[(Long, String, String, Long, Long)])
      : Seq[(String, Long, Double, Long, Long)] = {
    val feats = Seq(
      ("n_chars", rs.map(r => (r._2, math.min(r._4 / 16, 63L))), 16L),
      ("n_tokens", rs.map(r => (r._2, math.min(r._5 / 4, 31L))), 4L))
    val cands = feats.flatMap { case (fname, pts, w) =>
      pts.map(_._2).distinct.sorted.map { b =>
        val left = pts.filter(_._2 <= b)
        val right = pts.filter(_._2 > b)
        val sl2 = left.groupBy(_._1).values.map(g => g.size.toLong * g.size).sum
        val sr2 = right.groupBy(_._1).values.map(g => g.size.toLong * g.size).sum
        val (nl, nr) = (left.size.toLong, right.size.toLong)
        val s = if (nl > 0 && nr > 0)
          sl2.toDouble / nl + sr2.toDouble / nr else Double.NaN
        (fname, b, s, nl, nr, w)
      }
    }.filter(c => c._4 > 0 && c._5 > 0)
    cands.sortBy { case (f, b, s, _, _, _) => (-s, f, b) }
      .map { case (f, b, s, nl, nr, w) => (f, b * w + w - 1, s, nl, nr) }
  }

  test("q_tree_stump top-3 equals the exhaustive candidate search") {
    val n = rows.size.toLong
    val expected = bruteStump(rows).take(3).zipWithIndex.map {
      case ((f, thr, s, nl, nr), i) =>
        val gini = BigDecimal(1.0 - s / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        (f, thr, gini, nl, nr, i.toLong + 1)
    }
    val got = run("q_tree_stump").map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  test("q_tree_classify confusion equals a driver-side train/apply") {
    val train = rows.filter(_._1 % 5 != 0)
    val test0 = rows.filter(_._1 % 5 == 0)
    val best = bruteStump(train).head
    val (bf, bthr) = (best._1, best._2)
    def bucket(r: (Long, String, String, Long, Long)): Long =
      if (bf == "n_chars") math.min(r._4 / 16, 63L) else math.min(r._5 / 4, 31L)
    val bb = if (bf == "n_chars") (bthr - 15) / 16 else (bthr - 3) / 4
    val (tl, tr2) = train.partition(bucket(_) <= bb)
    def majority(g: Seq[(Long, String, String, Long, Long)]): String =
      g.groupBy(_._2).toSeq.sortBy { case (l, gs) => (-gs.size, l) }.head._1
    val (lm, rm) = (majority(tl), majority(tr2))
    val expected = test0
      .map(r => (r._2, if (bucket(r) <= bb) lm else rm))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, p), c) => (a, p, c) }
      .sortBy(t => (t._1, t._2))
    val got = run("q_tree_classify")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    // the held-out accuracy must beat the majority-class baseline —
    // the stump must have LEARNED something, not just compiled
    val acc = got.filter(t => t._1 == t._2).map(_._3).sum.toDouble /
      got.map(_._3).sum
    val baseline = test0.groupBy(_._2).values.map(_.size).max.toDouble /
      test0.size
    assert(acc >= baseline,
      s"stump accuracy $acc below majority baseline $baseline")
  }

  test("q_tree_depth2: root and per-side children equal the exhaustive " +
      "conditioned search") {
    def nodeOf(rs: Seq[(Long, String, String, Long, Long)], label: String) = {
      val (f, thr, s, nl, nr) = bruteStump(rs).head
      val gini = BigDecimal(1.0 - s / (nl + nr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      (label, f, thr, gini, nl, nr)
    }
    val root @ (_, rf, rthr, _, _, _) = nodeOf(rows, "root")
    def bucket(r: (Long, String, String, Long, Long)): Long =
      if (rf == "n_chars") math.min(r._4 / 16, 63L) else math.min(r._5 / 4, 31L)
    val bb = if (rf == "n_chars") (rthr - 15) / 16 else (rthr - 3) / 4
    val (l, r) = rows.partition(bucket(_) <= bb)
    val expected = Seq(nodeOf(l, "L"), nodeOf(r, "R"), root).sortBy(_._1)
    val got = run("q_tree_depth2").map(x => (x.getString(0), x.getString(1),
      x.getLong(2), x.getDouble(3), x.getLong(4), x.getLong(5))).toSeq
    assert(got == expected)
    // depth must help: each child's post-split gini is no worse than
    // its OWN side's pre-split gini (weighted Gini never increases
    // under a split — concavity; the root's MIXED value is not a
    // bound, since the impurer side can exceed it)
    def preGini(rs: Seq[(Long, String, String, Long, Long)]): Double = {
      val n = rs.size.toDouble
      1.0 - rs.groupBy(_._2).values.map(g => g.size * g.size.toDouble).sum /
        (n * n)
    }
    val pre = Map("L" -> preGini(l), "R" -> preGini(r))
    got.filter(_._1 != "root").foreach { case (n, _, _, g, _, _) =>
      assert(g <= pre(n) + 1e-9, s"child $n gini $g > pre-split ${pre(n)}")
    }
  }

  // ---- leakage-safe split -------------------------------------------------

  test("q_split_leakage_safe: no duplicate cluster spans two splits, " +
      "and the per-split totals cover the corpus") {
    import org.apache.spark.sql.functions._
    val got = run("q_split_leakage_safe")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._2).sum == rows.size.toLong)
    // rebuild the per-doc assignment and assert the invariant directly:
    // every canonical cluster maps to exactly one split
    val cc = DedupOps.clusterLabelsFor(spark, sfDir, 0.8)
    val lab = graft.table(spark, sfDir, "documents").select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical"), col("doc_id")).as("canonical"))
    val bucket =
      substring(md5(col("canonical").cast("string").cast("binary")), 1, 8)
    val sp = lab.withColumn("split",
      when(bucket < "cccccccc", "train").when(bucket < "e6666666", "valid")
        .otherwise("test"))
    val spanning = sp.groupBy("canonical")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(spanning == 0L, s"$spanning clusters span a split boundary")
    // and the split totals the query reports equal this assignment's
    val agg = sp.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical")).as("n_clusters"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(got.sortBy(_._1) == agg)
    // a per-DOC split on the same corpus must actually differ (the
    // clusters exist, so the leakage-safe variant is not a no-op)
    val known = cc.filter(col("doc_id") =!= col("canonical")).count()
    assert(known > 0, "corpus has no duplicate clusters — test is vacuous")
  }

  // ---- temperature-mixed budgets ------------------------------------------

  test("q_mixture_budget: budgets follow sqrt mass, selection is the " +
      "md5-prefix under each budget") {
    import org.apache.spark.sql.functions._
    val toks = graft.table(spark, sfDir, "documents")
      .selectExpr("doc_id", "source",
        "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) AS toks")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // brute-force budgets: fixed-point sqrt weights, exact int division
    val ns = toks.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val wfp = ns.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble) * 1000000).toLong).toMap
    val wtot = wfp.values.sum
    val budget = wfp.view.mapValues(w => 12000L * w / wtot).toMap
    // brute-force selection: per source, md5(doc_id) order, take while
    // the RUNNING total before the doc stays under budget
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = toks.groupBy(_._2).flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(d => (md5hex(d._1.toString), d._1)).flatMap { d =>
        val take = cum < budget(src)
        cum += d._3
        if (take) Some((d._1, src, d._3, cum, budget(src))) else None
      }
    }.toSet
    val got = run("q_mixture_budget").map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    // the temperature property: every source with positive mass gets a
    // positive budget, and the FLATTENED shares sit closer to uniform
    // than the raw token shares (that is what α = 0.5 is for)
    assert(budget.values.forall(_ > 0))
    val rawMax = ns.values.max.toDouble / ns.values.sum
    val mixMax = budget.values.max.toDouble / budget.values.sum
    assert(mixMax <= rawMax + 1e-9)
  }

  test("q_corpus_prep_mixed equals a stage-wise driver-side recompute") {
    val docs = graft.table(spark, sfDir, "documents")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // stage 1: RANK-BASED quality cut (round-12 advice shape): alpha in
    // 1e-6 fixed point, cut = the ceil(n/4)-th smallest afp, survivors
    // strictly above it — integer arithmetic end to end
    def alpha(t: String): Double =
      t.count(c => c >= 'a' && c <= 'z').toDouble / t.length
    def afp(t: String): Long = math.floor(alpha(t) * 1000000).toLong
    val afps = docs.map(d => afp(d._3)).sorted
    val k = (afps.size + 3) / 4
    val cutfp = afps(k - 1)
    val q = docs.filter(d => afp(d._3) > cutfp)
    // stage 2: leakage-safe train split on full-corpus cluster labels
    // (md5-prefix coin — the overflow-free split idiom)
    def md5hex8(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val cc = DedupOps.clusterLabelsFor(spark, sfDir, 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tr = q.filter(d =>
      md5hex8(cc.getOrElse(d._1, d._1).toString) < "cccccccc")
    // stage 3: sqrt-temperature budgets over the SURVIVORS
    val toks = tr.map(d => (d._1, d._2,
      d._3.trim.split("\\s+").length.toLong))
    val ns = toks.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val wfp = ns.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble) * 1000000).toLong).toMap
    val wtot = wfp.values.sum
    val budget = wfp.view.mapValues(w => 9600L * w / wtot).toMap
    // stage 4: md5-prefix fill
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = toks.groupBy(_._2).flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(d => (md5hex(d._1.toString), d._1)).flatMap { d =>
        val take = cum < budget(src)
        cum += d._3
        if (take) Some((d._1, src, d._3, cum, budget(src))) else None
      }
    }.toSet
    val got = run("q_corpus_prep_mixed").map(r => (r.getLong(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    // the leakage property survives the composition: every selected
    // doc's cluster hashes into the train band
    got.foreach { case (id, _, _, _, _) =>
      assert(md5hex8(cc.getOrElse(id, id).toString) < "cccccccc")
    }
  }

  // ---- hard negatives ---------------------------------------------------

  test("q_sim_dim_curve: prefix-dim top-10 overlap vs full dim, " +
      "brute-forced; the full dim overlaps itself completely") {
    val e = graft.table(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qv = e.find(_._1 == 0L).get._2
    def cosD(a: Array[Float], b: Array[Float], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < d) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def top10(d: Int): Set[Long] = e.filter(_._1 != 0L)
      .map { case (id, v) => (id, BigDecimal(cosD(v, qv, d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val full = top10(64)
    val expected = Seq(8, 16, 32, 64)
      .map(d => (d.toLong, (top10(d) & full).size.toLong, 10L))
    val got = run("q_sim_dim_curve")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.last == ((64L, 10L, 10L)))
  }

  test("q_hard_negatives: different-label top-3 per query, brute-forced") {
    val e = graft.table(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = e.filter(_._1 < 8)
    val expected = queries.sortBy(_._1).flatMap { case (qid, qv, ql) =>
      e.filter(_._3 != ql)
        .map { case (vid, v, _) =>
          (vid, BigDecimal(cos(v, qv))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (vid, c) => (-c, vid) }
        .take(3).zipWithIndex
        .map { case ((vid, c), i) => (qid, vid, c, i.toLong + 1) }
    }.toSeq
    val got = run("q_hard_negatives")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    assert(got == expected)
    // no neighbor shares its query's label, and self never appears
    val labels = e.map(t => t._1 -> t._3).toMap
    got.foreach { case (qid, vid, _, _) =>
      assert(vid != qid && labels(vid) != labels(qid))
    }
  }
}
