package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala derivations for the Coverage13 operators:
  * sequential folds for the two OrderedPrefix queries (record highs,
  * Pareto curve), an explicit ntile partitioner for the quality
  * terciles, and brute-force sequence/gap/rolling-window recomputes
  * for the behavioral trio.
  */
class Coverage13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  private def events =
    graft.table(spark, sfDir, "events")
      .selectExpr("event_id", "cast(ts as string) as tss",
        "cast(cast(ts as date) as string) as day", "user_id", "event_type",
        "value", "unix_micros(cast(ts as timestamp)) as us")
      .as[(Long, String, String, Long, String, Double, Long)].collect()

  test("q_record_highs == sequential record fold") {
    val ordered = events.sortBy(e => (e._2, e._1))
    var mx = Double.NegativeInfinity
    val perDay = scala.collection.mutable.Map[String, (Long, Long, Double)]()
    ordered.foreach { e =>
      val isRec = e._6 > mx
      mx = math.max(mx, e._6)
      val (n, r, h) = perDay.getOrElse(e._3, (0L, 0L, Double.NegativeInfinity))
      perDay(e._3) = (n + 1, r + (if (isRec) 1L else 0L), math.max(h, mx))
    }
    val got = graft.SparkEntry.queries("q_record_highs")(spark, sfDir)
      .selectExpr("cast(day as string)", "n_events", "n_records", "day_high")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == perDay.toMap)
    assert(got.nonEmpty)
  }

  test("q_revenue_pareto == sequential cumulative-share scan") {
    val li = graft.table(spark, sfDir, "lineitem")
      .selectExpr("l_partkey",
        "cast(l_extendedprice * (1 - l_discount) as decimal(38,10)) as r")
      .as[(Long, BigDecimal)].collect()
    val rev = li.groupBy(_._1).view
      .mapValues(_.map(_._2).sum.setScale(10)).toSeq
      .sortBy { case (pk, r) => (-r.toDouble, pk) }
    val tot = rev.map(_._2).sum.toDouble
    var cum = BigDecimal(0)
    val shares = rev.map { case (_, r) => cum += r; cum.toDouble / tot }
    val expect = Seq(0.5, 0.75, 0.9, 0.95, 0.99).map { t =>
      val n = (shares.indexWhere(_ >= t) + 1).toLong
      (t, n, BigDecimal(n.toDouble / rev.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = graft.SparkEntry.queries("q_revenue_pareto")(spark, sfDir)
      .as[(Double, Long, Double)].collect().toSet
    assert(got == expect)
    // monotone: a higher share threshold never needs fewer parts
    val byT = got.toSeq.sortBy(_._1).map(_._2)
    assert(byT.zip(byT.tail).forall { case (a, b) => a <= b })
  }

  test("q_ccnet_buckets == explicit NTILE(3) partitioner") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val scored = docs.map { case (id, lang, text) =>
      (id, lang, text.count(c => c >= 'a' && c <= 'z').toDouble / text.length)
    }
    val expect = scored.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._1))
      val n = sorted.length; val q = n / 3; val r = n % 3
      val tiles = sorted.zipWithIndex.map { case (d, i) =>
        val rk = i + 1
        val tile = if (rk <= r * (q + 1)) (rk - 1) / (q + 1) + 1
                   else r + 1 + (rk - r * (q + 1) - 1) / math.max(q, 1)
        (tile.toLong, d._3)
      }
      tiles.groupBy(_._1).map { case (tile, xs) =>
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (lang, tile, xs.size.toLong, r6(xs.map(_._2).min), r6(xs.map(_._2).max))
      }
    }.toSet
    val got = graft.SparkEntry.queries("q_ccnet_buckets")(spark, sfDir)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(got == expect)
    // every language splits into tiles of near-equal size (diff ≤ 1)
    got.groupBy(_._1).foreach { case (_, ts) =>
      val sizes = ts.map(_._3)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("q_event_trigrams == brute-force per-user sequence mining") {
    val expect = events.groupBy(_._4).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._1)).map(_._5).sliding(3).filter(_.length == 3)
        .map(_.mkString(">")).toSeq
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(25).toSet
    val got = graft.SparkEntry.queries("q_event_trigrams")(spark, sfDir)
      .as[(String, Long)].collect().toSet
    assert(got == expect)
  }

  test("q_gap_stats == brute-force gap percentile scan") {
    val gaps = events.groupBy(_._4).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._2, e._1))
      s.zip(s.tail).map { case (a, b) => (b._5, b._7 - a._7) }
    }
    def pct(xs: Seq[Long], p: Double): Long = {
      val sorted = xs.sorted
      sorted.zipWithIndex
        .find { case (_, i) => (i + 1).toDouble / sorted.size >= p }.get._1
    }
    val expect = gaps.groupBy(_._1).map { case (et, gs) =>
      val xs = gs.map(_._2)
      (et, xs.size.toLong, xs.min, xs.max, pct(xs, 0.5), pct(xs, 0.9))
    }.toSet
    val got = graft.SparkEntry.queries("q_gap_stats")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("q_rolling_active_users == brute-force 7-day window recount") {
    val ud = events.map(e => (e._3, e._4)).distinct
    val days = ud.map(_._1).distinct
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val expect = days.map { d =>
      val dd = java.time.LocalDate.parse(d, fmt)
      val wau = ud.count { case (ud2, _) =>
        val u = java.time.LocalDate.parse(ud2, fmt)
        !u.isAfter(dd) && !u.isBefore(dd.minusDays(6))
      }
      // wau counts user-days in window → need distinct users
      val wauUsers = ud.filter { case (ud2, _) =>
        val u = java.time.LocalDate.parse(ud2, fmt)
        !u.isAfter(dd) && !u.isBefore(dd.minusDays(6))
      }.map(_._2).distinct.size.toLong
      val dau = ud.filter(_._1 == d).map(_._2).distinct.size.toLong
      (d, dau, wauUsers)
    }.toSet
    val got = graft.SparkEntry.queries("q_rolling_active_users")(spark, sfDir)
      .selectExpr("cast(day as string)", "dau", "wau")
      .as[(String, Long, Long)].collect().toSet
    assert(got == expect)
    // WAU dominates DAU pointwise
    assert(got.forall { case (_, dau, wau) => wau >= dau })
  }

  test("q_cluster_purity == brute-force assignment + majority vote") {
    val embs = graft.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()
    val cents = embs.filter(_._1 % 97 == 0)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val assigned = embs.map { case (vid, v, label) =>
      val best = cents.map(c => (c._1, cos(v, c._2)))
        .minBy { case (cid, d) => (-d, cid) }._1
      (best, label)
    }
    val expect = assigned.groupBy(_._1).map { case (cid, ms) =>
      val votes = ms.groupBy(_._2).view.mapValues(_.size).toSeq
      val (majLabel, mx) = votes.minBy { case (l, v) => (-v, l) }
      (cid, ms.size.toLong, majLabel,
        BigDecimal(mx.toDouble / ms.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = graft.SparkEntry.queries("q_cluster_purity")(spark, sfDir)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got == expect)
    assert(got.forall { case (_, n, _, p) => n > 0 && p > 0.0 && p <= 1.0 })
  }

  private def embApi = graft.table(spark, sfDir, "embeddings")
    .select("vec_id", "embedding", "label")
    .as[(Long, Array[Float], Int)]

  private def cos6(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def bruteAssign(embs: Array[(Long, Array[Float], Int)]) = {
    val cents = embs.filter(_._1 % 97 == 0)
    embs.map { case (vid, v, label) =>
      val (cid, d) = cents.map(c => (c._1, cos6(v, c._2)))
        .minBy { case (c, d) => (-d, c) }
      (vid, v, label, cid, d)
    }
  }

  test("q_embed_outliers == brute-force z-score over integer-scaled cos") {
    val embs = embApi.collect()
    val assigned = bruteAssign(embs)
    val expect = assigned.groupBy(_._4).toSeq.flatMap { case (cid, ms) =>
      val c6s = ms.map(m => math.round(m._5 * 1e6))
      val n = c6s.length
      val m = c6s.sum.toDouble / n
      val sd = math.sqrt((c6s.map(x => x * x).sum.toDouble - n * m * m) /
        (n - 1).toDouble)
      if (!(sd > 0)) Seq.empty
      else ms.zip(c6s).collect {
        case ((vid, _, _, _, cos), c6) if (c6 - m) / sd <= -1.5 =>
          (vid, cid, cos, BigDecimal((c6 - m) / sd)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toSet
    val got = graft.SparkEntry.queries("q_embed_outliers")(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty)
    assert(got.forall(_._4 <= -1.5))
  }

  test("q_dedup_semantic == brute-force within-cluster pair scan") {
    val embs = embApi.collect()
    val assigned = bruteAssign(embs)
    val byCluster = assigned.groupBy(_._4)
    val expect = byCluster.map { case (cid, ms) =>
      val sorted = ms.sortBy(_._1)
      val dups = for {
        (v1, e1, _, _, _) <- sorted; (v2, e2, _, _, _) <- sorted
        if v2 > v1 && cos6(e1, e2) >= 0.4
      } yield (v1, v2)
      (cid, ms.size.toLong, dups.size.toLong,
        dups.map(_._2).distinct.size.toLong)
    }.toSet
    val got = graft.SparkEntry.queries("q_dedup_semantic")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expect)
    // pruned never exceeds pairs, and never reaches the full membership
    assert(got.forall { case (_, n, pairs, pruned) =>
      pruned <= pairs && pruned < n })
  }
}
