package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Independent derivations for the round-9 curation wave: each query
  * re-computed with plain Scala collections from the raw tables (or on
  * planted inputs for the iterative/graph cases), so a DuckDB-side
  * oracle bug and a Spark-side bug can't cancel out. */
class Coverage16Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docs: Seq[(Long, String, String)] =
    graft.table(spark, sfDir, "documents")
      .select("doc_id", "text", "source").as[(Long, String, String)]
      .collect().toSeq

  test("q_vocab_coverage == brute-force top-20 vocab + OOV count") {
    val words = docs.flatMap { case (_, t, src) =>
      t.trim.split(" ", -1).map(w => (src, w))
    }
    val vocab = words.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(20).map(_._1).toSet
    val expect = words.groupBy(_._1).map { case (src, ws) =>
      val oov = ws.count(w => !vocab.contains(w._2))
      (src, ws.size.toLong, oov.toLong,
        BigDecimal(oov.toDouble / ws.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = SparkEntry.queries("q_vocab_coverage")(spark, sfDir)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == expect)
  }

  test("q_ngram_novelty == brute-force first-occurrence scan") {
    val grams = docs.sortBy(_._1).flatMap { case (id, t, _) =>
      val w = t.trim.split(" ", -1)
      if (w.length < 8) Seq.empty
      else (0 to w.length - 8).map(i => (id, i, w.slice(i, i + 8).mkString(" ")))
    }
    val owner = grams.groupBy(_._3).view
      .mapValues(_.minBy(g => (g._1, g._2))._1).toMap
    val expect = docs.map { case (id, t, _) =>
      val w = t.trim.split(" ", -1)
      val gs = if (w.length < 8) Seq.empty
        else (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" ")).distinct
      val novel = gs.count(g => owner(g) == id)
      (id, gs.size.toLong, novel.toLong,
        BigDecimal(novel.toDouble / math.max(gs.size, 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = SparkEntry.queries("q_ngram_novelty")(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expect)
  }

  test("q_pii_flags == brute-force Java-regex scan of the enriched text") {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val phone = "[0-9]{3}-[0-9]{4}-[0-9]{4}".r
    val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}".r
    def pad(v: Long, n: Int) = v.toString.reverse.padTo(n, '0').reverse.mkString
    val rows = docs.map { case (id, t, src) =>
      val enriched = t +
        (if (id % 5 == 0) s" contact user$id@example.com now" else "") +
        (if (id % 7 == 0) s" call 555-01${pad(id % 100, 2)}-${pad(id % 10000, 4)}" else "") +
        (if (id % 11 == 0) s" host 10.${id % 256}.${id * 7 % 256}.${id * 13 % 256}" else "")
      (src, email.findAllIn(enriched).size.toLong,
        phone.findAllIn(enriched).size.toLong,
        ip.findAllIn(enriched).size.toLong)
    }
    val expect = rows.groupBy(_._1).map { case (src, rs) =>
      (src, rs.size.toLong, rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum,
        rs.count(r => r._2 + r._3 + r._4 > 0).toLong)
    }.toSet
    val got = SparkEntry.queries("q_pii_flags")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expect)
    // the planted residues guarantee every category actually fires
    assert(expect.exists(_._3 > 0) && expect.exists(_._4 > 0) &&
      expect.exists(_._5 > 0))
  }

  test("q_decay_sum == brute-force half-life fold") {
    val evs = graft.table(spark, sfDir, "events")
      .selectExpr("user_id", "unix_seconds(CAST(ts AS TIMESTAMP))", "value")
      .as[(Long, Long, Double)].collect()
    val mx = evs.map(_._2).max
    val expect = evs.groupBy(_._1).map { case (u, es) =>
      val sum = es.map { case (_, t, v) =>
        BigDecimal(v * math.pow(0.5, (mx - t).toDouble / (30.0 * 86400)))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (u, es.length.toLong,
        BigDecimal(sum.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toSet
    val got = SparkEntry.queries("q_decay_sum")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expect)
  }

  test("q_kcore: planted clique survives intact, pendant chain peels away") {
    // brute-force peel on the REAL sf0.001 graph
    def peel(edges: Set[(Long, Long)]): Set[(Long, Long)] = {
      var cur = edges
      var done = false
      while (!done) {
        val deg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val next = cur.filter(e => deg(e._1) >= 3 && deg(e._2) >= 3)
        done = next == cur
        cur = next
      }
      cur
    }
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { os =>
      val ps = os.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2).keys.toSet
    val expect = peel(edges).toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q_kcore")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  test("q_win_countd / q_win_median / q_cusum_shift == brute-force folds") {
    val evs = graft.table(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP))",
        "event_id", "value", "event_type")
      .as[(Long, Long, Long, Double, String)].collect()
      .sortBy(e => (e._2, e._3))
    val byUser = evs.groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3)))

    // running distinct types
    val expectCd = byUser.toSeq.flatMap { case (u, es) =>
      val seen = scala.collection.mutable.Set[String]()
      es.map { e => seen += e._5; (u, e._3, seen.size.toLong) }
    }.toSet
    val gotCd = SparkEntry.queries("q_win_countd")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(gotCd == expectCd)

    // trailing-10 median
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expectMed = byUser.toSeq.flatMap { case (u, es) =>
      es.indices.map { i =>
        val fr = es.slice(math.max(0, i - 9), i + 1).map(_._4).sorted
        val n = fr.length
        val m = if (n % 2 == 1) fr(n / 2) else (fr(n / 2 - 1) + fr(n / 2)) / 2
        (u, es(i)._3, r6(m))
      }
    }.toSet
    val gotMed = SparkEntry.queries("q_win_median")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(gotMed == expectMed)

    // CUSUM argmax (exact-decimal fold mirrors the query's contract)
    def r4(x: BigDecimal) =
      x.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expectCu = byUser.toSeq.map { case (u, es) =>
      // mirror the query: exact decimal SUM → double, then double ÷
      val mu = es.map(e => BigDecimal(e._4).setScale(10)).sum.toDouble /
        es.length
      var acc = BigDecimal(0)
      val devs = es.map { e =>
        acc += BigDecimal(e._4 - mu)
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
        (e._3, acc.abs)
      }
      val best = devs.maxBy(d => (d._2, -d._1))
      (u, best._1, r4(best._2))
    }.toSet
    val gotCu = SparkEntry.queries("q_cusum_shift")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(gotCu == expectCu)
  }

  test("q_session_stats / q_conversion_lag / q_source_mix_drift == brute folds") {
    val evs = graft.table(spark, sfDir, "events")
      .selectExpr("user_id", "unix_seconds(CAST(ts AS TIMESTAMP))",
        "event_id", "event_type")
      .as[(Long, Long, Long, String)].collect()

    // sessions: split at gap >= 1800 s in (ts, event_id) order
    val bySess = evs.groupBy(_._1).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.tail.foreach { e =>
        if (e._2 - sessions.last.last._2 >= 1800) sessions +=
          scala.collection.mutable.ArrayBuffer(e)
        else sessions.last += e
      }
      val n = sessions.size
      val tot = sorted.size
      (u, n.toLong, tot.toLong,
        BigDecimal(tot.toDouble / n).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
        sessions.map(s => s.last._2 - s.head._2).max)
    }.toSet
    val gotSess = SparkEntry.queries("q_session_stats")(spark, sfDir)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(gotSess == bySess)

    // conversion lag percentiles (disc = value at ceil(p*n))
    val lags = evs.groupBy(_._1).flatMap { case (_, es) =>
      val fv = es.filter(_._4 == "view").map(_._2).minOption
      val fp = es.filter(_._4 == "purchase").map(_._2).minOption
      (fv, fp) match {
        case (Some(v), Some(p)) if p >= v => Some(p - v)
        case _ => None
      }
    }.toSeq.sorted
    def disc(p: Double) = lags(math.ceil(p * lags.size).toInt - 1)
    val gotLag = SparkEntry.queries("q_conversion_lag")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(gotLag == ((lags.size.toLong, lags.min, disc(0.5), disc(0.9),
      lags.max)), gotLag)

    // mix drift
    val dl = graft.table(spark, sfDir, "documents")
      .select("source", "lang").as[(String, String)].collect()
    val gn = dl.length
    val global = dl.groupBy(_._2).view.mapValues(_.size.toDouble / gn)
    val expectDrift = dl.groupBy(_._1).map { case (src, ds) =>
      val n = ds.size
      val terms = ds.groupBy(_._2).map { case (lang, xs) =>
        BigDecimal(math.abs(xs.size.toDouble / n - global(lang)))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }
      (src, BigDecimal(terms.sum.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val gotDrift = SparkEntry.queries("q_source_mix_drift")(spark, sfDir)
      .as[(String, Double)].collect().toSet
    assert(gotDrift == expectDrift)
  }

  test("q_graph_components == brute-force union-find sizes") {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { os =>
      val ps = os.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2).keys.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.toSeq.map(n => (find(n), n))
      .groupBy(_._1).map { case (c, ns) => (c, ns.size.toLong) }.toSet
    val got = SparkEntry.queries("q_graph_components")(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    assert(got == expect)
  }

  private def bruteEdges: Seq[(Long, Long)] = {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
    li.groupBy(_._1).values.flatMap { os =>
      val ps = os.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2).keys.toSeq
  }

  test("q_graph_cluster_coeff == brute-force adjacency-set histogram") {
    val edges = bruteEdges
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val expect = adj.toSeq.filter(_._2.size >= 2).map { case (_, ns) =>
      val d = ns.size.toLong
      val nsSeq = ns.toSeq
      val t = (for (u <- nsSeq; w <- nsSeq if u < w && adj(u).contains(w))
        yield 1).size.toLong
      (20L * t / (d * (d - 1)), t, d)
    }.groupBy(_._1).map { case (b, xs) =>
      val terms = xs.map { case (_, t, d) =>
        BigDecimal(2.0 * t / (d * (d - 1)))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }
      (b, xs.size.toLong,
        BigDecimal(terms.sum.toDouble / xs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = SparkEntry.queries("q_graph_cluster_coeff")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expect)
  }

  test("q_graph_jaccard == brute-force neighbor-set intersections") {
    val edges = bruteEdges
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val expect = edges.map { case (a, b) =>
      val cn = (adj(a) intersect adj(b)).size.toLong
      val denom = adj(a).size + adj(b).size - cn
      (a, b, cn, BigDecimal(cn.toDouble / denom)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (a, b, cn, _) => (-cn, a, b) }.take(20).toSet
    val got = SparkEntry.queries("q_graph_jaccard")(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expect)
  }

  test("q_user_gini == brute-force rank formula") {
    val evs = graft.table(spark, sfDir, "events")
      .select("user_id").as[Long].collect()
    val counts = evs.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case (u, x) => (x, u) }.sorted
    val n = counts.size.toLong
    val tot = counts.map(_._1).sum
    val weighted = counts.zipWithIndex
      .map { case ((x, _), i) => (i + 1) * x }.sum
    val gini = BigDecimal(
      (2.0 * weighted - (n + 1) * tot) / (n * tot.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = SparkEntry.queries("q_user_gini")(spark, sfDir)
      .as[(Long, Long, Long, Double)].head()
    assert(got == ((n, tot, weighted, gini)), got)
  }

  test("q_cohort_ltv == brute-force weekly triangle") {
    import java.time.{DayOfWeek, LocalDate}
    import java.time.temporal.TemporalAdjusters
    val evs = graft.table(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP))",
        "event_type", "value")
      .as[(Long, Long, String, Double)].collect()
    def weekStart(us: Long): Long = // epoch day of the Monday
      LocalDate.ofEpochDay(Math.floorDiv(us, 86400000000L))
        .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        .toEpochDay
    val cohortOf = evs.groupBy(_._1).view
      .mapValues(es => weekStart(es.map(_._2).min)).toMap
    val expect = evs.filter(_._3 == "purchase").groupBy { e =>
      (cohortOf(e._1), (weekStart(e._2) - cohortOf(e._1)) / 7)
    }.map { case ((cohortDay, age), es) =>
      val rev = es.map(e => BigDecimal(e._4)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
      (cohortDay * 86400000000L, age,
        es.map(_._1).distinct.length.toLong,
        BigDecimal(rev.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = SparkEntry.queries("q_cohort_ltv")(spark, sfDir)
      .selectExpr("unix_micros(CAST(cohort AS TIMESTAMP))", "age",
        "buyers", "revenue")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expect, got)
  }

  test("q_autocorr == brute-force matched-pair ACF") {
    val days = graft.table(spark, sfDir, "events")
      .selectExpr("unix_micros(CAST(ts AS TIMESTAMP))").as[Long].collect()
      .map(us => Math.floorDiv(us, 86400000000L))
    val counts = days.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = BigInt(counts.size)
    val sx = BigInt(counts.values.sum)
    val sq = counts.values.map(x => BigInt(x) * x).sum
    val expect = (1 to 7).map { k =>
      val matched = counts.keys.toSeq.filter(d => counts.contains(d + k))
      val pairs = BigInt(matched.size)
      val pk = matched.map(d => BigInt(counts(d)) * counts(d + k)).sum
      val shead = matched.map(d => BigInt(counts(d))).sum
      val stail = matched.map(d => BigInt(counts(d + k))).sum
      val num = n * n * pk - n * sx * (shead + stail) + pairs * sx * sx
      val den = n * (n * sq - sx * sx)
      val acf = BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (k.toLong, pairs.toLong, acf)
    }.toSet
    val got = SparkEntry.queries("q_autocorr")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expect, got)
  }

  test("q_seasonal_naive == brute-force lag-MAE") {
    val days = graft.table(spark, sfDir, "events")
      .selectExpr("unix_micros(CAST(ts AS TIMESTAMP))").as[Long].collect()
      .map(us => Math.floorDiv(us, 86400000000L))
    val counts = days.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = Seq(1, 7).map { k =>
      val matched = counts.keys.toSeq.filter(d => counts.contains(d + k))
      val n = matched.size.toLong
      val sae = matched.map(d => math.abs(counts(d + k) - counts(d))).sum
      val mae = BigDecimal(sae.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (k.toLong, n, sae, mae)
    }.toSet
    val got = SparkEntry.queries("q_seasonal_naive")(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expect, got)
  }

  test("q_burstiness == brute-force CV² histogram") {
    val evs = graft.table(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP))", "event_id")
      .as[(Long, Long, Long)].collect()
    val expect = evs.groupBy(_._1).values.toSeq.flatMap { rows =>
      val secs = rows.sortBy(r => (r._2, r._3))
        .map(r => Math.floorDiv(r._2, 1000000L))
      val gaps = secs.zip(secs.tail).map { case (a, b) => b - a }
      val n = gaps.size.toLong
      if (n < 2) None else {
        val s = gaps.sum
        val q = gaps.map(g => g * g).sum
        Some(math.min(10L * n * (n * q - s * s) / ((n - 1) * s * s), 30L))
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q_burstiness")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(got == expect, got)
  }

  test("q_graph_two_hop == brute-force adjacency-set BFS") {
    val edges = Coverage16.copurchaseEdges(spark, sfDir)
      .as[(Long, Long)].collect()
    val adj = collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    for ((a, b) <- edges) { adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    val rows = adj.keys.toSeq.map { v =>
      val two = adj(v).flatMap(adj) - v
      (v, adj(v).size.toLong, (two -- adj(v)).size.toLong,
        (two ++ adj(v)).size.toLong)
    }
    val expect = rows.sortBy(r => (-r._4, r._1)).take(20)
    val got = SparkEntry.queries("q_graph_two_hop")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expect, got)
  }

  test("q_benford == brute-force first-digit histogram") {
    val prices = graft.table(spark, sfDir, "orders")
      .select("o_totalprice").as[Double].collect().filter(_ > 0)
    val cnt = prices.groupBy(p => math.round(p * 100).toString.head.asDigit.toLong)
      .view.mapValues(_.length.toLong).toMap
    val total = cnt.values.sum
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = cnt.map { case (d, n) =>
      (d, n, r6(n.toDouble / total), r6(math.log10(1.0 + 1.0 / d)))
    }.toSet
    val got = SparkEntry.queries("q_benford")(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == expect, got)
  }

  test("q_vocab_growth == brute-force Heaps curve") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val btoks = collection.mutable.Map.empty[Long, Long]
    val first = collection.mutable.Map.empty[String, Long]
    for ((id, text) <- docs) {
      val b = math.max(java.lang.Long.toBinaryString(id).length, 1).toLong
      val toks = text.trim.split(" ").filter(_.nonEmpty)
      btoks(b) = btoks.getOrElse(b, 0L) + toks.length
      for (w <- toks) if (!first.contains(w) || first(w) > b) first(w) = b
    }
    val bvocab = first.values.groupBy(identity).view.mapValues(_.size.toLong)
    var (ct, cv) = (0L, 0L)
    val expect = btoks.keys.toSeq.sorted.map { b =>
      ct += btoks(b); cv += bvocab.getOrElse(b, 0L)
      (b, ct, cv)
    }.toSet
    val got = SparkEntry.queries("q_vocab_growth")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect, got)
  }

  test("q_basket_lift == brute-force association rules") {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
    val orders = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = orders.size.toLong
    val supp = li.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.size.toLong).toMap
    val pairSupp = orders.values.flatMap { ps =>
      val sorted = ps.toSeq.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 3).toMap
    val expect = pairSupp.toSeq.map { case ((p1, p2), sp) =>
      (p1, p2, sp, BigDecimal(sp * nOrders.toDouble / (supp(p1) * supp(p2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (p1, p2, sp, _) => (-sp, p1, p2) }.take(25).toSet
    val got = SparkEntry.queries("q_basket_lift")(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expect)
  }

  test("q_graph_assortativity == brute-force Newman formula") {
    val edges = bruteEdges
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = edges.size.toLong
    val sxy = edges.map(e => deg(e._1) * deg(e._2)).sum
    val sx = edges.map(e => deg(e._1) + deg(e._2)).sum
    val sx2 = edges.map(e => deg(e._1) * deg(e._1) + deg(e._2) * deg(e._2)).sum
    val mean = sx / (2.0 * m)
    val r = (sxy / m.toDouble - mean * mean) / (sx2 / (2.0 * m) - mean * mean)
    val expect = (m, sxy, sx, sx2,
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val got = SparkEntry.queries("q_graph_assortativity")(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got == expect, got)
  }

  test("q_funnel_window == brute-force first-anchor fold") {
    val evs = graft.table(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP))", "event_type")
      .as[(Long, Long, String)].collect()
    val W = 3L * 86400 * 1000000
    val expect = evs.groupBy(_._1).values.map { es =>
      val t1 = es.filter(_._3 == "view").map(_._2).minOption
      val t2 = t1.flatMap(a => es.filter(e => e._3 == "click" &&
        e._2 >= a && e._2 <= a + W).map(_._2).minOption)
      val t3 = (t1, t2) match {
        case (Some(a), Some(b)) => es.filter(e => e._3 == "purchase" &&
          e._2 >= b && e._2 <= a + W).map(_._2).minOption
        case _ => None
      }
      if (t1.isEmpty) 0L else if (t2.isEmpty) 1L
      else if (t3.isEmpty) 2L else 3L
    }.groupBy(identity).map { case (d, us) => (d, us.size.toLong) }.toSet
    val got = SparkEntry.queries("q_funnel_window")(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("q_graph_degree_dist == brute-force histogram") {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { os =>
      val ps = os.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2).keys.toSeq
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = deg.values.groupBy(d => java.lang.Long.toBinaryString(d).length.toLong)
      .map { case (b, ds) => (b, ds.size.toLong, ds.min, ds.max) }.toSet
    val got = SparkEntry.queries("q_graph_degree_dist")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expect)
  }
}
