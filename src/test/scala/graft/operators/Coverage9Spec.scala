package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** TPC-H Q2/Q21 shapes vs independent in-memory derivations. */
class Coverage9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)

  // region/nation keys are int32 in the corpus; supplier/part keys int64
  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  private def regionNations(rName: String): Set[Long] = {
    val regions = graft.table(spark, sfDir, "region").collect()
      .map(r => lng(r, 0) -> r.getString(1)).toMap
    graft.table(spark, sfDir, "nation").collect()
      .filter(r => regions(lng(r, 2)) == rName).map(lng(_, 0)).toSet
  }

  test("q_tpch_q2 equals the local min-cost-supplier derivation") {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ps = li.groupBy(x => (x._1, x._2)).view
      .mapValues(_.map(_._3).min).toMap
    val euNations = regionNations("EUROPE")
    val sup = graft.table(spark, sfDir, "supplier").collect()
      .map(r => lng(r, 0) -> (r.getString(1), lng(r, 2), r.getDouble(3)))
      .toMap
    val euOffers = ps.filter { case ((_, sk), _) =>
      euNations.contains(sup(sk)._2)
    }
    val minCost = euOffers.groupBy(_._1._1).view
      .mapValues(_.values.min).toMap
    val parts = graft.table(spark, sfDir, "part")
      .select("p_partkey", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val expected = euOffers.collect {
      case ((pk, sk), cost)
        if parts.get(pk).exists(p => p._2 <= 15 && p._1 == "STANDARD") &&
          cost == minCost(pk) =>
        (sup(sk)._1, pk, cost)
    }.toSet
    val got = q("q_tpch_q2").collect()
      .map(r => (r.getString(1), r.getLong(3), r.getDouble(5))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "filter must select something at sf0.001")
  }

  test("q_tpch_q21 equals the local sole-flagged-supplier derivation") {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val fOrders = graft.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus").collect()
      .filter(_.getString(1) == "F").map(_.getLong(0)).toSet
    val byOrder = li.groupBy(_._1)
    val asiaNations = regionNations("ASIA")
    val sup = graft.table(spark, sfDir, "supplier").collect()
      .map(r => lng(r, 0) -> (r.getString(1), lng(r, 2))).toMap
    val waiting = li.filter { case (ok, sk, flag) =>
      flag == "R" && fOrders.contains(ok) &&
        asiaNations.contains(sup(sk)._2) &&
        byOrder(ok).exists(_._2 != sk) &&
        !byOrder(ok).exists(l => l._2 != sk && l._3 == "R")
    }
    val expected = waiting.groupBy(x => sup(x._2)._1).view
      .mapValues(_.length.toLong).toMap
    val got = q("q_tpch_q21").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toMap === expected)
    assert(got.nonEmpty, "at least one sole-flagged supplier at sf0.001")
    // the ORDER BY is a total order: numwait desc, then name
    assert(got.sortBy(x => (-x._2, x._1)).sameElements(got))
  }

  test("q_tpch_q4 counts exactly the flagged quarter orders") {
    val flagged = graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_returnflag").collect()
      .filter(_.getString(1) == "R").map(_.getLong(0)).toSet
    val quarter = graft.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getString(2)))
      .filter { case (_, d, _) =>
        !d.isBefore(java.time.LocalDateTime.of(1996, 7, 1, 0, 0)) &&
          d.isBefore(java.time.LocalDateTime.of(1996, 10, 1, 0, 0))
      }
    val expected = quarter.filter(o => flagged.contains(o._1))
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val got = q("q_tpch_q4").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("q_tpch_q7 keeps only the two nation-pair directions") {
    val rows = q("q_tpch_q7").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty, "the chosen pair must trade at sf0.001")
    assert(rows.forall { case (sn, cn, _, rev) =>
      Set(("NATION_18", "NATION_19"), ("NATION_19", "NATION_18"))((sn, cn)) && rev > 0
    })
  }

  test("q_tpch_q8 market shares are valid fractions") {
    val rows = q("q_tpch_q8").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, sh) => sh >= 0.0 && sh <= 1.0 })
  }

  test("q_tpch_q13 equals the local order-count distribution") {
    val custs = graft.table(spark, sfDir, "customer")
      .select("c_custkey").collect().map(lng(_, 0))
    val perCust = graft.table(spark, sfDir, "orders")
      .select("o_custkey", "o_orderpriority").collect()
      .filter(!_.getString(1).startsWith("1"))
      .groupBy(r => lng(r, 0)).view.mapValues(_.length.toLong).toMap
    val expected = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = q("q_tpch_q13").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toMap === expected)
    assert(got.map(_._2).sum === custs.length.toLong,
      "every customer lands in exactly one class")
    val nOrders = graft.table(spark, sfDir, "orders")
      .filter(!col("o_orderpriority").like("1%")).count()
    assert(got.map { case (c, d) => c * d }.sum === nOrders,
      "classes conserve the filtered order count")
  }

  test("q_dedup_title_norm groups match a local normalization") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def key(t: String): String =
      t.trim.take(48).toLowerCase
        .replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
    val expected = docs.groupBy(d => key(d._2))
      .collect { case (k, ds) if ds.length > 1 =>
        (k, ds.length.toLong, ds.map(_._1).min)
      }.toSet
    val got = q("q_dedup_title_norm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "the corpus contains prefix duplicates")
  }

  test("q_len_buckets is a complete partition with ordered cutoffs") {
    val lens = graft.table(spark, sfDir, "documents")
      .select("n_chars").collect().map(lng(_, 0)).sorted
    val n = lens.length
    val cutoffs = (1 to 9).map { k =>
      // min length whose cumulative count reaches k/10 of the corpus
      lens(lens.indices.find(i => (i + 1) * 10 >= k * n).get)
    }
    val expected = lens.groupBy(l => 1L + cutoffs.count(_ < l)).view
      .mapValues(ls => (ls.length.toLong, ls.min, ls.max)).toMap
    val got = q("q_len_buckets").collect()
      .map(r => lng(r, 0) -> ((lng(r, 1), lng(r, 2), lng(r, 3)))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === n.toLong, "every doc lands in a bucket")
    // decile sizes are balanced up to length-tie granularity
    assert(got.size >= 8, s"expected ~10 buckets, got ${got.size}")
  }

  test("q_state_at reconstructs the last pre-T change per user") {
    val cutoff = java.time.LocalDateTime.of(2024, 1, 15, 0, 0)
    val ev = graft.table(spark, sfDir, "events")
      .select("user_id", "event_id", "event_type", "value", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getAs[java.time.LocalDateTime](4)))
    val expected = ev.filter(!_._5.isAfter(cutoff)).groupBy(_._1).map {
      case (u, es) =>
        val last = es.maxBy(e => (e._5.toString, e._2))
        u -> ((last._2, last._3, last._4))
    }
    val got = q("q_state_at").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getDouble(3))))
      .toMap
    assert(got === expected)
    assert(got.nonEmpty, "some users have pre-cutoff history at sf0.001")
  }

  test("q_json_funcs2 round-trips k and serializes canonically") {
    val rows = q("q_json_funcs2").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val obj = r.getString(1)
      assert(r.getLong(2) === 2L, "two-element array")
      // the serialized object starts with the struct-ordered fields
      assert(obj.startsWith("{\"t\":\""), obj)
      if (!r.isNullAt(3)) assert(obj.contains("\"k\":" + r.getLong(3)), obj)
    }
  }

  test("q_array_hof predicates agree with locally evaluated lambdas") {
    val vecs = graft.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    q("q_array_hof").collect().foreach { r =>
      val v = vecs(r.getLong(0))
      assert(r.getLong(1) === v.count(_ > 0.1f).toLong)
      assert(r.getBoolean(2) === v.exists(_ > 0.1f))
      assert(r.getBoolean(3) === v.forall(_ > -1f))
      assert(r.getLong(4) === v.count(x => math.abs(x) <= 0.01).toLong)
    }
  }

  test("q_dup_rate_by_source matches a local per-source dup accounting") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val groups = docs.groupBy(_._3).values.map { ds =>
      (ds.map(_._1).toSet, ds.length, ds.map(_._1).min)
    }.toSeq
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val inDup = ds.count(d => groups.exists(g => g._2 > 1 && g._1(d._1)))
      val redundant = ds.count(d =>
        groups.exists(g => g._2 > 1 && g._1(d._1) && d._1 != g._3))
      (src, (ds.length.toLong, inDup.toLong, redundant.toLong,
        redundant.toDouble / ds.length))
    }
    val got = q("q_dup_rate_by_source").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got === expected)
  }

  test("q_sample_balanced downsamples every class to the minimum size") {
    val rows = graft.table(spark, sfDir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val target = rows.groupBy(_._2).values.map(_.length).min
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (lb, vs) =>
      vs.map(_._1).sortBy(v => (md5hex(v.toString), v)).take(target)
        .zipWithIndex.map { case (v, i) => (v, lb, i.toLong + 1) }
    }.toSet
    val got = q("q_sample_balanced").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.groupBy(_._2).values.forall(_.size == target),
      "every class is exactly the minimum class size")
  }

  test("q_event_transitions rows are probability distributions per source") {
    val rows = q("q_event_transitions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // per-source probabilities sum to 1 exactly up to fp addition order
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-9, s"source $t")
    }
    // counts agree with a local per-user sequential derivation
    val ev = graft.table(spark, sfDir, "events")
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime](2), r.getLong(3)))
    val expected = ev.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._3.toString, e._4)).toSeq.sliding(2).collect {
        case Seq(a, b) => (a._2, b._2)
      }
    }.toSeq.groupBy(x => x).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap === expected)
  }

  test("q_winsorize clips exactly at the p05/p95 order statistics") {
    val ev = graft.table(spark, sfDir, "events")
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val expected = ev.groupBy(_._1).map { case (t, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      // smallest value whose cume_dist reaches p
      def disc(p: Double) = sorted(sorted.indices.find(i => (i + 1).toDouble / n >= p).get)
      val (lo, hi) = (disc(0.05), disc(0.95))
      val clipped = sorted.map(v => math.max(lo, math.min(hi, v)))
      (t, (n.toLong, sorted.count(_ < lo).toLong, sorted.count(_ > hi).toLong,
        BigDecimal(clipped.map(BigDecimal(_)).sum.toDouble)))
    }
    val got = q("q_winsorize").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        BigDecimal(r.getDouble(4)))))
      .toMap
    expected.foreach { case (t, (n, nl, nh, ws)) =>
      val (gn, gnl, gnh, gws) = got(t)
      assert((gn, gnl, gnh) === ((n, nl, nh)), s"counts for $t")
      assert((gws - ws).abs < BigDecimal(1e-6), s"wsum for $t: $gws vs $ws")
    }
    assert(got.keySet === expected.keySet)
  }

  test("q_embed_norm_stats buckets match locally computed norms") {
    val vecs = graft.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val norms = vecs.map { case (_, v) =>
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    }
    val expected = norms.groupBy(n => math.floor(n * 16).toLong).view
      .mapValues(ns => (ns.length.toLong, ns.min, ns.max)).toMap
    val got = q("q_embed_norm_stats").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === vecs.length.toLong)
  }

  test("q_asof_nearest picks the truly closest click, ties to earlier") {
    val ev = graft.table(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[java.time.LocalDateTime](3)))
    def us(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    val byUser = ev.filter(e => e._3 == "click" || e._3 == "purchase")
      .groupBy(_._2)
    val expected = byUser.values.flatten.filter(_._3 == "purchase").map { p =>
      val clicks = byUser(p._2).filter(_._3 == "click")
        .map(c => (us(c._4), c._1)).toSeq.sorted
      val pu = us(p._4)
      if (clicks.isEmpty) p._1 -> None
      else {
        // nearest by |gap|; ties toward the earlier click
        val best = clicks.minBy { case (cu, eid) => (math.abs(cu - pu), cu, eid) }
        p._1 -> Some((best._1, math.abs(best._1 - pu)))
      }
    }.toMap
    val got = q("q_asof_nearest").collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(3)) None
                       else Some((r.getLong(3), r.getLong(4))))
    }.toMap
    assert(got.keySet === expected.keySet)
    // compare gaps (the nearest TS itself can differ between two
    // equidistant clicks only when gaps tie; the tie rule is asserted
    // via the chosen timestamp too)
    assert(got === expected)
  }
}
