package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-3 extension semantics: local derivations plus the span-
  * corruption round-trip (input + target reconstruct the original). */
class Coverage8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)

  test("cumulative distinct ends at the true distinct count and is monotone") {
    val rows = q("q_cume_distinct").collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date](1).toString,
        r.getLong(2), r.getLong(3)))
    val truth = graft.table(spark, sfDir, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val ordered = rs.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._4 < b._4, s"$tpe cume not increasing")
        case _ =>
      }
      assert(ordered.map(_._3).sum === ordered.last._4, s"$tpe sum(new)==last cume")
      assert(ordered.last._4 === truth(tpe), s"$tpe final cume == distinct users")
    }
  }

  test("map funcs output equals a local frequent-entry serialization") {
    val ev = graft.table(spark, sfDir, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = ev.groupBy(_._1).map { case (u, es) =>
      val counts = es.groupBy(_._2).view.mapValues(_.size).toMap
      val freq = counts.filter(_._2 >= 2).toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k:$v" }.mkString(",")
      (u, counts.size.toLong, freq)
    }.toSet
    val got = q("q_map_funcs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === expected)
  }

  test("locf fills every gap with the latest prior observation") {
    val ev = graft.table(spark, sfDir, "events")
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getDouble(3)))
    val expected = ev.groupBy(_._1).iterator.flatMap { case (_, es) =>
      var carried: Option[Double] = None
      es.sortBy(e => (e._3.toString, e._2)).toSeq.map { e =>
        val v = if (e._4 < 10) None else Some(e._4)
        if (v.isDefined) carried = v
        e._2 -> (v, carried)
      }
    }.toMap
    q("q_locf").collect().foreach { r =>
      val eid = r.getLong(1)
      val v = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      val f = if (r.isNullAt(4)) None else Some(r.getDouble(4))
      assert((v, f) === expected(eid), s"event $eid")
    }
  }

  test("fuzzy match never crosses blocks and distances are correct") {
    val names = graft.table(spark, sfDir, "customer")
      .select("c_custkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = q("q_fuzzy_match").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, dist) = (names(r.getLong(0)), names(r.getLong(1)), r.getLong(2))
      assert(a.substring(9, 16) === b.substring(9, 16), "blocking key differs")
      assert(lev(a, b).toLong === dist)
      assert(dist <= 1)
    }
  }

  test("lm score equals a local bigram-LM evaluation") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(" ", -1).toSeq))
    val bigrams = docs.flatMap { case (id, w) =>
      w.zip(w.drop(1)).filter(p => p._1.nonEmpty && p._2.nonEmpty)
        .map(p => (id, p))
    }
    val c12 = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val nRare = bs.count { case (_, p) =>
        c12(p).toDouble / c1(p._1) < 0.01
      }
      (id, bs.size.toLong, nRare.toLong)
    }.toSet
    val got = q("q_lm_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.exists(_._3 > 0), "corpus should contain rare bigrams")
  }

  test("q14 promo share is a valid fraction of conserved revenue") {
    val r = q("q_tpch_q14").collect().head
    val (promo, total, share) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(promo >= 0 && promo <= total)
    assert(share === promo / total)
  }

  test("q19 disjunctive count equals a local evaluation") {
    val parts = graft.table(spark, sfDir, "part")
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val expected = graft.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_quantity").collect().count { r =>
        val (b, sz) = parts(r.getLong(0)); val qty = r.getDouble(1)
        (b == "Brand#12" && sz >= 1 && sz <= 5 && qty >= 1 && qty <= 11) ||
        (b == "Brand#23" && sz >= 1 && sz <= 10 && qty >= 10 && qty <= 20) ||
        (b == "Brand#34" && sz >= 1 && sz <= 15 && qty >= 20 && qty <= 30)
      }
    assert(q("q_tpch_q19").collect().head.getLong(1) === expected.toLong)
  }

  test("7-day trailing window counts equal a local recount") {
    val ev = graft.table(spark, sfDir, "events")
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.time.LocalDateTime](2)))
    val byUser = ev.groupBy(_._1)
    q("q_win_time_range").collect().take(500).foreach { r =>
      val (u, eid, ts) = (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2))
      val expected = byUser(u).count(e =>
        !e._3.isAfter(ts) && !e._3.isBefore(ts.minusDays(7)))
      assert(r.getLong(3) === expected.toLong, s"user $u event $eid")
    }
  }

  test("grouping indicators: the grand-total row carries the full count") {
    val rows = q("q_grouping_id").collect()
    val total = graft.table(spark, sfDir, "orders").count()
    val grand = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length === 1)
    assert(grand.head.getLong(4) === total)
    // level-1 subtotals sum back to the grand total
    val lvl1 = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 1)
    assert(lvl1.map(_.getLong(4)).sum === total)
  }

  test("span corruption round-trips: input + target reconstruct the doc") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim)).toMap
    val sentinel = "<x\\d+>".r
    q("q_span_corrupt").collect().foreach { r =>
      val (id, input, target) = (r.getLong(0), r.getString(1), r.getString(2))
      // parse target into sentinel -> hidden tokens
      val hidden = scala.collection.mutable.Map.empty[String, List[String]]
      var cur: String = null
      target.split(" ").filter(_.nonEmpty).foreach { t =>
        if (sentinel.matches(t)) { cur = t; hidden(cur) = Nil }
        else hidden(cur) = hidden(cur) :+ t
      }
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (sentinel.matches(t)) hidden(t) else Seq(t)
      }.mkString(" ")
      assert(rebuilt === docs(id), s"doc $id does not round-trip")
      // ~30% of tokens masked (3 per 10, modulo the tail)
      val nTok = docs(id).split(" ", -1).length
      val nHidden = hidden.values.map(_.size).sum
      assert(math.abs(nHidden - 0.3 * nTok) <= 3.0, s"doc $id masked $nHidden/$nTok")
    }
  }
}
