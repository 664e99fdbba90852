package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala derivations for the batch-2 extension
  * queries (same pattern as Coverage6Spec). */
class Coverage7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)

  test("ewma equals a local sequential fold in the same order") {
    val ev = graft.table(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getDouble(3)))
    val expected = ev.groupBy(_._1).map { case (uid, es) =>
      val vals = es.sortBy(e => (e._2.toString, e._3)).map(_._4)
      val ewma = vals.foldLeft(0.0)((acc, x) => 0.3 * x + 0.7 * acc)
      (uid, es.length.toLong, ewma)
    }.toSet
    val got = q("q_ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // fold order is pinned, so this is EXACT double equality
    assert(got === expected)
  }

  test("bpe pair counts equal a local bigram count") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0).trim)
    val counts = docs.flatMap(_.split(" ", -1)).filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).view.mapValues(_.length.toLong)
    val expected = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20).toSet
    val got = q("q_bpe_merge").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.size === 20)
  }

  test("q18 rows really are big orders with the right sums") {
    val sums = graft.table(spark, sfDir, "lineitem")
      .groupBy("l_orderkey").agg(sum(col("l_quantity")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = q("q_tpch_q18").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (okey, sq) = (r.getLong(2), r.getDouble(5))
      assert(sq > 220, s"order $okey sum_qty $sq")
      assert(math.abs(sums(okey) - sq) < 1e-9)
    }
    // limit determinism
    assert(q("q_tpch_q18").collect().toSeq === rows.toSeq)
  }

  test("lateral top-2 equals the window formulation") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val c = graft.table(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey", "c_name")
    val viaWindow = graft.table(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(c, col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    val lateral = q("q_join_lateral")
    assert(lateral.exceptAll(viaWindow).isEmpty
      && viaWindow.exceptAll(lateral).isEmpty)
    assert(lateral.count() > 0)
  }

  test("discrete percentiles are corpus elements at the right depths") {
    val vals = graft.table(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def disc(xs: Array[Double], p: Double): Double =
      xs(math.ceil(p * xs.length).toInt - 1)
    q("q_percentile_disc").collect().foreach { r =>
      val xs = vals(r.getString(0))
      assert(r.getDouble(1) === disc(xs, 0.25))
      assert(r.getDouble(2) === disc(xs, 0.5))
      assert(r.getDouble(3) === disc(xs, 0.75))
    }
  }

  test("triangle count equals a local enumeration") {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keySet // support >= 2 orders
    val byP1 = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = edges.toSeq.map { case (a, b) =>
      byP1.getOrElse(b, Set.empty).count(c => edges.contains((a, c))).toLong
    }.sum
    val got = q("q_triangle_count").collect().head.getLong(0)
    assert(got === expected)
    assert(got > 0)
  }

  test("null-safe join keeps the null group a plain equi-join drops") {
    val rows = q("q_join_nullsafe").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    val urgent = graft.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(rows.contains(None), "the null key must survive the join")
    assert(rows(None) === urgent)
    assert(rows.size === 5)
    assert(rows.values.sum === graft.table(spark, sfDir, "orders").count())
  }

  test("values-literal dimension join conserves totals over 5 ranks") {
    val rows = q("q_values_join").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(rows.keySet === Set(1, 2, 3, 4, 5))
    assert(rows.values.sum === graft.table(spark, sfDir, "orders").count())
  }

  test("recursive spine is a complete month grid with conserved counts") {
    val rows = q("q_recursive_spine").collect()
      .map(r => (r.getAs[java.sql.Date](0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toString)
    assert(rows.length === 80) // 1995-01 .. 2001-08 inclusive
    rows.sliding(2).foreach { case Array((a, _), (b, _)) =>
      assert(a.plusMonths(1) === b, s"gap between $a and $b")
    }
    val total = graft.table(spark, sfDir, "orders").count()
    assert(rows.map(_._2).sum === total, "every order lands in one month")
  }

  test("hardcoded spine bounds cover the corpus at every verified scale") {
    // q_recursive_spine's month grid is fixed to 1995-01..2001-08; an
    // order dated outside it would silently vanish from the counts on
    // BOTH engines (parity would still hold). This guard fails loudly
    // if a future corpus widens the date range.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1") if new java.io.File(d).isDirectory) {
      val r = graft.table(spark, d, "orders")
        .agg(min(col("o_orderdate")).as("mn"), max(col("o_orderdate")).as("mx"))
        .collect().head
      val (mn, mx) = (r.getAs[java.time.LocalDateTime](0),
        r.getAs[java.time.LocalDateTime](1))
      assert(!mn.isBefore(java.time.LocalDateTime.of(1995, 1, 1, 0, 0)),
        s"$d: corpus starts $mn, before the spine anchor")
      assert(mx.isBefore(java.time.LocalDateTime.of(2001, 9, 1, 0, 0)),
        s"$d: corpus ends $mx, past the spine's last month")
    }
  }

  test("corr matrix has six rows of valid correlations") {
    val rows = q("q_corr_matrix").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
    assert(rows.length === 6)
    assert(rows.map(_._1).distinct.length === 6)
    rows.foreach { case (pair, c) =>
      assert(c >= -1.0 && c <= 1.0, s"$pair corr $c out of range")
    }
  }
}
