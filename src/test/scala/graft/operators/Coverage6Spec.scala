package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-5 extension batch beyond the DuckDB hash-gate:
  * each non-trivial query is pinned against an INDEPENDENT plain-Scala
  * reimplementation on the sf0.001 corpus (collected locally — the
  * corpus is small; the point is a second, join-free derivation of the
  * same answer), plus structural properties (skyline incomparability,
  * format round-trip exactness).
  */
class Coverage6Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)

  // ---- skyline ----------------------------------------------------------

  test("skyline equals the brute-force NOT EXISTS set") {
    val rows = graft.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getDouble(2)))
    def dominates(a: (Long, java.time.LocalDateTime, Double),
                  b: (Long, java.time.LocalDateTime, Double)): Boolean =
      a._3 >= b._3 && !a._2.isBefore(b._2) &&
        (a._3 > b._3 || a._2.isAfter(b._2))
    val expected = rows.filter(b => !rows.exists(a => dominates(a, b))).map(_._1).toSet
    val got = q("q_skyline").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("skyline rows are pairwise incomparable") {
    val sky = q("q_skyline").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](1), r.getDouble(2)))
    for (a <- sky; b <- sky if a != b)
      assert(!(a._2 >= b._2 && !a._1.isBefore(b._1)),
        s"$a dominates $b inside the skyline")
  }

  // ---- passage dedup ----------------------------------------------------

  test("passage dedup equals a plain-Scala segment-and-filter derivation") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim))
    def segsOf(text: String): Seq[String] =
      text.split(" ", -1).grouped(8).map(_.mkString(" ")).toSeq
    val freq = docs.flatMap { case (id, t) => segsOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val expected = docs.map { case (id, t) =>
      val segs = segsOf(t)
      val keptSegs = segs.filterNot(freq)
      (id, keptSegs.mkString(" "), (segs.size - keptSegs.size).toLong)
    }.toSet
    val got = q("q_dedup_passages").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.exists(_._3 > 0), "corpus should contain repeated passages")
    assert(got.exists(_._3 == 0), "corpus should contain untouched docs")
  }

  // ---- pagerank -----------------------------------------------------------

  test("pagerank equals a local 10-iteration reference on the same graph") {
    val ev = graft.table(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getString(3)))
    val edges = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2.toString, e._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val outTot = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val w = edges.map { case ((s, d), c) => (s, d) -> c / outTot(s) }
    val nodes = ev.map(_._4).distinct.sorted
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 10)
      r = nodes.map { d =>
        val inflow = nodes.flatMap(s => w.get((s, d)).map(_ * r(s))).sum
        d -> (0.15 / n + 0.85 * inflow)
      }.toMap
    val got = q("q_pagerank").collect()
      .map(x => (x.getString(0), x.getDouble(1))).toMap
    assert(got.keySet === r.keySet)
    r.foreach { case (node, rank) =>
      assert(math.abs(got(node) - rank) < 2e-6, s"node $node: ${got(node)} vs $rank")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-4,
      "every event type has out-edges here, so rank mass is conserved")
  }

  // ---- mode / islands -----------------------------------------------------

  test("mode picks the max count with the smallest-value tiebreak") {
    val counts = graft.table(spark, sfDir, "orders")
      .select("o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .groupBy(_._1._1)
    val expected = counts.map { case (status, m) =>
      val (best, cnt) = m.map { case ((_, p), c) => (p, c) }
        .toSeq.minBy { case (p, c) => (-c, p) }
      (status, best, cnt)
    }.toSet
    val got = q("q_agg_mode").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("islands equal a local run-length derivation (runs >= 3)") {
    val ev = graft.table(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._2.toString, e._3))
      // split into maximal same-type runs
      val runs = sorted.foldLeft(List.empty[List[(Long, java.time.LocalDateTime, Long, String)]]) {
        case (acc, e) => acc match {
          case h :: t if h.head._4 == e._4 => (e :: h) :: t
          case _ => List(e) :: acc
        }
      }
      runs.filter(_.size >= 3).map { run =>
        val ts = run.map(_._2)
        (uid, run.head._4, ts.min(Ordering.by((_: java.time.LocalDateTime).toString)),
          ts.max(Ordering.by((_: java.time.LocalDateTime).toString)), run.size.toLong)
      }
    }.toSet
    val got = q("q_islands").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime](2), r.getAs[java.time.LocalDateTime](3),
        r.getLong(4))).toSet
    assert(got === expected)
  }

  // ---- regression ---------------------------------------------------------

  test("regr_slope matches covar_pop/var_pop per group") {
    val manual = graft.table(spark, sfDir, "lineitem").groupBy("l_returnflag")
      .agg((covar_pop(col("l_extendedprice"), col("l_quantity"))
        / var_pop(col("l_quantity"))).as("slope"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = q("q_regression").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === manual.keySet)
    manual.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-3, s"$k: ${got(k)} vs $v")
    }
  }

  // ---- TPC-H determinism ---------------------------------------------------

  test("tpch q3/q10 limits are deterministic across reruns") {
    for (name <- Seq("q_tpch_q3", "q_tpch_q10")) {
      val a = q(name).collect().toSeq
      val b = q(name).collect().toSeq
      assert(a === b, s"$name rerun differs")
      assert(a.nonEmpty)
    }
  }

  // ---- format round-trips ---------------------------------------------------

  test("csv/json/orc round-trips are row-exact, not just aggregate-exact") {
    val s = spark
    val sup = graft.table(s, sfDir, "supplier")
    val csvDir = java.nio.file.Files.createTempDirectory("graft_csv_spec").toString
    sup.write.mode("overwrite").option("header", "true").csv(csvDir)
    val csvBack = s.read.schema(sup.schema).option("header", "true").csv(csvDir)
    assert(csvBack.exceptAll(sup).isEmpty && sup.exceptAll(csvBack).isEmpty)

    val o = graft.table(s, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_odate"))
    val jsonDir = java.nio.file.Files.createTempDirectory("graft_json_spec").toString
    o.write.mode("overwrite").json(jsonDir)
    val jsonBack = s.read.schema(o.schema).json(jsonDir)
    assert(jsonBack.exceptAll(o).isEmpty && o.exceptAll(jsonBack).isEmpty)

    val l = graft.table(s, sfDir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_shipdate")
    val orcDir = java.nio.file.Files.createTempDirectory("graft_orc_spec").toString
    l.write.mode("overwrite").orc(orcDir)
    val orcBack = s.read.schema(l.schema).orc(orcDir)
    assert(orcBack.exceptAll(l).isEmpty && l.exceptAll(orcBack).isEmpty)
  }
}
