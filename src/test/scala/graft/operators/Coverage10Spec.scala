package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Wave-2 TPC-H shapes vs local derivations / invariants at sf0.001. */
class Coverage10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)

  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  test("q_tpch_q9 profit equals an exact BigDecimal derivation") {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val redParts = graft.table(spark, sfDir, "part")
      .select("p_partkey", "p_name").collect()
      .filter(_.getString(1).contains("red")).map(_.getLong(0)).toSet
    val cost = li.groupBy(x => (x._2, x._3)).view.mapValues(_.map(_._4).min)
    val supNation = {
      val nations = graft.table(spark, sfDir, "nation").collect()
        .map(r => lng(r, 0) -> r.getString(1)).toMap
      graft.table(spark, sfDir, "supplier").collect()
        .map(r => lng(r, 0) -> nations(lng(r, 2))).toMap
    }
    val orderYear = graft.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1).getYear.toLong)
      .toMap
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val expected = li.filter(l => redParts.contains(l._2)).map { l =>
      val amount = d2(l._4) * (BigDecimal(1) - d2(l._5)) -
        d2(cost((l._2, l._3))) * BigDecimal(l._6.toLong)
      ((supNation(l._3), orderYear(l._1)), amount)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
    val got = q("q_tpch_q9").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-6, s"$k: ${got(k)} vs $v")
    }
  }

  test("q_tpch_q11 keeps exactly the above-threshold part values") {
    val rows = q("q_tpch_q11").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(rows.nonEmpty, "NATION_3 holds stock at sf0.001")
    val total = rows.map(_._2).sum // kept rows are a subset; threshold uses full total
    assert(rows.forall(_._2 > 0))
    // every kept value clears 0.1% of the full nation total (recompute it)
    val ps = graft.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(x => (x._1, x._2)).map { case ((pk, sk), vs) =>
        (pk, sk, vs.map(_._3).min, vs.size)
      }
    val n3 = {
      val nations = graft.table(spark, sfDir, "nation").collect()
        .map(r => lng(r, 0) -> r.getString(1)).toMap
      graft.table(spark, sfDir, "supplier").collect()
        .filter(r => nations(lng(r, 2)) == "NATION_3").map(lng(_, 0)).toSet
    }
    val vals = ps.filter(p => n3.contains(p._2))
      .map(p => p._1 -> p._3 * p._4).toSeq
    val fullTotal = vals.map(_._2).sum
    val expected = vals.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 > 0.001 * fullTotal).toMap
    assert(rows.toMap.keySet === expected.keySet)
    assert(total <= fullTotal + 1e-6)
  }

  test("q_tpch_q15 returns the quarter's max-revenue suppliers") {
    val rows = q("q_tpch_q15").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val revs = rows.map(_._3).distinct
    assert(revs.size === 1, "all returned suppliers share the max revenue")
  }

  test("q_tpch_q16 never counts excluded suppliers") {
    val excluded = graft.table(spark, sfDir, "supplier").collect()
      .filter(_.getDouble(3) < 1000).map(lng(_, 0)).toSet
    val rows = q("q_tpch_q16").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Number](2).intValue,
        r.getLong(3)))
    assert(rows.nonEmpty)
    val allowedSizes = Set(1, 4, 9, 14, 19, 23, 36, 45)
    assert(rows.forall(r => r._1 != "Brand#1" && allowedSizes(r._3)))
    // recompute one bucket fully
    val ps = graft.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val parts = graft.table(spark, sfDir, "part")
      .select("p_partkey", "p_brand", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3))))
      .toMap
    val expected = ps.filter(p => !excluded.contains(p._2))
      .flatMap(p => parts.get(p._1).map(attr => (attr, p._2)))
      .filter { case ((b, _, sz), _) => b != "Brand#1" && allowedSizes(sz) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    assert(rows.map(r => ((r._1, r._2, r._3), r._4)).toMap === expected)
  }

  test("q_tpch_q17 equals the local below-threshold revenue") {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val b23 = graft.table(spark, sfDir, "part")
      .select("p_partkey", "p_brand").collect()
      .filter(_.getString(1) == "Brand#23").map(_.getLong(0)).toSet
    val thr = li.groupBy(_._1).view
      .mapValues(vs => 0.2 * (vs.map(_._3).sum / vs.length)).toMap
    val kept = li.filter(l => b23.contains(l._1) && l._3 < thr(l._1))
    val expected = kept.map(l => BigDecimal(l._2)).sum.toDouble / 7.0
    val got = q("q_tpch_q17").collect().head
    if (kept.isEmpty) assert(got.isNullAt(0))
    else assert(math.abs(got.getDouble(0) - expected) < 1e-6)
  }

  test("q_tpch_q22 counts wealthy customers inactive since 1999") {
    val custs = graft.table(spark, sfDir, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val pos = custs.filter(_._3 > 0)
    val (total, n) = (pos.map(c => BigDecimal(c._3)).sum.toDouble, pos.length)
    val active = graft.table(spark, sfDir, "orders")
      .select("o_custkey", "o_orderdate").collect()
      .filter(!_.getAs[java.time.LocalDateTime](1)
        .isBefore(java.time.LocalDateTime.of(1999, 1, 1, 0, 0)))
      .map(_.getLong(0)).toSet
    val sel = custs.filter(c => c._3 * n > total && !active.contains(c._1))
    val expected = sel.groupBy(_._2).view
      .mapValues(cs => (cs.length.toLong, cs.map(c => BigDecimal(c._3)).sum.toDouble))
      .toMap
    val got = q("q_tpch_q22").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === expected.keySet)
    assert(got.nonEmpty, "some wealthy inactive customers exist at sf0.001")
    expected.foreach { case (k, (cnt, bal)) =>
      assert(got(k)._1 === cnt)
      assert(math.abs(got(k)._2 - bal) < 1e-6)
    }
  }
}
