package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OrderedPrefix must reproduce the sequential window's answer for an
  * arbitrary numeric total order while never running a data-sized
  * unpartitioned window — pinned against brute-force folds, under
  * adversarial repartitionings, per-key grouping, and a fully
  * degenerate (single-value) order key.
  */
class OrderedPrefixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random rows: (id, key ∈ {a,b,c}, ord, v)
  private def mkRows(n: Int) =
    spark.range(n).select(
      col("id"),
      element_at(array(lit("a"), lit("b"), lit("c")),
        (pmod(col("id") * 7919, lit(3)) + 1).cast("int")).as("k"),
      sin(col("id").cast("double") * 12.9898).multiply(1000).as("ord"),
      cos(col("id").cast("double") * 78.233).multiply(100).as("v"))

  test("global runningMax (inclusive and exclusive) == brute-force fold") {
    val df = mkRows(4000).cache()
    val rows = df.select("id", "ord", "v").as[(Long, Double, Double)]
      .collect().sortBy(r => (r._2, r._1))
    val incl = scala.collection.mutable.Map[Long, Double]()
    val excl = scala.collection.mutable.Map[Long, Option[Double]]()
    var mx = Double.NegativeInfinity
    rows.foreach { case (id, _, v) =>
      excl(id) = if (mx == Double.NegativeInfinity) None else Some(mx)
      mx = math.max(mx, v); incl(id) = mx
    }
    val gotIncl = OrderedPrefix
      .runningMax(df, Nil, col("ord"), col("id"), col("v"), "m")
      .select("id", "m").as[(Long, Double)].collect().toMap
    assert(gotIncl == incl.toMap)
    val gotExcl = OrderedPrefix
      .runningMax(df, Nil, col("ord"), col("id"), col("v"), "m", inclusive = false)
      .select("id", "m").as[(Long, Option[Double])].collect().toMap
    assert(gotExcl == excl.toMap)
  }

  test("per-key rankSum == brute-force per-key sequential fold") {
    val df = mkRows(3000).cache()
    val byKey = df.select("id", "k", "ord", "v").as[(Long, String, Double, Double)]
      .collect().groupBy(_._2)
    val expect: Map[Long, (Long, BigDecimal)] = byKey.toSeq.flatMap {
      case (_, rs) =>
        var acc = BigDecimal(0).setScale(10)
        rs.sortBy(r => (r._3, r._1)).zipWithIndex.map { case ((id, _, _, v), i) =>
          acc += BigDecimal(v).setScale(10, BigDecimal.RoundingMode.HALF_UP)
          id -> ((i + 1).toLong,
            acc.setScale(4, BigDecimal.RoundingMode.HALF_UP))
        }
    }.toMap
    // exact decimal value column → order-independent running sums
    val got = OrderedPrefix.rankSum(df, Seq("k"), col("ord"), col("id"),
        col("v").cast("decimal(38,10)"), "rk", "cum")
      .select(col("id"), col("rk"), col("cum").cast("decimal(38,4)"))
      .as[(Long, Long, BigDecimal)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect)
  }

  test("output invariant under adversarial repartitionings") {
    val base = mkRows(2000)
    def run(df: org.apache.spark.sql.DataFrame) =
      OrderedPrefix.rankSum(df, Nil, col("ord"), col("id"),
          col("v").cast("decimal(38,10)"), "rk", "cum")
        .select("id", "rk").as[(Long, Long)].collect().toSet
    val a = run(base.repartition(1))
    val b = run(base.repartition(13, col("k")))
    val c = run(base.orderBy(col("ord").desc))
    assert(a == b && b == c)
  }

  test("degenerate single-value order key still ranks completely by tie") {
    val df = spark.range(1500).select(col("id"), lit(1.0).as("ord"))
    val ranks = OrderedPrefix.rank(df, Nil, col("ord"), col("id"), "rk")
      .select("id", "rk").as[(Long, Long)].collect()
    assert(ranks.toMap == (0L until 1500L).map(i => i -> (i + 1)).toMap)
  }

  test("null order keys drop, non-null rows rank as if nulls were absent") {
    // the documented contract: a null ord has no position in the total
    // order — rows carrying one are dropped, never mis-ranked
    val df = spark.range(100).select(col("id"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id").cast("double"))
        .as("ord"))
    val got = OrderedPrefix.rank(df, Nil, col("ord"), col("id"), "rk")
      .select("id", "rk").as[(Long, Long)].collect()
    assert(got.length == 90)
    val expect = (0L until 100L).filter(_ % 10 != 0)
      .zipWithIndex.map { case (id, i) => id -> (i + 1).toLong }.toMap
    assert(got.toMap == expect)
  }

  test("equi-depth buckets stay balanced under 90%-identical order values") {
    // The shape that killed the old width_bucket bounds: 90% of rows
    // share ONE order value (think a default timestamp), the rest
    // spread. Equal-width bucketing files all mode rows into one
    // bucket → one task sorts 90% of the data. Composite (ord, tie)
    // equi-depth cutoffs split the heavy value by tie range, so the
    // largest bucket stays within a small multiple of the even share.
    val n = 100000
    val df = spark.range(n).select(
      col("id"),
      when(pmod(col("id"), lit(10)) < 9, lit(1234.5))
        .otherwise(col("id").cast("double") / 1000).as("ord"))
    val sizes = OrderedPrefix.bucketed(df, Nil, col("ord"), col("id"))
      .groupBy("_op_bucket").count()
      .select("count").as[Long].collect()
    assert(sizes.sum == n)
    val even = n.toDouble / 254
    assert(sizes.max <= 8 * even,
      s"largest bucket ${sizes.max} vs even share $even — skew not split")
    // and the result on this distribution still matches the brute force
    val rows = df.select("id", "ord").as[(Long, Double)].collect()
      .sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val got = OrderedPrefix.rank(df, Nil, col("ord"), col("id"), "rk")
      .select("id", "rk").as[(Long, Long)].collect().toMap
    assert(got == rows)
  }

  test("rankMulti == independent rank calls for every ordering (incl. skew)") {
    // mixed orders over one frame: ascending ord, descending v (as a
    // negated double), and a heavily skewed third (90% one value) —
    // the shared-sample cutoffs must reproduce each independent rank
    val df = mkRows(3000)
      .withColumn("ord2", -col("v"))
      .withColumn("ord3",
        when(pmod(col("id"), lit(10)) < 9, lit(42.0))
          .otherwise(col("id").cast("double") / 100))
      .cache()
    val multi = OrderedPrefix.rankMulti(df, Seq(
      (col("ord"), "r1"), (col("ord2"), "r2"), (col("ord3"), "r3")),
      col("id"))
      .select("id", "r1", "r2", "r3").as[(Long, Long, Long, Long)]
      .collect().map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    val singles = Seq("ord" -> "r1", "ord2" -> "r2", "ord3" -> "r3").map {
      case (o, out) =>
        OrderedPrefix.rank(df, Nil, col(o), col("id"), out)
          .select("id", out).as[(Long, Long)].collect().toMap
    }
    val expect = singles(0).keys
      .map(id => id -> ((singles(0)(id), singles(1)(id), singles(2)(id))))
      .toMap
    assert(multi == expect)
    df.unpersist()
  }

  test("rankMulti drops rows with a null in ANY ordering (the rank contract)") {
    val df = Seq((1L, Some(1.0), Some(5.0)), (2L, None, Some(4.0)),
      (3L, Some(3.0), None), (4L, Some(2.0), Some(1.0)))
      .toDF("id", "o1", "o2")
    val got = OrderedPrefix.rankMulti(df,
      Seq((col("o1"), "r1"), (col("o2"), "r2")), col("id"))
      .select("id", "r1", "r2").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L), (4L, 2L, 1L)))
  }

  test("no data-sized unpartitioned window in the plan") {
    val df = mkRows(1000)
    val plan = OrderedPrefix.rankSum(df, Nil, col("ord"), col("id"),
      col("v").cast("decimal(38,10)"), "rk", "cum")
      .queryExecution.optimizedPlan.toString
    // every row_number/per-row window partitions by the bucket column;
    // the only unpartitioned window is over the ≤254-row summary table
    val winLine = plan.linesIterator.find(_.contains("row_number")).get
    assert(winLine.contains("_op_bucket"),
      s"row_number window must partition by bucket: $winLine")
  }
}
