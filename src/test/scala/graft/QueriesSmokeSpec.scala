package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs end-to-end at sf0.001 (the hash-match vs
  * DuckDB is the driver's t2 gate + tools/check_oracle.py; this guards
  * against plans that stop resolving/executing). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  // Queries whose correct result can be empty at tiny scale.
  val mayBeEmpty: Set[String] = Set("q_except")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes") {
      val n = fn(spark, sfDir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique across modules (a duplicate silently " +
      "shadows the earlier QDef in the map — the q_pack_sequences lesson)") {
    val dupes = SparkEntry.modules.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate QDef names: ${dupes.mkString(", ")}")
  }

  test("every query has either oracle SQL or a documented exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only checks are reserved for sketch/probabilistic/bit-level
    // operators whose semantics aren't concisely ANSI-SQL-expressible;
    // each has a dedicated spec verifying it against an exact baseline.
    val exempt = Set("q_agg_approx_distinct", "q_sample_stratified",
      "q_dedup_simhash", "q_sim_ann_ivf", "q_agg_approx_percentile")
    assert((noOracle -- exempt).isEmpty, s"missing oracle: ${noOracle -- exempt}")
  }

  test("approx percentiles land within tolerance of the exact values") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q_agg_approx_percentile")(spark, sfDir)
      .select(col("l_returnflag"), col("price_p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = graft.table(spark, sfDir, "lineitem").groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v) / v < 0.05, s"$k: ${approx(k)} vs $v")
    }
  }
}
