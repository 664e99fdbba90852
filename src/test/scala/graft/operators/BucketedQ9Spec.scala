package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 verdict #3: TPC-H Q9 — the suite's heaviest real query —
  * pays one compound-key (l_partkey, l_suppkey) fact-fact exchange
  * pair on the flat layout. With lineitem written
  * `bucketBy(l_partkey, l_suppkey)`, the ps aggregation inherits the
  * scan's bucket partitioning and the lineitem⋈ps join co-locates:
  * every compound-key exchange disappears from the finalized plan
  * while the answer stays bit-identical. This is the write-once
  * layout that serves every partsupp-shaped join (Q2/Q9/Q11/Q16/Q17).
  */
class BucketedQ9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Finalized-plan occurrences of a hash exchange on the compound
    * offer key (either side's column naming). */
  private def compoundKeyExchanges(df: DataFrame): Int = {
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    "Exchange hashpartitioning\\([^\\n]*partkey".r.findAllIn(plan).size
  }

  test("bucketed (partkey,suppkey) layout removes Q9's compound-key exchanges") {
    def flat(name: String) = graft.table(spark, sfDir, name)
    graft.table(spark, sfDir, "lineitem")
      .write.mode("overwrite")
      .bucketBy(8, "l_partkey", "l_suppkey")
      .sortBy("l_partkey", "l_suppkey")
      .saveAsTable("li_ps_bucketed")
    try {
      val flatQ9 = Coverage10.q9From(flat("lineitem"), flat("part"),
        flat("supplier"), flat("orders"), flat("nation"))
      val bucketedQ9 = Coverage10.q9From(spark.table("li_ps_bucketed"),
        flat("part"), flat("supplier"), flat("orders"), flat("nation"))

      val flatEx = compoundKeyExchanges(flatQ9)
      val bucketedEx = compoundKeyExchanges(bucketedQ9)
      assert(flatEx >= 2,
        s"flat layout should pay the compound-key exchange pair, saw $flatEx")
      assert(bucketedEx == 0,
        s"bucketed layout still shuffles on the compound key ($bucketedEx):\n" +
          bucketedQ9.queryExecution.executedPlan.toString.take(1200))
      info(s"compound-key exchanges: flat=$flatEx bucketed=$bucketedEx")

      // layout changes the exchanges, never the answer
      val a = flatQ9.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val b = bucketedQ9.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a == b)
      assert(a.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS li_ps_bucketed")
  }
}
