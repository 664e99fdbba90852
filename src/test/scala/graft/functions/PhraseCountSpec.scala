package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** phrase_count == the HOF filter-over-sequence formulation it
  * replaced, on the real corpus and on edge shapes (overlaps,
  * duplicate terms, null tokens, sub-phrase docs). */
class PhraseCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hof(phrase: Seq[String]) = {
    val conds = phrase.zipWithIndex
      .map { case (t, j) => s"w[i + $j] = '$t'" }.mkString(" and ")
    expr(s"cast(size(filter(sequence(0, size(w) - ${phrase.size})," +
      s" i -> $conds)) as bigint)")
  }

  test("equals the HOF form on sf0.001 documents") {
    PhraseExpressions.register(spark)
    val docs = graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 2)
    for (phrase <- Seq(Seq("hash", "join"), Seq("table", "value", "fast"))) {
      val cmp = docs.select(
        expr(s"phrase_count(w, '${phrase.mkString(" ")}')").as("a"),
        hof(phrase).as("b"))
      assert(cmp.filter(col("a") =!= col("b")).count() == 0)
      assert(cmp.filter(col("a") > 0).count() > 0, s"no matches for $phrase")
    }
  }

  test("edge shapes: overlap, duplicate terms, nulls, short docs") {
    PhraseExpressions.register(spark)
    val rows = Seq(
      (1L, Seq("a", "a", "a", "b")),
      (2L, Seq("a")),                 // shorter than the phrase
      (3L, Seq[String]()),            // empty array
      (4L, Seq("a", null, "a", "a"))) // null token never matches
      .toDF("id", "w")
    val got = rows.select(col("id"),
        expr("phrase_count(w, 'a a')").as("c"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("non-literal phrase is rejected at analysis") {
    PhraseExpressions.register(spark)
    val e = intercept[Exception] {
      Seq((1L, Seq("a"))).toDF("id", "w")
        .select(expr("phrase_count(w, concat(cast(id as string), ' x'))"))
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }
}
