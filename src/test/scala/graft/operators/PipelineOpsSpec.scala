package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sfDir = "/root/testdata/sf0.001"

  test("stratified sample hits ~30% per language") {
    val total = graft.table(spark, sfDir, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = graft.SparkEntry.queries("q_sample_stratified")(spark, sfDir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    total.foreach { case (lang, n) =>
      val frac = sampled.getOrElse(lang, 0L).toDouble / n
      assert(frac > 0.1 && frac < 0.5, s"$lang sampled at $frac")
    }
  }

  test("train/test split is deterministic and covers every document") {
    val q = graft.SparkEntry.queries("q_train_test_split")
    val a = q(spark, sfDir).as[(String, Long, Long, Long)].collect().toSet
    val b = q(spark, sfDir).as[(String, Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.toSeq.map(_._2).sum == 500) // all docs assigned exactly once
    val train = a.find(_._1 == "train").get._2
    assert(train > 300 && train < 500) // ~80%
  }

  test("integrity audit reports zero orphans on the consistent corpus") {
    val r = graft.SparkEntry.queries("q_integrity")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(r.values.forall(_ == 0L), r.toString)
    assert(r.keySet.size == 3)
  }
}
