package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streamed Misra-Gries shard state must (a) keep every exact
  * heavy hitter of the accumulated corpus in its candidate set — the
  * per-shard MG guarantee, across micro-batch boundaries — and (b)
  * keep per-shard state bounded at k entries regardless of vocabulary. */
class IncrementalHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Shards = 8
  private val K = 200

  /** Stream the corpus tokens in `nBatches` doc_id slices; return the
    * latest candidate set per shard. */
  private def streamCandidates(nBatches: Int): Map[Int, Map[String, Long]] = {
    val docs = graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val ms = MemoryStream[String](spark)
    val name = s"hh_${System.nanoTime()}"
    val q = IncrementalHeavyHitters.candidates(ms.toDS(), Shards, K)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      (0 until nBatches).foreach { b =>
        val toks = docs.filter(_._1 % nBatches == b).flatMap(_._2)
        ms.addData(toks.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val all = spark.table(name)
      .as[IncrementalHeavyHitters.Candidate].collect()
    // keep each shard's LATEST emission (max version)
    val latest = all.groupBy(_.shard).map { case (s, rows) =>
      val v = rows.map(_.version).max
      s -> rows.filter(_.version == v).map(c => c.term -> c.est).toMap
    }
    latest
  }

  test("every exact heavy hitter survives the streamed shard state") {
    val cand = streamCandidates(nBatches = 3)
    val candidateTerms = cand.values.flatMap(_.keys).toSet
    val exact = graft.SparkEntry
      .queries("q_heavy_hitters")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)
    val missing = exact.keySet.diff(candidateTerms)
    assert(missing.isEmpty,
      s"MG guarantee violated across batches, lost: ${missing.take(5)}")
    // and estimates never exceed true counts (MG only undercounts)
    exact.foreach { case (t, cnt) =>
      val est = cand(IncrementalHeavyHitters.shardOf(t, Shards))(t)
      assert(est <= cnt, s"$t: est $est > true $cnt")
    }
  }

  test("per-shard state stays bounded at k entries") {
    val cand = streamCandidates(nBatches = 2)
    cand.foreach { case (s, terms) =>
      assert(terms.size <= K, s"shard $s holds ${terms.size} > $K entries")
    }
  }

  test("batch-count invariance: 1-batch and 3-batch streams keep the same exact set") {
    // estimates are order-dependent (it's a sketch) but the GUARANTEED
    // survivors — the exact heavy hitters — must be present either way
    val exact = graft.SparkEntry
      .queries("q_heavy_hitters")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getString(0)).toSet
    val one = streamCandidates(nBatches = 1).values.flatMap(_.keys).toSet
    val three = streamCandidates(nBatches = 3).values.flatMap(_.keys).toSet
    assert(exact.subsetOf(one) && exact.subsetOf(three))
  }
}
