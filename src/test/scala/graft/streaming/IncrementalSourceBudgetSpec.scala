package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed admission set must equal batch q_token_budget exactly
  * when the stream arrives in md5 order — including budgets that close
  * across micro-batch boundaries (the per-source counter hand-off) —
  * and the per-source state must enforce the greedy invariant under
  * ANY chunking. */
class IncrementalSourceBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val Budget = 600L

  private def streamed(nBatches: Int, replayBatch: Option[Int] = None)
      : Seq[IncrementalSourceBudget.BAdmit] = {
    val docs = IncrementalSourceBudget
      .fromDocuments(graft.table(spark, sfDir, "documents"))
      .collect().sortBy(d => (d.ord, d.doc_id))
    val ms = MemoryStream[IncrementalSourceBudget.BDoc](spark)
    val name = s"budget_${System.nanoTime()}"
    val q = IncrementalSourceBudget.admit(ms.toDS(), Budget)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      docs.grouped(math.max(1, docs.length / nBatches + 1)).zipWithIndex
        .foreach { case (chunk, i) =>
          val times = if (replayBatch.contains(i)) 2 else 1
          (1 to times).foreach { _ =>
            ms.addData(chunk.toSeq)
            q.processAllAvailable()
          }
        }
    } finally q.stop()
    spark.table(name).as[IncrementalSourceBudget.BAdmit].collect().toSeq
  }

  private def batchRows: Set[(Long, String, Long, Long)] =
    graft.SparkEntry.queries("q_token_budget")(spark, sfDir)
      .as[(Long, String, Long, Long)].collect().toSet

  test("streamed admission == batch q_token_budget across 5 batches") {
    val got = streamed(5).map(a => (a.doc_id, a.source, a.toks, a.cum_tokens))
    assert(got.toSet === batchRows)
    assert(got.size === got.toSet.size, "no doc admitted twice")
  }

  test("single batch also matches (whole fold in one group iterator)") {
    assert(streamed(1).map(a => (a.doc_id, a.source, a.toks, a.cum_tokens))
      .toSet === batchRows)
  }

  test("redelivered micro-batch neither double-charges nor re-admits") {
    // at-least-once simulation: batch 1 (0-indexed) of 3 is delivered
    // TWICE. The admitted-id ledger must absorb the replay: admissions,
    // running totals, and row multiplicities all identical to the
    // clean run — exactly-once admission effect.
    val clean = streamed(3).map(a => (a.doc_id, a.source, a.toks, a.cum_tokens))
    val replayed = streamed(3, replayBatch = Some(1))
      .map(a => (a.doc_id, a.source, a.toks, a.cum_tokens))
    assert(replayed.sorted === clean.sorted)
    assert(replayed.size === replayed.toSet.size, "a row was emitted twice")
    assert(clean.toSet === batchRows)
  }

  test("greedy invariant holds per source: within one doc of quota") {
    val bySource = streamed(3).groupBy(_.source)
    val totals = graft.table(spark, sfDir, "documents")
      .selectExpr("source",
        "CAST(size(split(trim(text), '\\\\s+')) AS LONG) AS t")
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    bySource.foreach { case (src, rows) =>
      val mass = rows.map(_.toks).sum
      assert(mass >= Budget || mass == totals(src),
        s"$src under-admitted: $mass of ${totals(src)}")
      // running total before each admitted doc was under budget
      rows.sortBy(_.cum_tokens).foreach { a =>
        assert(a.cum_tokens - a.toks < Budget)
      }
    }
  }
}
