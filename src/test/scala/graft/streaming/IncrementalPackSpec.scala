package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed pack assignment must equal batch q_pack_sequences
  * exactly when the stream arrives doc_id-ordered — including packs
  * that straddle micro-batch boundaries (the per-shard token-counter
  * hand-off) — and a redelivered micro-batch must neither re-charge
  * tokens nor re-emit rows (the high-water redelivery stance). */
class IncrementalPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val Capacity = 2048L

  private def streamed(nBatches: Int, replayBatch: Option[Int] = None)
      : Seq[IncrementalPack.PPack] = {
    val docs = IncrementalPack
      .fromDocuments(graft.table(spark, sfDir, "documents"))
      .collect().sortBy(_.doc_id) // the id-ordered feed contract
    val ms = MemoryStream[IncrementalPack.PDoc](spark)
    val name = s"pack_${System.nanoTime()}"
    val q = IncrementalPack.pack(ms.toDS(), Capacity)
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
    spark.table(name).as[IncrementalPack.PPack].collect().toSeq
  }

  private def batchRows: Set[(Long, Long, Long, Long)] =
    graft.SparkEntry.queries("q_pack_assignments")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("streamed packing == batch q_pack_assignments across 5 batches " +
      "(packs straddle batch boundaries)") {
    val got = streamed(5).map(p => (p.doc_id, p.shard, p.n_tokens, p.seq_no))
    assert(got.toSet === batchRows)
    assert(got.size === got.toSet.size, "no doc packed twice")
  }

  test("single batch also matches (whole fold in one group iterator)") {
    assert(streamed(1).map(p => (p.doc_id, p.shard, p.n_tokens, p.seq_no))
      .toSet === batchRows)
  }

  test("redelivered micro-batch neither re-charges tokens nor re-emits " +
      "rows (high-water exactly-once effect)") {
    val clean = streamed(3).map(p => (p.doc_id, p.shard, p.n_tokens, p.seq_no))
    val replayed = streamed(3, replayBatch = Some(1))
      .map(p => (p.doc_id, p.shard, p.n_tokens, p.seq_no))
    assert(replayed.sorted === clean.sorted)
    assert(replayed.size === replayed.toSet.size, "a row was emitted twice")
    assert(clean.toSet === batchRows)
  }

  test("the pack ledger rolls up from the streamed rows: per (shard, " +
      "seq_no) doc and token counts match the batch rollup") {
    val got = streamed(4).groupBy(p => (p.shard, p.seq_no))
      .view.mapValues(ps => (ps.size.toLong, ps.map(_.n_tokens).sum)).toMap
    val exp = batchRows.toSeq.groupBy(r => (r._2, r._4))
      .view.mapValues(rs => (rs.size.toLong, rs.map(_._3).sum)).toMap
    assert(got === exp)
  }
}
