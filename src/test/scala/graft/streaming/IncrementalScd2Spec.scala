package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed closed-version multiset must equal batch q_scd2's
  * non-null-valid_to rows exactly — including successions straddling
  * micro-batch boundaries (the open version hands off through the
  * state store and closes in a later batch, emitted exactly once). */
class IncrementalScd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def streamed(nBatches: Int): Seq[IncrementalScd2.ClosedVersion] = {
    val evs = IncrementalScd2
      .fromEvents(graft.table(spark, sfDir, "events"))
      .collect().sortBy(e => (e.seq, e.sub))
    val ms = MemoryStream[IncrementalScd2.SEv](spark)
    val name = s"scd2_${System.nanoTime()}"
    val q = IncrementalScd2.closedVersions(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[IncrementalScd2.ClosedVersion].collect().toSeq
  }

  private lazy val batchRows: Seq[(Long, Long, Option[Long], String, Double)] =
    graft.SparkEntry.queries("q_scd2")(spark, sfDir)
      .selectExpr("user_id", "unix_micros(cast(valid_from as timestamp))",
        "unix_micros(cast(valid_to as timestamp))", "event_type", "value")
      .as[(Long, Long, Option[Long], String, Double)].collect().toSeq

  private def closedBatch = batchRows.collect {
    case (uid, from, Some(to), et, v) => (uid, from, to, et, v)
  }.groupBy(identity).view.mapValues(_.size).toMap

  private def asMultiset(xs: Seq[IncrementalScd2.ClosedVersion]) =
    xs.map(c => (c.user_id, c.valid_from_us, c.valid_to_us, c.event_type,
      c.value)).groupBy(identity).view.mapValues(_.size).toMap

  test("streamed closed versions == batch q_scd2 closed rows, 4 batches") {
    val got = streamed(nBatches = 4)
    assert(asMultiset(got) === closedBatch)
    // exactly one open version per key remains unemitted
    val users = batchRows.map(_._1).distinct.size
    assert(got.size === batchRows.size - users)
    // intervals are well-formed: valid_to never precedes valid_from
    // (equality possible only for same-microsecond successions)
    assert(got.forall(c => c.valid_from_us <= c.valid_to_us))
  }

  test("single batch also matches (no boundary hand-off)") {
    assert(asMultiset(streamed(nBatches = 1)) === closedBatch)
  }
}
