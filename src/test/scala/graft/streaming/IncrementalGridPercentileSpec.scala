package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** `IncrementalGridPercentile` — the streaming leg of the percentile
  * triad (batch q_grid_percentile / view-read cdc.GridPercentile /
  * this). Contract: after every micro-batch, each group's emitted rows
  * (tagged with that group's accumulated count) equal the shared
  * integer sweep over the accumulated prefix; after the final batch
  * they equal the oracle-backed batch query exactly. */
class IncrementalGridPercentileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def allObs: Seq[IncrementalGridPercentile.BObs] =
    IncrementalGridPercentile
      .fromDocuments(graft.table(spark, sfDir, "documents"))
      .collect().toSeq

  private def expected(prefix: Seq[IncrementalGridPercentile.BObs])
      : Set[IncrementalGridPercentile.PctRow] =
    prefix.groupBy(_.group).flatMap { case (g, os) =>
      IncrementalGridPercentile.sweep(g,
        os.groupBy(_.bucket).view.mapValues(_.size.toLong).toMap,
        Seq(50L, 90L, 99L), 16L)
    }.toSet

  private def run(nBatches: Int): Seq[IncrementalGridPercentile.PctRow] = {
    val obs = allObs
    val ms = MemoryStream[IncrementalGridPercentile.BObs](spark)
    val name = s"gridpct_${System.nanoTime()}"
    val q = IncrementalGridPercentile.percentiles(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      obs.grouped(math.max(1, obs.length / nBatches + 1))
        .foreach { chunk => ms.addData(chunk.toSeq); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[IncrementalGridPercentile.PctRow].collect().toSeq
  }

  test("per-batch snapshots equal the sweep over each group's " +
      "accumulated prefix; the final snapshot equals q_grid_percentile") {
    val obs = allObs
    val nBatches = 4
    val rows = run(nBatches)
    val chunks = obs.grouped(math.max(1, obs.length / nBatches + 1)).toSeq
    chunks.indices.foreach { i =>
      val prefix = chunks.take(i + 1).flatten
      // tag by each GROUP's accumulated count (groups shard
      // independently, so a group absent from a batch emits nothing)
      // a group's rows for this prefix are the ones tagged with its
      // accumulated count (a group untouched by later batches keeps —
      // correctly — its earlier emission as the current snapshot)
      val perGroupN = prefix.groupBy(_.group).view.mapValues(_.size.toLong)
      val got = rows.filter(r => perGroupN.get(r.group).contains(r.n)).toSet
      assert(got == expected(prefix),
        s"prefix ${i + 1}/${chunks.size} drifted")
    }
    // final == the oracle-backed batch query (edge scaled by width 16)
    val batch = graft.SparkEntry.queries("q_grid_percentile")(spark, sfDir)
      .selectExpr("source", "p", "edge", "n")
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, p, e, n) =>
        IncrementalGridPercentile.PctRow(g, p, e, n) }.toSet
    val perGroupN = obs.groupBy(_.group).view.mapValues(_.size.toLong)
    val fin = rows.filter(r => perGroupN.get(r.group).contains(r.n)).toSet
    assert(fin == batch, "final stream snapshot != q_grid_percentile")
  }

  test("single-batch and many-batch chunkings agree on the final rows") {
    val obs = allObs
    val perGroupN = obs.groupBy(_.group).view.mapValues(_.size.toLong)
    def fin(rows: Seq[IncrementalGridPercentile.PctRow]) =
      rows.filter(r => perGroupN.get(r.group).contains(r.n)).toSet
    assert(fin(run(1)) == fin(run(7)))
  }

  test("a percentile outside [1, 100] is rejected at the boundary, " +
      "not as a grid(-1) crash inside a running stream") {
    val counts = Map(1L -> 3L, 2L -> 5L)
    intercept[IllegalArgumentException] {
      IncrementalGridPercentile.sweep("g", counts, Seq(101L), 16L)
    }
    intercept[IllegalArgumentException] {
      IncrementalGridPercentile.sweep("g", counts, Seq(0L), 16L)
    }
    // the boundary itself stays valid: p = 100 reads the last bucket
    assert(IncrementalGridPercentile.sweep("g", counts, Seq(100L), 16L)
      .head.edge == 32L)
  }
}
