package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** `IncrementalGiniStump` — online retraining of the Gini stump.
  * Contract: after every micro-batch the emitted top-3 (tagged with
  * the accumulated count) equals the shared sweep over the
  * accumulated prefix; after the final batch it equals the
  * oracle-backed batch q_tree_stump row-for-row. */
class IncrementalGiniStumpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def allObs: Seq[IncrementalGiniStump.FObs] =
    IncrementalGiniStump
      .fromDocuments(graft.table(spark, sfDir, "documents"))
      .collect().toSeq

  private def cellsOf(prefix: Seq[IncrementalGiniStump.FObs])
      : Seq[IncrementalGiniStump.FCell] =
    (prefix.groupBy(o => ("n_chars", o.bChars, o.lang)) ++
      prefix.groupBy(o => ("n_tokens", o.bTokens, o.lang))).toSeq
      .map { case ((f, b, l), os) =>
        IncrementalGiniStump.FCell(f, b, l, os.size.toLong) }

  private def run(nBatches: Int): Seq[IncrementalGiniStump.SplitRow] = {
    val obs = allObs
    val ms = MemoryStream[IncrementalGiniStump.FObs](spark)
    val name = s"ginistump_${System.nanoTime()}"
    val q = IncrementalGiniStump.train(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      obs.grouped(math.max(1, obs.length / nBatches + 1))
        .foreach { chunk => ms.addData(chunk.toSeq); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[IncrementalGiniStump.SplitRow].collect().toSeq
  }

  test("after every micro-batch the top-3 equals the sweep over the " +
      "accumulated prefix; the final one equals q_tree_stump") {
    val obs = allObs
    val nBatches = 4
    val rows = run(nBatches)
    val chunks = obs.grouped(math.max(1, obs.length / nBatches + 1)).toSeq
    chunks.indices.foreach { i =>
      val prefix = chunks.take(i + 1).flatten
      val tagged = rows.filter(_.n_total == prefix.size).sortBy(_.rn)
      assert(tagged == IncrementalGiniStump.sweep(cellsOf(prefix)),
        s"prefix ${i + 1}/${chunks.size} drifted")
    }
    // final == the oracle-backed batch query, row-for-row
    val batch = graft.SparkEntry.queries("q_tree_stump")(spark, sfDir)
      .selectExpr("feature", "threshold", "gini", "n_left", "n_right", "rn")
      .as[(String, Long, Double, Long, Long, Long)].collect().toSeq
      .map { case (f, t, g, nl, nr, rn) =>
        IncrementalGiniStump.SplitRow(f, t, g, nl, nr, rn, obs.size.toLong) }
    val fin = rows.filter(_.n_total == obs.size).sortBy(_.rn)
    assert(fin == batch, "final stream model != q_tree_stump")
  }

  test("single-batch and many-batch chunkings agree on the final model") {
    val n = allObs.size
    assert(run(1).filter(_.n_total == n).sortBy(_.rn) ==
      run(7).filter(_.n_total == n).sortBy(_.rn))
  }

  test("the state funnel is fed pre-reduced cells, not raw observations") {
    // 800 raw rows over 4 partitions, 2 langs × 3 char-buckets × 2
    // token-buckets: the map-side fold must emit at most
    // partitions × |distinct cells| rows (each doc lands in BOTH
    // feature histograms) whose counts conserve the doubled mass
    val raw = (1 to 800).map(i => IncrementalGiniStump.FObs(
      s"l${i % 2}", (i % 3).toLong, (i % 2).toLong))
    val cells = IncrementalGiniStump.cellsOf(
      spark.createDataset(raw).repartition(4)).collect()
    // distinct cells: 2·3 (n_chars) + 2·2 (n_tokens) = 10
    assert(cells.length <= 4 * 10,
      s"pre-reduction leaked ${cells.length} rows into the funnel")
    assert(cells.map(_.c).sum == 1600L,
      "each observation must land once per feature histogram")
    val hist = cells.groupBy(c => (c.feature, c.b, c.lang))
      .view.mapValues(_.map(_.c).sum).toMap
    val expect =
      raw.groupBy(o => ("n_chars", o.bChars, o.lang))
        .view.mapValues(_.size.toLong).toMap ++
      raw.groupBy(o => ("n_tokens", o.bTokens, o.lang))
        .view.mapValues(_.size.toLong).toMap
    assert(hist == expect)
  }
}
