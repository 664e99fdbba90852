package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** `IncrementalKsDrift` — the streaming twin of q_ks_drift. The
  * equality contract: after EVERY micro-batch, the emitted per-source
  * KS rows (tagged with the accumulated doc count) equal the batch
  * computation over exactly the accumulated prefix; after the final
  * batch they equal the q_ks_drift query itself. Plus the documented
  * bounded-distortion stance under an at-least-once replay. */
class IncrementalKsDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def allObs: Seq[IncrementalKsDrift.LenObs] =
    IncrementalKsDrift.fromDocuments(graft.table(spark, sfDir, "documents"))
      .collect().toSeq

  /** Batch-semantics KS over a prefix, through the SHARED ksOf sweep
    * (histogram from the raw observations — the same reduction the
    * batch query's one corpus-sized agg performs). */
  private def prefixExpected(prefix: Seq[IncrementalKsDrift.LenObs])
      : Map[String, Double] =
    IncrementalKsDrift.ksOf(
      prefix.groupBy(o => (o.source, o.len)).toSeq.map { case ((s, l), os) =>
        IncrementalKsDrift.Cell(s, l, os.size.toLong)
      }).toMap

  private def run(nBatches: Int, replayBatch: Option[Int] = None)
      : Seq[IncrementalKsDrift.KsRow] = {
    val obs = allObs
    val ms = MemoryStream[IncrementalKsDrift.LenObs](spark)
    val name = s"ksdrift_${System.nanoTime()}"
    val q = IncrementalKsDrift.drift(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      obs.grouped(math.max(1, obs.length / nBatches + 1)).zipWithIndex
        .foreach { case (chunk, i) =>
          val times = if (replayBatch.contains(i)) 2 else 1
          (1 to times).foreach { _ =>
            ms.addData(chunk.toSeq)
            q.processAllAvailable()
          }
        }
    } finally q.stop()
    spark.table(name).as[IncrementalKsDrift.KsRow].collect().toSeq
  }

  test("after every micro-batch the emitted snapshot equals the batch " +
      "KS over the accumulated prefix; the final one equals q_ks_drift") {
    val obs = allObs
    val nBatches = 4
    val rows = run(nBatches)
    // reconstruct each prefix the stream saw and compare its tagged rows
    val chunks = obs.grouped(math.max(1, obs.length / nBatches + 1)).toSeq
    chunks.indices.foreach { i =>
      val prefix = chunks.take(i + 1).flatten
      val tagged = rows.filter(_.n_total == prefix.size)
        .map(r => r.source -> r.ks).toMap
      assert(tagged == prefixExpected(prefix),
        s"prefix ${i + 1}/${chunks.size} drifted")
    }
    // final snapshot == the oracle-backed batch query
    val batch = graft.SparkEntry.queries("q_ks_drift")(spark, sfDir)
      .as[(String, Double)].collect().toMap
    val fin = rows.filter(_.n_total == obs.size)
      .map(r => r.source -> r.ks).toMap
    assert(fin == batch, s"final stream snapshot != q_ks_drift")
  }

  test("single-batch and many-batch chunkings agree on the final snapshot") {
    val n = allObs.size
    val one = run(1).filter(_.n_total == n).map(r => r.source -> r.ks).toMap
    val many = run(7).filter(_.n_total == n).map(r => r.source -> r.ks).toMap
    assert(one == many)
  }

  test("the state funnel is fed pre-reduced cells: O(partitions × " +
      "sources × grid) rows, never the raw observation stream") {
    // 4 partitions × 3 sources × 2 distinct lengths, 999 raw rows:
    // the pre-reduction must hand the singleton group at most
    // partitions × |distinct (source, len)| cells whose counts sum to
    // the raw row count — the shape claim the scale docstring makes
    val raw = (1 to 999).map(i =>
      IncrementalKsDrift.LenObs(s"src${i % 3}", (i % 2 + 10).toLong))
    val ds = spark.createDataset(raw).repartition(4)
    val cells = IncrementalKsDrift.cellsOf(ds).collect()
    assert(cells.length <= 4 * 6,
      s"pre-reduction leaked ${cells.length} rows into the funnel")
    assert(cells.map(_.c).sum == 999L, "pre-reduced counts must conserve mass")
    // and the reduced cells regroup to the exact histogram
    val hist = cells.groupBy(c => (c.source, c.len))
      .view.mapValues(_.map(_.c).sum).toMap
    val expect = raw.groupBy(o => (o.source, o.len))
      .view.mapValues(_.size.toLong).toMap
    assert(hist == expect)
  }

  test("opt-in TTL eviction drops an idle source from the histogram " +
      "(snapshots equal a batch over retained sources) and a " +
      "reappearing source restarts cold") {
    import IncrementalKsDrift.{Cell, LenObs}
    val a = (1 to 8).map(i => LenObs("a", (i % 4 + 10).toLong))
    val x = (1 to 6).map(i => LenObs("x", (i % 3 + 50).toLong))
    val ms = MemoryStream[LenObs](spark)
    val name = s"ksdrift_evict_${System.nanoTime()}"
    val q = IncrementalKsDrift.drift(ms.toDS(), evictAfterBatches = Some(1L))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def step(obs: Seq[LenObs]): Unit = {
      ms.addData(obs); q.processAllAvailable()
    }
    try {
      step(a.take(4) ++ x)       // batch 0: a + x (n_total 10)
      step(a.slice(4, 6))        // batch 1: a only (x idle 1 ≤ ttl; 12)
      step(a.slice(6, 8))        // batch 2: a only (x idle 2 > ttl → evicted; 8)
      step(x.take(3))            // batch 3: x reappears — cold (11)
    } finally q.stop()
    val rows = spark.table(name).as[IncrementalKsDrift.KsRow].collect().toSeq
    def cellsOf(obs: Seq[LenObs]): Seq[Cell] =
      obs.groupBy(o => (o.source, o.len)).toSeq
        .map { case ((s, l), os) => Cell(s, l, os.size.toLong) }
    // batch 1 snapshot (n_total = 12): x still retained
    val at12 = rows.filter(_.n_total == 12L).map(r => r.source -> r.ks).toMap
    assert(at12 == IncrementalKsDrift.ksOf(
      cellsOf(a.take(6) ++ x)).toMap, "pre-eviction snapshot drifted")
    // batch 2 snapshot: x's mass has LEFT the corpus CDF — the emitted
    // rows equal a batch computation over source a's 8 docs alone
    val at8 = rows.filter(_.n_total == 8L).map(r => r.source -> r.ks).toMap
    assert(at8 == IncrementalKsDrift.ksOf(cellsOf(a)).toMap,
      s"eviction must remove the idle source's mass: $at8")
    assert(!at8.contains("x"))
    // batch 3: x restarts COLD — 8 retained a-docs + only the 3 new
    // x-docs (the 6 pre-eviction x-docs are forgotten)
    val at11 = rows.filter(_.n_total == 11L).map(r => r.source -> r.ks).toMap
    assert(at11 == IncrementalKsDrift.ksOf(
      cellsOf(a ++ x.take(3))).toMap, "reappearing source must be cold")
  }

  test("a replayed micro-batch distorts each source's KS by a bounded, " +
      "self-healing amount (the documented at-least-once stance)") {
    val obs = allObs
    val clean = run(3).groupBy(_.n_total)
    val replayed = run(3, replayBatch = Some(1))
    // the replayed run's FINAL state counts the duplicated batch twice:
    // n_total exceeds the corpus, and each per-source KS sits within
    // replaySize/n of the clean final value
    val chunkSize = math.max(1, obs.length / 3 + 1)
    val finalClean = clean(obs.size.toLong)
      .map(r => r.source -> r.ks).toMap
    val maxTag = replayed.map(_.n_total).max
    assert(maxTag == obs.size + math.min(chunkSize, obs.size - chunkSize),
      s"replay tag $maxTag")
    val finalReplayed = replayed.filter(_.n_total == maxTag)
      .map(r => r.source -> r.ks).toMap
    val bound = 2.0 * chunkSize.toDouble / obs.size + 1e-6
    finalReplayed.foreach { case (src, ks) =>
      assert(math.abs(ks - finalClean(src)) <= bound,
        s"$src: replay distortion ${math.abs(ks - finalClean(src))} > $bound")
    }
  }
}
