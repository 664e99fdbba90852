package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** `IncrementalChiSqDrift` — the streaming twin of q_chisq_drift.
  * Equality contract: after EVERY micro-batch, the emitted per-source
  * chi-square rows (tagged with the accumulated doc count) equal the
  * shared sweep over the accumulated prefix; after the final batch
  * they equal the oracle-backed batch query itself (same fixed-point
  * floor reduction). Chunking-invariance and the bounded-replay
  * stance mirror IncrementalKsDriftSpec. */
class IncrementalChiSqDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def allObs: Seq[IncrementalKsDrift.LenObs] =
    IncrementalChiSqDrift
      .fromDocuments(graft.table(spark, sfDir, "documents"))
      .collect().toSeq

  private def prefixExpected(prefix: Seq[IncrementalKsDrift.LenObs])
      : Map[String, (Double, Long, Long)] =
    IncrementalChiSqDrift.chisqOf(
      prefix.groupBy(o => (o.source, o.len)).toSeq.map { case ((s, l), os) =>
        IncrementalKsDrift.Cell(s, l, os.size.toLong)
      }).map(r => r.source -> ((r.chisq, r.dof, r.n))).toMap

  private def run(nBatches: Int, replayBatch: Option[Int] = None)
      : Seq[IncrementalChiSqDrift.ChiRow] = {
    val obs = allObs
    val ms = MemoryStream[IncrementalKsDrift.LenObs](spark)
    val name = s"chisqdrift_${System.nanoTime()}"
    val q = IncrementalChiSqDrift.drift(ms.toDS())
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
    spark.table(name).as[IncrementalChiSqDrift.ChiRow].collect().toSeq
  }

  test("after every micro-batch the snapshot equals the sweep over the " +
      "accumulated prefix; the final one equals q_chisq_drift") {
    val obs = allObs
    val nBatches = 4
    val rows = run(nBatches)
    val chunks = obs.grouped(math.max(1, obs.length / nBatches + 1)).toSeq
    chunks.indices.foreach { i =>
      val prefix = chunks.take(i + 1).flatten
      val tagged = rows.filter(_.n_total == prefix.size)
        .map(r => r.source -> ((r.chisq, r.dof, r.n))).toMap
      assert(tagged == prefixExpected(prefix),
        s"prefix ${i + 1}/${chunks.size} drifted")
    }
    // final snapshot == the oracle-backed batch query, bit-for-bit —
    // the floor fixed-point makes the scala fold, the Spark plan, and
    // the DuckDB oracle one arithmetic
    val batch = graft.SparkEntry.queries("q_chisq_drift")(spark, sfDir)
      .as[(String, Double, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    val fin = rows.filter(_.n_total == obs.size)
      .map(r => r.source -> ((r.chisq, r.dof, r.n))).toMap
    assert(fin == batch, "final stream snapshot != q_chisq_drift")
  }

  test("a single-source corpus emits no rows (statistic undefined " +
      "against an empty complement — the n < ntot guard)") {
    assert(IncrementalChiSqDrift.chisqOf(Seq(
      IncrementalKsDrift.Cell("only", 5L, 3L),
      IncrementalKsDrift.Cell("only", 9L, 2L))).isEmpty)
  }

  test("single-batch and many-batch chunkings agree on the final snapshot") {
    val n = allObs.size
    val one = run(1).filter(_.n_total == n).map(r => r.source -> r.chisq).toMap
    val many = run(7).filter(_.n_total == n).map(r => r.source -> r.chisq).toMap
    assert(one == many)
  }

  test("TTL eviction shares the KS fold: an idle source leaves the " +
      "cross-source marginals and a reappearing one restarts cold") {
    import IncrementalKsDrift.{Cell, LenObs}
    // three sources; a and b stay ALIVE every batch (the statistic
    // needs ≥2 sources after the eviction — and an idle-but-wanted
    // source would itself evict, which is the contract, not a bug)
    val a = (1 to 6).map(i => LenObs("a", (i % 3 + 10).toLong))
    val b = (1 to 5).map(i => LenObs("b", (i % 2 + 20).toLong))
    val x = (1 to 6).map(i => LenObs("x", (i % 2 + 50).toLong))
    val ms = MemoryStream[LenObs](spark)
    val name = s"chisq_evict_${System.nanoTime()}"
    val q = IncrementalChiSqDrift.drift(ms.toDS(), evictAfterBatches = Some(1L))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def step(obs: Seq[LenObs]): Unit = { ms.addData(obs); q.processAllAvailable() }
    try {
      step(a.take(3) ++ b.take(2) ++ x.take(4)) // batch 0: all three (9)
      step(a.slice(3, 5) ++ b.slice(2, 3))      // batch 1: x idle 1 ≤ ttl (12)
      step(a.slice(5, 6) ++ b.slice(3, 4))      // batch 2: x idle 2 > ttl →
                                                //   evicted (14 − 4 = 10)
      step(b.slice(4, 5) ++ x.take(2))          // batch 3: x cold (13)
    } finally q.stop()
    val rows = spark.table(name).as[IncrementalChiSqDrift.ChiRow]
      .collect().toSeq
    def cellsOf(obs: Seq[LenObs]): Seq[Cell] =
      obs.groupBy(o => (o.source, o.len)).toSeq
        .map { case ((s, l), os) => Cell(s, l, os.size.toLong) }
    def expect(obs: Seq[LenObs]): Map[String, (Double, Long)] =
      IncrementalChiSqDrift.chisqOf(cellsOf(obs))
        .map(r => r.source -> ((r.chisq, r.n))).toMap
    // post-eviction snapshot: x's mass is out of the marginals
    val at10 = rows.filter(_.n_total == 10L)
      .map(r => r.source -> ((r.chisq, r.n))).toMap
    assert(at10 == expect(a ++ b.take(4)) && !at10.contains("x"),
      s"evicted source must leave the marginals: $at10")
    // batch-3 snapshot: a + all of b + ONLY the 2 cold x-docs (the 4
    // pre-eviction x-docs are forgotten)
    val at13 = rows.filter(_.n_total == 13L)
      .map(r => r.source -> ((r.chisq, r.n))).toMap
    assert(at13 == expect(a ++ b ++ x.take(2)),
      s"reappearing source must be cold: $at13")
  }

  test("a replayed micro-batch distorts the statistic boundedly") {
    val obs = allObs
    val chunkSize = math.max(1, obs.length / 3 + 1)
    val clean = run(3).filter(_.n_total == obs.size)
      .map(r => r.source -> r.chisq).toMap
    val replayed = run(3, replayBatch = Some(1))
    val maxTag = replayed.map(_.n_total).max
    assert(maxTag == obs.size + math.min(chunkSize, obs.size - chunkSize))
    val fin = replayed.filter(_.n_total == maxTag)
      .map(r => r.source -> r.chisq).toMap
    // chi-square scales with n, so the bound is RELATIVE: duplicating a
    // batch of b docs among n shifts each cell's O and E by O(b/n) —
    // the statistic moves by at most a constant multiple of (b/n)·χ²
    // plus the grid floor granularity
    val rel = 4.0 * chunkSize.toDouble / obs.size
    fin.foreach { case (src, x) =>
      val bound = rel * math.max(clean(src), 1.0) + 1e-3
      assert(math.abs(x - clean(src)) <= bound,
        s"$src: replay distortion ${math.abs(x - clean(src))} > $bound")
    }
  }
}
