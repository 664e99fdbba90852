package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** `IncrementalTvdDrift` — the streaming twin of q_drift_tvd, third
  * member of the monitor family over the SHARED histogram fold.
  * Equality contract: after EVERY micro-batch the emitted per-source
  * TVD rows equal the integer sweep over the accumulated prefix; after
  * the final batch they equal the oracle-backed batch query itself
  * (the arithmetic is pure-integer, so equality is exact, not
  * tolerance-based). Planted-corpus pins: disjoint supports → exactly
  * 10⁶, identical distributions → exactly 0. */
class IncrementalTvdDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def allObs: Seq[IncrementalKsDrift.LenObs] =
    IncrementalTvdDrift
      .fromDocuments(graft.table(spark, sfDir, "documents"))
      .collect().toSeq

  private def cellsOf(obs: Seq[IncrementalKsDrift.LenObs])
      : Seq[IncrementalKsDrift.Cell] =
    obs.groupBy(o => (o.source, o.len)).toSeq
      .map { case ((s, l), os) => IncrementalKsDrift.Cell(s, l, os.size.toLong) }

  private def prefixExpected(prefix: Seq[IncrementalKsDrift.LenObs])
      : Map[String, (Long, Long)] =
    IncrementalTvdDrift.tvdOf(cellsOf(prefix))
      .map(r => r.source -> ((r.tvd_fp, r.n))).toMap

  private def run(nBatches: Int, replayBatch: Option[Int] = None)
      : Seq[IncrementalTvdDrift.TvdRow] = {
    val obs = allObs
    val ms = MemoryStream[IncrementalKsDrift.LenObs](spark)
    val name = s"tvddrift_${System.nanoTime()}"
    val q = IncrementalTvdDrift.drift(ms.toDS())
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
    spark.table(name).as[IncrementalTvdDrift.TvdRow].collect().toSeq
  }

  test("disjoint supports score exactly 1e6; identical distributions " +
      "score exactly 0 — the integer endpoints") {
    import IncrementalKsDrift.Cell
    val disjoint = IncrementalTvdDrift.tvdOf(Seq(
      Cell("a", 1L, 4L), Cell("a", 2L, 6L),
      Cell("b", 50L, 3L), Cell("b", 51L, 7L)))
    assert(disjoint.map(r => r.source -> r.tvd_fp).toMap ==
      Map("a" -> 1000000L, "b" -> 1000000L))
    val same = IncrementalTvdDrift.tvdOf(Seq(
      Cell("a", 1L, 2L), Cell("a", 2L, 6L),
      Cell("b", 1L, 3L), Cell("b", 2L, 9L))) // both 1:3 mixes
    assert(same.map(r => r.source -> r.tvd_fp).toMap ==
      Map("a" -> 0L, "b" -> 0L))
    // single-source corpus: no complement, no rows (the family guard)
    assert(IncrementalTvdDrift.tvdOf(Seq(Cell("only", 5L, 3L))).isEmpty)
  }

  test("after every micro-batch the snapshot equals the integer sweep " +
      "over the accumulated prefix; the final one equals q_drift_tvd") {
    val obs = allObs
    val nBatches = 4
    val rows = run(nBatches)
    val chunks = obs.grouped(math.max(1, obs.length / nBatches + 1)).toSeq
    chunks.indices.foreach { i =>
      val prefix = chunks.take(i + 1).flatten
      val tagged = rows.filter(_.n_total == prefix.size)
        .map(r => r.source -> ((r.tvd_fp, r.n))).toMap
      assert(tagged == prefixExpected(prefix),
        s"prefix ${i + 1}/${chunks.size} drifted")
    }
    // final snapshot == the oracle-backed batch query EXACTLY — the
    // arithmetic is integer end to end, there is nothing to round
    val batch = graft.SparkEntry.queries("q_drift_tvd")(spark, sfDir)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._3, t._2))).toMap
    val fin = rows.filter(_.n_total == obs.size)
      .map(r => r.source -> ((r.tvd_fp, r.n))).toMap
    assert(fin == batch, "final stream snapshot != q_drift_tvd")
  }

  test("single-batch and many-batch chunkings agree on the final snapshot") {
    val n = allObs.size
    val one = run(1).filter(_.n_total == n).map(r => r.source -> r.tvd_fp).toMap
    val many = run(7).filter(_.n_total == n).map(r => r.source -> r.tvd_fp).toMap
    assert(one == many)
  }

  test("TTL eviction shares the KS fold: an idle source leaves the " +
      "cross-source marginals and a reappearing one restarts cold") {
    import IncrementalKsDrift.LenObs
    val a = (1 to 6).map(i => LenObs("a", (i % 3 + 10).toLong))
    val b = (1 to 5).map(i => LenObs("b", (i % 2 + 20).toLong))
    val x = (1 to 6).map(i => LenObs("x", (i % 2 + 50).toLong))
    val ms = MemoryStream[LenObs](spark)
    val name = s"tvd_evict_${System.nanoTime()}"
    val q = IncrementalTvdDrift.drift(ms.toDS(), evictAfterBatches = Some(1L))
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
    val rows = spark.table(name).as[IncrementalTvdDrift.TvdRow]
      .collect().toSeq
    def expect(obs: Seq[LenObs]): Map[String, (Long, Long)] =
      IncrementalTvdDrift.tvdOf(cellsOf(obs))
        .map(r => r.source -> ((r.tvd_fp, r.n))).toMap
    val at10 = rows.filter(_.n_total == 10L)
      .map(r => r.source -> ((r.tvd_fp, r.n))).toMap
    assert(at10 == expect(a ++ b.take(4)) && !at10.contains("x"),
      s"evicted source must leave the marginals: $at10")
    val at13 = rows.filter(_.n_total == 13L)
      .map(r => r.source -> ((r.tvd_fp, r.n))).toMap
    assert(at13 == expect(a ++ b ++ x.take(2)),
      s"reappearing source must be cold: $at13")
  }

  test("a replayed micro-batch distorts the statistic boundedly") {
    val obs = allObs
    val chunkSize = math.max(1, obs.length / 3 + 1)
    val clean = run(3).filter(_.n_total == obs.size)
      .map(r => r.source -> r.tvd_fp).toMap
    val replayed = run(3, replayBatch = Some(1))
    val maxTag = replayed.map(_.n_total).max
    assert(maxTag == obs.size + math.min(chunkSize, obs.size - chunkSize))
    val fin = replayed.filter(_.n_total == maxTag)
      .map(r => r.source -> r.tvd_fp).toMap
    // TVD is bounded in [0, 1]: duplicating a batch of b docs among n
    // moves each distribution by at most 2·b/n in L1, so the statistic
    // moves by at most 2e6·(b/n) per side plus integer truncation
    val bound = 4L * 1000000L * chunkSize / obs.size + 2L
    fin.foreach { case (src, x) =>
      assert(math.abs(x - clean(src)) <= bound,
        s"$src: replay distortion ${math.abs(x - clean(src))} > $bound")
    }
  }
}
