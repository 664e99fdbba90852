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
