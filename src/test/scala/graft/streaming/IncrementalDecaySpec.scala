package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed decayed score, re-anchored from each user's last event
  * to the corpus max ts, must equal batch q_decay_sum; and the emitted
  * row multiset must be EXACTLY invariant to the micro-batch split
  * (same per-key fold order → bit-identical doubles). */
class IncrementalDecaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def streamed(nBatches: Int): Seq[IncrementalDecay.Decayed] = {
    val evs = IncrementalDecay
      .fromEvents(graft.table(spark, sfDir, "events"))
      .collect().sortBy(e => (e.seq, e.sub))
    val ms = MemoryStream[IncrementalDecay.DEv](spark)
    val name = s"decay_${System.nanoTime()}"
    val q = IncrementalDecay.scores(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[IncrementalDecay.Decayed].collect().toSeq
  }

  test("re-anchored last score == batch q_decay_sum; split-invariant") {
    val four = streamed(nBatches = 4)
    val one = streamed(nBatches = 1)
    assert(four.toSet == one.toSet,
      "fold must be exactly invariant to the micro-batch split")

    val evs = IncrementalDecay
      .fromEvents(graft.table(spark, sfDir, "events")).collect()
    val maxSeq = evs.map(_.seq).max
    // truncate to SECONDS before re-anchoring: the batch query (and its
    // DuckDB oracle) measure gaps with unix_seconds/date_diff('second')
    val lastPerUser = four.groupBy(_.user_id).view.mapValues(
      _.maxBy(d => (d.seq, d.sub))).toMap
    val reanchored = lastPerUser.map { case (u, d) =>
      u -> d.score * math.pow(0.5,
        (maxSeq / 1000000 - d.seq / 1000000).toDouble / (30.0 * 86400))
    }
    val batch = graft.SparkEntry.queries("q_decay_sum")(spark, sfDir)
      .select("user_id", "decayed_value").as[(Long, Double)]
      .collect().toMap
    assert(batch.keySet == reanchored.keySet)
    // tolerance: the batch side truncates every gap to whole seconds
    // (unix_seconds), the stream folds at µs — up to ~2.7e-7 relative
    // per event on a 30-day half-life, plus the oracle's 4dp rounding
    batch.foreach { case (u, expect) =>
      assert(math.abs(reanchored(u) - expect) < 2e-3,
        s"user $u: re-anchored ${reanchored(u)} vs batch $expect")
    }
  }
}
