package graft.streaming

import graft.{SparkEntry, TestSpark}
import graft.operators.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The incremental media-fingerprint index must find exactly what the
  * batch queries find — in-batch and cross-batch pairs alike —
  * regardless of micro-batch split, and takedowns must behave as
  * reduced-corpus (the compliance contract shared with the text and
  * embedding indexes). The corpus is the REAL audio fingerprint set
  * of sf0.001: WAVs synthesized and decoded through the genuine
  * javax.sound path, the same rows q_dedup_audio banded in batch. */
class IncrementalMediaDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"
  private val S = Multimodal.AudioDupSynth

  private lazy val corpus: Seq[(Long, Long)] =
    graft.table(spark, sfDir, "documents").select("doc_id").as[Long]
      .collect().filter(_ % 3 == 1).sorted.toSeq
      .map(id => id -> S.fingerprint(S.decodeEnergies(S.wav(id), id)))

  private lazy val batchReference: Set[(Long, Long, Long)] =
    SparkEntry.queries("q_dedup_audio")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet

  private def runStream(splits: Int): Set[(Long, Long, Long)] = {
    val indexDir = Files.createTempDirectory("mediadedup-idx").toString
    val dupDir = Files.createTempDirectory("mediadedup-out").toString
    val ckpt = Files.createTempDirectory("mediadedup-ckpt").toString
    val ms = MemoryStream[(Long, Long)](spark)
    val q = IncrementalMediaDedup.start(
      ms.toDF().toDF("media_id", "h"), indexDir, dupDir, ckpt)
    try {
      (0 until splits).foreach { m =>
        // audio ids are all ≡ 1 mod 3, so split on the VARIANT index
        // (id/3): every dup group of four scatters across batches and
        // cross-batch recall is actually exercised
        ms.addData(corpus.filter(t => (t._1 / 3) % splits == m))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.read.parquet(dupDir).as[(Long, Long, Long)].collect().toSet
  }

  test("stream over 3 micro-batches == the batch banded query") {
    assert(batchReference.nonEmpty)
    assert(runStream(3) == batchReference)
  }

  test("micro-batch split invariance: 1 batch == 4 batches") {
    assert(runStream(1) == runStream(4))
  }

  test("an empty micro-batch is a no-op: no footer-less dirs, history " +
      "intact for the next batch") {
    val indexDir = Files.createTempDirectory("mediadedup-empty").toString
    val index = new IncrementalMediaDedup.MediaIndex(spark, indexDir)
    val group = corpus.groupBy(_._1 / 12).values.find(_.size == 4).get
      .sortBy(_._1)
    IncrementalMediaDedup.processBatch(
      group.take(1).toDF("media_id", "h"), index).unpersist()
    val empty = IncrementalMediaDedup.processBatch(
      Seq.empty[(Long, Long)].toDF("media_id", "h"), index)
    assert(empty.count() == 0)
    // the v3 scaled copy must still find its historic base (hamming 0)
    val p = IncrementalMediaDedup.processBatch(
      group.takeRight(1).toDF("media_id", "h"), index)
    val got = p.as[(Long, Long, Long)].collect().toSet
    p.unpersist()
    assert(got.contains((group.head._1, group.last._1, 0L)), got)
  }

  test("takedown: a tombstoned item vanishes from candidates AND " +
      "verification — reduced-corpus equality for later batches") {
    val indexDir = Files.createTempDirectory("mediadedup-td").toString
    val index = new IncrementalMediaDedup.MediaIndex(spark, indexDir)
    // a complete group of four: base, small bump, big bump, scaled
    val group = corpus.groupBy(_._1 / 12).values.find(_.size == 4).get
      .sortBy(_._1)
    val (historic, late) = group.splitAt(3)
    val p1 = IncrementalMediaDedup.processBatch(
      historic.toDF("media_id", "h"), index)
    p1.unpersist()
    // take down the base item, then ingest the scaled copy: its only
    // hamming-0 partner is gone, so pairs must equal what a corpus
    // that never held the base would produce
    val doomed = historic.head._1
    index.delete(Seq(doomed), deleteId = 1L)
    val p2 = IncrementalMediaDedup.processBatch(
      late.toDF("media_id", "h"), index)
    val got = p2.as[(Long, Long, Long)].collect().toSet
    p2.unpersist()
    assert(!got.exists(p => p._1 == doomed || p._2 == doomed),
      s"tombstoned id $doomed resurfaced in $got")
    // reduced-corpus reference: the late item banded against the
    // REMAINING historic fingerprints only
    val remaining = historic.filterNot(_._1 == doomed) ++ late
    val ref = (for {
      a <- remaining; b <- remaining if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) if d <= 3
      if a._1 == late.head._1 || b._1 == late.head._1 // pairs of THIS batch
    } yield (a._1, b._1, d.toLong)).toSet
    assert(got == ref, s"got $got\nexpected $ref")
  }

  test("video fingerprints ride the same index: stream over 3 batches == " +
      "batch q_dedup_video (speed-up and brightness dups recalled " +
      "cross-batch)") {
    // the index is fingerprint-generic — the video leg reuses it with
    // the temporal dHash of really-decoded AVI frames, completing the
    // streaming side of the image/audio/video modality matrix
    val V = Multimodal.VideoDupSynth
    val videoCorpus = graft.table(spark, sfDir, "documents")
      .select("doc_id").as[Long]
      .collect().filter(_ % 3 == 2).sorted.toSeq
      .map(id => id -> V.fingerprint(V.decodeBrightness(V.avi(id), id)))
    val batchRef = SparkEntry.queries("q_dedup_video")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(batchRef.nonEmpty)
    val indexDir = Files.createTempDirectory("mediadedup-vid-idx").toString
    val dupDir = Files.createTempDirectory("mediadedup-vid-out").toString
    val ckpt = Files.createTempDirectory("mediadedup-vid-ckpt").toString
    val ms = MemoryStream[(Long, Long)](spark)
    val q = IncrementalMediaDedup.start(
      ms.toDF().toDF("media_id", "h"), indexDir, dupDir, ckpt)
    try {
      (0 until 3).foreach { m =>
        // split on the variant index so every group of four scatters
        ms.addData(videoCorpus.filter(t => (t._1 / 3) % 3 == m))
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.read.parquet(dupDir).as[(Long, Long, Long)]
      .collect().toSet
    assert(got == batchRef,
      s"extra=${(got -- batchRef).take(5)} missing=${(batchRef -- got).take(5)}")
  }
}
