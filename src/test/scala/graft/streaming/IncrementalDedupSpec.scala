package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val metricsPath =
    Files.createTempDirectory("dedup-metrics").resolve("metrics.jsonl").toString
  private lazy val listener = Metrics.install(spark, metricsPath)

  private def metricsCheck(): Unit = {
    // listener events are async; wait briefly for the progress lines
    val deadline = System.currentTimeMillis() + 10000
    var lines = Seq.empty[String]
    while (System.currentTimeMillis() < deadline &&
      !lines.exists(_.contains("\"event\":\"progress\""))) {
      Thread.sleep(200)
      val p = java.nio.file.Paths.get(metricsPath)
      lines = if (java.nio.file.Files.exists(p))
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(p)).asScala.toSeq
      else Seq.empty
    }
    assert(lines.exists(_.contains("\"event\":\"started\"")), lines.take(3))
    assert(lines.exists(l => l.contains("\"event\":\"progress\"")
      && l.contains("numInputRows")), "no progress metrics recorded")
    spark.streams.removeListener(listener)
  }

  private val baseText =
    "the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew quartz potions under a pale winter moon beside the river"

  test("in-batch and cross-batch near-dups are both found; unrelated docs are not") {
    val indexDir = Files.createTempDirectory("dedup-idx").toString
    val dupDir = Files.createTempDirectory("dedup-out").toString
    val ckpt = Files.createTempDirectory("dedup-ckpt").toString

    listener // install the metrics listener before the stream starts
    val ms = MemoryStream[(Long, String)](spark)
    // threshold 0.7: a single interior word change in a 22-word doc
    // yields Jaccard ≈ 0.74 (3 of 20 shingles replaced)
    val q = IncrementalDedup.start(
      ms.toDF().toDF("doc_id", "text"), indexDir, dupDir, ckpt,
      IncrementalDedup.Config(threshold = 0.7))
    try {
      // batch 1: doc 1, its in-batch near-dup 2, unrelated 3
      ms.addData(Seq(
        (1L, baseText),
        (2L, baseText.replace("winter", "summer")),
        (3L, "completely different words entirely nothing shared here at all " +
          "just random other tokens filling space without any overlap truly")))
      q.processAllAvailable()
      // batch 2: cross-batch near-dup of doc 1, plus another unrelated
      ms.addData(Seq(
        (10L, baseText.replace("quick", "slow")),
        (11L, "yet another totally unrelated document about completely other " +
          "topics with zero shingle overlap against anything previously seen")))
      q.processAllAvailable()
    } finally q.stop()

    val pairs = spark.read.parquet(dupDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    metricsCheck()
    assert(pairs.contains((1L, 2L)), s"in-batch dup missing: $pairs")
    assert(pairs.contains((1L, 10L)), s"cross-batch dup missing: $pairs")
    // (2,10) differ in two words (Jaccard ≈ 0.54) — correctly below
    assert(!pairs.contains((2L, 10L)), s"under-threshold pair leaked: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 11L || p._2 == 11L),
      s"false positive: $pairs")

    // the persisted band index is laid out by bucket prefix, so history
    // lookups are partition-pruned (Spark skips non-matching bp= dirs)
    val bandDirs = new java.io.File(s"$indexDir/bands").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(bandDirs.nonEmpty && bandDirs.forall(_.startsWith("bp=")),
      s"bands not prefix-partitioned: $bandDirs")
    val idx = new IncrementalDedup.DedupIndex(spark, indexDir)
    val somePrefix = bandDirs.head.stripPrefix("bp=").toInt
    val pruned = idx.bandsForPrefixes(Seq(somePrefix)).get
    assert(pruned.count() > 0)
    assert(pruned.select("bp").distinct().collect().map(_.getInt(0)).toSeq
      == Seq(somePrefix))

    // the on-disk prefix count wins on reopen: a caller asking for a
    // different layout would prune the wrong bp= partitions otherwise
    val reopened = new IncrementalDedup.DedupIndex(spark, indexDir,
      requestedPrefixes = 7)
    assert(reopened.prefixes == idx.prefixes,
      s"reopen must adopt the persisted prefix count, got ${reopened.prefixes}")
  }
}
