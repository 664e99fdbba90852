package graft.streaming

import graft.TestSpark
import graft.operators.DedupOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The incremental SRP index must find exactly what one batch SRP pass
  * over the full corpus finds — in-batch and cross-batch pairs alike —
  * regardless of how the corpus is split into micro-batches. */
class IncrementalEmbedDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Deterministic planted corpus (mirrors SrpSpec): 150 base vectors
  // plus a cos≈0.99 near-duplicate of each of the first 40.
  private lazy val corpus: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    val base = Array.fill(150)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val dups = (0 until 40).map { i =>
      (150L + i, base(i).map(v => v + 0.12f * rnd.nextGaussian().toFloat))
    }
    base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++ dups
  }

  private def batchReference(threshold: Double): Set[(Long, Long, Double)] = {
    val e = corpus.toDF("vec_id", "embedding")
    val banded = DedupOps.srpBands(e)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("b.vec_id") > col("a.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .distinct()
    DedupOps.cosineVerify(cand, DedupOps.withNormSq(e), threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("stream over 3 micro-batches == one batch SRP pass over the full corpus") {
    val indexDir = Files.createTempDirectory("embdedup-idx").toString
    val dupDir = Files.createTempDirectory("embdedup-out").toString
    val ckpt = Files.createTempDirectory("embdedup-ckpt").toString

    val ms = MemoryStream[(Long, Array[Float])](spark)
    val q = IncrementalEmbedDedup.start(
      ms.toDF().toDF("vec_id", "embedding"), indexDir, dupDir, ckpt,
      IncrementalEmbedDedup.Config(threshold = 0.9))
    try {
      // split by id mod 3 so base/dup pairs land in-batch AND cross-batch
      (0 until 3).foreach { m =>
        ms.addData(corpus.filter(_._1 % 3 == m))
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(dupDir)
      .select("v1", "v2", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = batchReference(0.9)

    assert(streamed == expected,
      s"stream vs batch: missing=${expected -- streamed} extra=${streamed -- expected}")
    // sanity: the planted pairs are actually what was found
    val plantedFound = streamed.map(p => (p._1, p._2))
      .count { case (a, b) => b == a + 150 }
    assert(plantedFound >= 38, s"only $plantedFound planted pairs found")

    // band index laid out by bucket prefix; reopen adopts the on-disk count
    val bandDirs = new java.io.File(s"$indexDir/bands").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(bandDirs.nonEmpty && bandDirs.forall(_.startsWith("bp=")),
      s"bands not prefix-partitioned: $bandDirs")
    val reopened = new IncrementalEmbedDedup.EmbedIndex(spark, indexDir,
      requestedPrefixes = 7)
    assert(reopened.prefixes == 64,
      s"reopen must adopt the persisted prefix count, got ${reopened.prefixes}")
  }
}
