package graft.streaming

import graft.TestSpark
import graft.operators.{IvfIndex, ProductQuant, SimilarityOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Stream-maintained TRUE-PQ index: codebooks are trained ONCE on the
  * bootstrap corpus and FROZEN (index metadata — the faiss contract);
  * every micro-batch encodes against them (batch-id-keyed overwrite —
  * replay-safe), so the maintained searchPq EQUALS the one-shot inline
  * ProductQuant pipeline over the same centroids AND the same books at
  * every quiescent point, in any batch split. Takedowns hide code rows
  * like float rows; consolidation copies the frozen books and
  * recomputes batch=0 codes over the tombstone-applied corpus. */
class IncrementalIvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val Modulus = 97
  private val (k, nprobe, refine) = (5, 4, 3)
  private val M = ProductQuant.M
  private val CbMod = ProductQuant.CbMod

  private def corpus = graft.table(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")
  private def queries = corpus.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def searchSet(idx: IvfIndex): Set[(Long, Long, Double, Long)] =
    idx.searchPq(queries, k, nprobe, refine)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet

  /** Inline expectation: bootstrap-slice centroids + bootstrap-trained
    * frozen books, corpus encoded against them. */
  private def inlineSearch(boot: org.apache.spark.sql.DataFrame,
      full: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Long)] = {
    val cents = boot.filter(col("vec_id") % Modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val books = ProductQuant.train(
      SimilarityOps.ivfAssignTo(boot, cents), cents, M, CbMod)
    val assigned = SimilarityOps.ivfAssignTo(full, cents)
    ProductQuant.adcSearch(
      ProductQuant.encode(assigned, cents, books, M), books, cents,
      full, queries, k, nprobe, refine)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
  }

  test("streamed ingestion == inline pipeline with frozen bootstrap " +
      "books at every split; a replayed batch changes nothing") {
    val boot = corpus.filter(col("vec_id") < 250)
    val inline = inlineSearch(boot, corpus)
    assert(inline.nonEmpty)

    Seq(2, 4).foreach { nBatches =>
      val dir = Files.createTempDirectory(s"ivfpq-stream$nBatches").toString
      IncrementalIvf.bootstrapPq(boot, dir, Modulus)
      val chunk = 250 / (nBatches - 1).max(1) + 1
      (0 until (nBatches - 1)).foreach { i =>
        IncrementalIvf.processBatch(
          corpus.filter(col("vec_id") >= 250 + i.toLong * chunk &&
            col("vec_id") < 250 + (i + 1).toLong * chunk),
          dir, i + 1L)
      }
      val idx = IncrementalIvf.index(spark, dir)
      assert(searchSet(idx) == inline, s"$nBatches-batch split drifted")
      // replay the last ingest batch — byte-identical result
      IncrementalIvf.processBatch(
        corpus.filter(col("vec_id") >= 250 + (nBatches - 2).toLong * chunk &&
          col("vec_id") < 250 + (nBatches - 1).toLong * chunk),
        dir, (nBatches - 1).toLong)
      assert(searchSet(idx) == inline, "replay drifted")
    }
  }

  test("takedowns hide PQ code rows; consolidation copies the frozen " +
      "books, drops tombstoned rows physically, search unchanged") {
    val boot = corpus.filter(col("vec_id") < 250)
    val dir = Files.createTempDirectory("ivfpq-del").toString
    IncrementalIvf.bootstrapPq(boot, dir, Modulus)
    IncrementalIvf.processBatch(corpus.filter(col("vec_id") >= 250), dir, 1L)
    val idx = IncrementalIvf.index(spark, dir)
    val before = searchSet(idx)
    val victim = before.head._2
    idx.delete(Seq(victim), deleteId = 1L)
    val after = searchSet(idx)
    assert(!after.exists(_._2 == victim), "tombstoned vector still served")
    // equality with the reduced-corpus inline pipeline over the SAME
    // centroids and the SAME frozen books (trained on the full
    // bootstrap — the takedown does not retrain metadata)
    val cents = boot.filter(col("vec_id") % Modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val books = ProductQuant.train(
      SimilarityOps.ivfAssignTo(boot, cents), cents, M, CbMod)
    val reducedCorpus = corpus.filter(col("vec_id") =!= victim)
    val reduced = ProductQuant.adcSearch(
      ProductQuant.encode(
        SimilarityOps.ivfAssignTo(reducedCorpus, cents), cents, books, M),
      books, cents, reducedCorpus, queries, k, nprobe, refine)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
    assert(after == reduced, "post-takedown != reduced-corpus pipeline")

    val intoDir = Files.createTempDirectory("ivfpq-consol").toString
    IncrementalIvf.consolidate(spark, dir, intoDir)
    val cidx = IncrementalIvf.index(spark, intoDir)
    assert(searchSet(cidx) == after, "consolidation changed searchPq")
    assert(spark.read.parquet(s"$intoDir/pq")
      .filter(col("vec_id") === victim).isEmpty)
    assert(IndexFs.childDirs(spark, s"$intoDir/pq/batch=0")
      .exists(_.startsWith("centroid_id=")))
    // the frozen books rode along unchanged
    assert(spark.read.parquet(s"$intoDir/codebooks").count() ==
      spark.read.parquet(s"$dir/codebooks").count())
  }
}
