package graft.streaming

import graft.TestSpark
import graft.operators.{IvfIndex, SimilarityOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Stream-maintained IVF-SQ8: the code table follows every ingested
  * micro-batch (batch-id-keyed overwrite — replay-safe), and because
  * codes derive deterministically from (assignment, centroids), the
  * maintained index's searchSq8 EQUALS a one-shot IvfIndex.buildSq8
  * over the same corpus at every quiescent point. Takedowns hide
  * code rows like float rows; consolidation recomputes batch=0 codes
  * over the tombstone-applied corpus. */
class IncrementalIvfSq8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val Modulus = 97
  private val (k, nprobe, refine) = (5, 4, 3)

  private def corpus = graft.table(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")
  private def queries = corpus.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def searchSet(idx: IvfIndex): Set[(Long, Long, Double, Long)] =
    idx.searchSq8(queries, k, nprobe, refine)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet

  test("streamed ingestion == the inline SQ8 pipeline over the same " +
      "centroids at every split; a replayed batch changes nothing") {
    // the centroid set is the BOOTSTRAP slice's deterministic sample —
    // the inline expectation uses exactly those centroids (the
    // IncrementalIvfSpec comparison discipline)
    val boot = corpus.filter(col("vec_id") < 250)
    val cents = boot.filter(col("vec_id") % Modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val inline = SimilarityOps.ivfSq8Search(
      SimilarityOps.sq8Codes(
        SimilarityOps.ivfAssignTo(corpus, cents), cents),
      cents, corpus, queries, k, nprobe, refine)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
    assert(inline.nonEmpty)

    Seq(2, 5).foreach { nBatches =>
      val dir = Files.createTempDirectory(s"ivfsq8-stream$nBatches").toString
      IncrementalIvf.bootstrapSq8(boot, dir, Modulus)
      val chunk = 250 / (nBatches - 1).max(1) + 1
      (0 until (nBatches - 1)).foreach { i =>
        IncrementalIvf.processBatch(
          corpus.filter(col("vec_id") >= 250 + i.toLong * chunk &&
            col("vec_id") < 250 + (i + 1).toLong * chunk),
          dir, i + 1L)
      }
      val idx = IncrementalIvf.index(spark, dir)
      assert(searchSet(idx) == inline, s"$nBatches-batch split drifted")
      // replay the last ingest batch: batch-id-keyed overwrite of BOTH
      // layouts → byte-identical result
      IncrementalIvf.processBatch(
        corpus.filter(col("vec_id") >= 250 + (nBatches - 2).toLong * chunk &&
          col("vec_id") < 250 + (nBatches - 1).toLong * chunk),
        dir, (nBatches - 1).toLong)
      assert(searchSet(idx) == inline, "replay drifted")
    }
  }

  test("takedowns hide SQ8 candidates; consolidation drops them " +
      "physically and preserves searchSq8 + code pruning") {
    val dir = Files.createTempDirectory("ivfsq8-del").toString
    IncrementalIvf.bootstrapSq8(corpus.filter(col("vec_id") < 250),
      dir, Modulus)
    IncrementalIvf.processBatch(corpus.filter(col("vec_id") >= 250), dir, 1L)
    val idx = IncrementalIvf.index(spark, dir)
    val before = searchSet(idx)
    // take down a vector that currently appears in some result
    val victim = before.head._2
    idx.delete(Seq(victim), deleteId = 1L)
    val after = searchSet(idx)
    assert(!after.exists(_._2 == victim), "tombstoned vector still served")
    // equality with the reduced-corpus inline pipeline over the SAME
    // centroid set (tombstones never touch the centroid table)
    val cents = corpus.filter(col("vec_id") < 250)
      .filter(col("vec_id") % Modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val reducedCorpus = corpus.filter(col("vec_id") =!= victim)
    val reduced = SimilarityOps.ivfSq8Search(
      SimilarityOps.sq8Codes(
        SimilarityOps.ivfAssignTo(reducedCorpus, cents), cents),
      cents, reducedCorpus, queries, k, nprobe, refine)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
    assert(after == reduced, "post-takedown != reduced-corpus pipeline")

    // consolidate: one batch=0, codes recomputed over the tombstone-
    // applied corpus, search unchanged
    val intoDir = Files.createTempDirectory("ivfsq8-consol").toString
    IncrementalIvf.consolidate(spark, dir, intoDir)
    val cidx = IncrementalIvf.index(spark, intoDir)
    assert(searchSet(cidx) == after, "consolidation changed searchSq8")
    // the victim's code rows are PHYSICALLY gone
    assert(spark.read.parquet(s"$intoDir/sq8")
      .filter(col("vec_id") === victim).isEmpty)
    // and the code layout keeps its centroid_id partition dirs
    assert(IndexFs.childDirs(spark, s"$intoDir/sq8/batch=0")
      .exists(_.startsWith("centroid_id=")))
  }
}
