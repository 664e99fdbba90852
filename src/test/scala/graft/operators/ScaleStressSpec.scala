package graft.operators

import graft.TestSpark
import graft.cdc.ParquetTableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-stress properties for the dedup/CC/store family. Correctness
  * at sf0.1 is verified by the oracle gate; these specs pin the SHAPES
  * that keep each component viable at 100-1000x the test data:
  *
  *  - LSH candidate pairs grow ~linearly with corpus size (a quadratic
  *    blowup in candidates is the classic near-dup scale killer);
  *  - connected-components rounds track planted component DIAMETER,
  *    not component or corpus size;
  *  - ParquetTableStore micro-batch latency stays flat over a 500-batch
  *    soak with periodic vacuum, and retained state (manifests, batch
  *    dirs) stays bounded instead of accumulating per batch.
  *
  * Corpora are generated in-test (deterministic seeds) so the sizes can
  * exceed the shipped testdata by 10-50x without new files.
  */
class ScaleStressSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** n docs of 40 words from a 5000-word vocabulary (seeded per doc);
    * every 10th doc gets a planted near-dup (one word changed) with id
    * offset by 10*n so ids never collide across the two populations. */
  private def corpus(n: Int): DataFrame = {
    val rows = (0 until n).flatMap { i =>
      val rnd = new scala.util.Random(i * 2654435761L)
      val words = Vector.fill(40)(s"w${rnd.nextInt(5000)}")
      val doc = (i.toLong, words.mkString(" "))
      if (i % 10 == 0) {
        val nearDup = (words.dropRight(1) :+ "changed").mkString(" ")
        Seq(doc, (10L * n + i, nearDup))
      } else Seq(doc)
    }
    rows.toDF("doc_id", "text")
  }

  private def candidateCount(docs: DataFrame): Long =
    DedupOps.lshCandidates(
      DedupOps.minhashSignatures(DedupOps.shingleArrays(docs), 32), 32, 2).count()

  test("LSH candidate pairs grow ~linearly in corpus size (no quadratic blowup)") {
    val small = candidateCount(corpus(300))   // ~30 planted pairs
    val large = candidateCount(corpus(3000))  // 10x docs, ~300 planted pairs
    assert(small >= 30, s"planted pairs must surface, got $small")
    // linear scaling: 10x the docs gives ~10x the candidates. A
    // quadratic candidate set would be ~100x; allow wide noise margins.
    val ratio = large.toDouble / small
    assert(ratio >= 5 && ratio <= 20,
      s"candidates should scale ~10x for 10x docs, got $small -> $large (${ratio}x)")
    info(s"candidates: 300 docs -> $small, 3000 docs -> $large (${ratio}x)")
  }

  private def pairsDf(edges: Seq[(Long, Long)]): DataFrame =
    edges.toDF("d1", "d2")

  test("CC rounds track component diameter, not component size") {
    // star: 0 at the center — diameter 2 regardless of leaf count
    val (starSmallL, starSmall) = DedupOps.connectedComponentsWithRounds(
      pairsDf((1L to 50L).map(i => (0L, i))))
    val (starBigL, starBig) = DedupOps.connectedComponentsWithRounds(
      pairsDf((1L to 500L).map(i => (0L, i))))
    assert(starSmallL.select("canonical").distinct().count() == 1)
    assert(starBigL.select("canonical").distinct().count() == 1)
    assert(starBig <= starSmall + 1,
      s"10x the leaves must not add rounds: $starSmall -> $starBig")
    assert(starBig <= 4, s"shallow component should converge in <=4, got $starBig")

    // chain: 0-1-2-...-16 — diameter 16; pointer doubling means label
    // 0's reach doubles per round, so rounds ≈ log2(diameter) + the
    // fixpoint-detection round, NOT the 16 hops plain propagation needs
    val (chainL, chain) = DedupOps.connectedComponentsWithRounds(
      pairsDf((0L until 16L).map(i => (i, i + 1))))
    assert(chainL.select("canonical").distinct().count() == 1)
    assert(chain >= 3 && chain <= 8,
      s"chain rounds should track log2(diameter 16) ~ 4-6, got $chain")
    // a 4x longer chain must cost at most ~2 more (doubling) rounds
    val (chain4L, chain4) = DedupOps.connectedComponentsWithRounds(
      pairsDf((0L until 64L).map(i => (i, i + 1))))
    assert(chain4L.select("canonical").distinct().count() == 1)
    assert(chain4 <= chain + 3,
      s"4x chain length must cost <= ~2 extra rounds: $chain -> $chain4")
    info(s"rounds: star50=$starSmall star500=$starBig chain17=$chain chain65=$chain4")
  }

  test("CC frees every checkpoint RDD it persists (no storage growth across runs)") {
    // round-4 verdict: each CC round's localCheckpoint stranded an RDD
    // in block-manager storage until GC, billing its debt to whichever
    // query ran next. Now superseded rounds are freed in-loop and the
    // final round is released by clearMemos() with the memo caches.
    DedupOps.clearMemos()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val before = spark.sparkContext.getRDDStorageInfo.length
    (1 to 2).foreach { _ =>
      // a 65-node chain forces several pointer-doubling rounds — the
      // shape that used to strand one checkpoint RDD per round
      val (l, rounds) = DedupOps.connectedComponentsWithRounds(
        pairsDf((0L until 64L).map(i => (i, i + 1))))
      l.count()
      assert(rounds >= 3, s"want a multi-round fixpoint to stress, got $rounds")
      // mid-lifecycle: only the FINAL round's checkpoint may be live
      val during = spark.sparkContext.getRDDStorageInfo.length
      assert(during <= before + 1,
        s"superseded round checkpoints must be freed in-loop: $before -> $during")
      DedupOps.clearMemos()
    }
    val after = spark.sparkContext.getRDDStorageInfo.length
    assert(after <= before,
      s"no net storage growth across CC runs + clearMemos: $before -> $after")
    info(s"persisted RDDs: before=$before after=$after")
  }

  test("loopInput checkpoints are released by clearMemos (pagerank leaves no storage)") {
    // same leak class as the CC finding: a lazy localCheckpoint's RDD
    // is not freed by Dataset.unpersist. q_pagerank materializes its
    // edge/node tables through DedupOps.loopInput, which registers them
    // for release with the memo caches.
    DedupOps.clearMemos()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val before = spark.sparkContext.getRDDStorageInfo.length
    (1 to 2).foreach { _ =>
      graft.SparkEntry.queries("q_pagerank")(spark, "/root/testdata/sf0.001")
        .count()
      DedupOps.clearMemos()
    }
    val after = spark.sparkContext.getRDDStorageInfo.length
    assert(after <= before,
      s"loopInput checkpoints must not accumulate: $before -> $after")
  }

  test("store soak: 500 micro-batches with periodic vacuum, flat latency, bounded state") {
    val root = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val sink = new ParquetTableStore(spark, root, nBuckets = 4)
    val nBatches = 500
    val times = new Array[Long](nBatches)
    (0 until nBatches).foreach { b =>
      // 3 upserts cycling a 50-key space + 1 delete — the table stays
      // ~50 rows while every batch exercises the merge path
      val ups = Seq.tabulate(3)(k => ((b * 3 + k) % 50, s"v$b"))
        .toDF("id", "payload").coalesce(1)
      val dels = Seq(((b * 7) % 50)).toDF("id").coalesce(1)
      val t0 = System.nanoTime()
      sink.applyChanges("soak", Seq("id"), ups, dels)
      if (b % 25 == 24) sink.vacuum("soak", keep = 2, minAgeMs = 0L)
      times(b) = (System.nanoTime() - t0) / 1000000
    }
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val early = median(times.slice(100, 150).toSeq)
    val late = median(times.slice(450, 500).toSeq)
    // flat = the 500th batch costs what the 100th did (vacuum keeps the
    // manifest chain and dead batch dirs from accumulating)
    assert(late <= early * 3 + 50,
      s"per-batch latency must stay flat: median(100-150)=${early}ms, median(450-500)=${late}ms")
    // bounded state: >=498 of the 500 batch dirs are vacuumed away
    assert(sink.versions("soak").size <= 27,
      s"manifests must be vacuumed, got ${sink.versions("soak").size}")
    val batchDirs = new java.io.File(root, "soak/data").listFiles().count(_.isDirectory)
    assert(batchDirs <= 30, s"dead batch dirs must be GC'd, got $batchDirs")
    // and the table still reads correctly after 500 merges
    val n = sink.read("soak").get.count()
    assert(n > 0 && n <= 50, s"soak table should hold <=50 live keys, got $n")
    info(s"soak: median(100-150)=${early}ms median(450-500)=${late}ms " +
      s"versions=${sink.versions("soak").size} batchDirs=$batchDirs rows=$n")
  }

  // ---- SRP-LSH candidate scaling ----

  private def randomVectors(n: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  private def srpCandidates(vecs: DataFrame, bits: Int): Long = {
    val banded = DedupOps.srpBands(vecs, bands = 16, bitsPerBand = bits)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("b.vec_id") > col("a.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id")).distinct().count()
  }

  test("SRP candidates on uncorrelated vectors scale as n²/2^bits; bits are the knob") {
    // For UNCORRELATED vectors every pair collides in a band with
    // probability ~2^-bits, so candidates grow quadratically at fixed
    // bits — the honest scale rule is bits ≈ log2(n) + margin, which
    // keeps expected random collisions per vector O(1). This test pins
    // both halves of that rule.
    val c400 = srpCandidates(randomVectors(400, 7), bits = 8)
    val c800 = srpCandidates(randomVectors(800, 7), bits = 8)
    val growth = c800.toDouble / c400
    assert(growth > 2.8 && growth < 5.5,
      s"expected ~4x (quadratic) growth for random data at fixed bits, got $growth")

    // +4 bits per band divides random collisions by ~2^4
    val c800w = srpCandidates(randomVectors(800, 7), bits = 12)
    val shrink = c800.toDouble / c800w
    assert(shrink > 6 && shrink < 40,
      s"expected ~16x candidate reduction from 8->12 bits, got $shrink")
    info(s"candidates: n=400/8b=$c400 n=800/8b=$c800 (${growth}x) n=800/12b=$c800w")
  }

  test("wider SRP bands keep planted near-dup recall while shedding random candidates") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(300)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val dups = (0 until 60).map { i =>
      (300L + i, base(i).map(v => v + 0.12f * rnd.nextGaussian().toFloat))
    }
    val all = (base.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq ++ dups)
      .toDF("vec_id", "embedding")
    val banded = DedupOps.srpBands(all, bands = 16, bitsPerBand = 12)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("b.vec_id") > col("a.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 60).map(i => (i.toLong, 300L + i)).toSet
    val found = planted.intersect(cand).size
    assert(found >= 58, s"12-bit bands lost planted recall: $found/60")
  }
}
