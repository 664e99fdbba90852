package graft.streaming

import graft.TestSpark
import graft.operators.IvfIndex
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Takedown + consolidation parity for the persistent LSH band indexes
  * and the IVF index — the compliance contract IncrementalPostings
  * established (its spec is the template): `delete` makes every read
  * behave exactly as a REDUCED-CORPUS rebuild, and `consolidate` drops
  * the rows physically while preserving the partition layout (and
  * therefore the file-level pruning) plus the `_PREFIXES` adoption
  * contract.
  */
class BandIndexTakedownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val baseText =
    "the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew quartz potions under a pale winter moon beside the river"
  private val unrelated =
    "completely different words entirely nothing shared here at all " +
      "just random other tokens filling space without any overlap truly"

  private def ingestText(dir: String, batches: Seq[Seq[(Long, String)]])
      : Seq[Set[(Long, Long)]] = {
    val idx = new IncrementalDedup.DedupIndex(spark, dir)
    batches.map { b =>
      val verified = IncrementalDedup.processBatch(
        b.toDF("doc_id", "text"), idx, IncrementalDedup.Config(threshold = 0.7))
      val pairs = verified.select("d1", "d2").as[(Long, Long)].collect().toSet
      verified.unpersist()
      pairs
    }
  }

  test("text takedown == reduced-corpus rebuild; consolidate preserves " +
      "candidates, layout, and _PREFIXES") {
    val dir = Files.createTempDirectory("band-del").toString
    // batch 1: the doc that will be taken down (+ an unrelated one)
    ingestText(dir, Seq(Seq((1L, baseText), (3L, unrelated))))
    new IncrementalDedup.DedupIndex(spark, dir).delete(Seq(1L), deleteId = 0L)

    // a reduced-corpus rebuild never saw doc 1 at all
    val reducedDir = Files.createTempDirectory("band-red").toString
    ingestText(reducedDir, Seq(Seq((3L, unrelated))))

    val probe = Seq((10L, baseText.replace("quick", "slow")))
    val gotDeleted = ingestText(dir, Seq(probe)).head
    val gotReduced = ingestText(reducedDir, Seq(probe)).head
    assert(gotDeleted == gotReduced,
      s"takedown != reduced-corpus rebuild: $gotDeleted vs $gotReduced")
    assert(gotDeleted.isEmpty,
      s"tombstoned doc still matches history: $gotDeleted")

    // consolidate: same candidate behavior from the fresh directory,
    // bp layout + _PREFIXES preserved, tombstoned rows physically gone,
    // fewer files (three appends have landed by now)
    val intoDir = Files.createTempDirectory("band-cons").toString
    val orig = new IncrementalDedup.DedupIndex(spark, dir)
    orig.consolidate(intoDir)
    assert(IndexFs.readText(spark, s"$intoDir/_PREFIXES").map(_.trim.toInt)
      .contains(orig.prefixes), "_PREFIXES must carry over")
    val bpDirs = IndexFs.childDirs(spark, s"$intoDir/bands")
    assert(bpDirs.nonEmpty && bpDirs.forall(_.startsWith("bp=")),
      s"bp layout flattened: $bpDirs")
    assert(!spark.read.parquet(s"$intoDir/bands").select("doc_id")
      .as[Long].collect().contains(1L), "tombstoned bands survived physically")
    assert(!spark.read.parquet(s"$intoDir/shingles").select("doc_id")
      .as[Long].collect().contains(1L), "tombstoned payload survived physically")
    def parquetFiles(p: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(p))
    }
    assert(parquetFiles(s"$intoDir/bands") < parquetFiles(s"$dir/bands"),
      "consolidation must reduce band file count")

    // identical probe against original vs consolidated: same pairs
    val probe2 = Seq((20L, unrelated.replace("random", "assorted")))
    val fromOrig = ingestText(dir, Seq(probe2)).head
    val fromCons = ingestText(intoDir, Seq(probe2)).head
    assert(fromOrig == fromCons, s"$fromOrig vs $fromCons")
    assert(fromOrig == Set((3L, 20L)), s"expected the (3,20) pair: $fromOrig")
  }

  test("adoption contract holds through an explicit file: URI (Hadoop FS " +
      "path resolution, not java.io)") {
    val plain = Files.createTempDirectory("band-uri").toString
    val uri = s"file:$plain"
    // write through the URI form — every probe/meta op must resolve
    // via the path's Hadoop FileSystem for this to work at all
    ingestText(uri, Seq(Seq((1L, baseText), (3L, unrelated))))
    assert(IndexFs.readText(spark, s"$uri/_PREFIXES").isDefined,
      "meta file must exist under the URI root")
    // reopen through the PLAIN path with a different requested prefix
    // count: the on-disk value must win regardless of path spelling
    val reopened = new IncrementalDedup.DedupIndex(spark, plain,
      requestedPrefixes = 7)
    assert(reopened.prefixes == 256,
      s"adoption must read the persisted count, got ${reopened.prefixes}")
    // and the URI-opened index still finds cross-batch duplicates
    val pairs = ingestText(uri, Seq(Seq((10L, baseText.replace("quick", "slow"))))).head
    assert(pairs == Set((1L, 10L)), s"URI-opened history lookup broken: $pairs")
  }

  test("embedding takedown == reduced-corpus rebuild") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(32)(rnd.nextGaussian().toFloat)
    val near = base.map(v => v + 0.05f * rnd.nextGaussian().toFloat)
    val other = Array.fill(32)(rnd.nextGaussian().toFloat)

    def ingest(dir: String, batches: Seq[Seq[(Long, Array[Float])]])
        : Seq[Set[(Long, Long)]] = {
      val idx = new IncrementalEmbedDedup.EmbedIndex(spark, dir)
      batches.map { b =>
        val verified = IncrementalEmbedDedup.processBatch(
          b.toDF("vec_id", "embedding"), idx)
        val pairs = verified.select("v1", "v2").as[(Long, Long)].collect().toSet
        verified.unpersist()
        pairs
      }
    }

    val dir = Files.createTempDirectory("embed-del").toString
    ingest(dir, Seq(Seq((1L, base), (3L, other))))
    new IncrementalEmbedDedup.EmbedIndex(spark, dir).delete(Seq(1L), 0L)
    val reducedDir = Files.createTempDirectory("embed-red").toString
    ingest(reducedDir, Seq(Seq((3L, other))))

    val gotDeleted = ingest(dir, Seq(Seq((10L, near)))).head
    val gotReduced = ingest(reducedDir, Seq(Seq((10L, near)))).head
    assert(gotDeleted == gotReduced && gotDeleted.isEmpty,
      s"takedown != reduced rebuild: $gotDeleted vs $gotReduced")

    // sanity: without the takedown the same probe DOES match history
    val ctlDir = Files.createTempDirectory("embed-ctl").toString
    ingest(ctlDir, Seq(Seq((1L, base), (3L, other))))
    assert(ingest(ctlDir, Seq(Seq((10L, near)))).head == Set((1L, 10L)))
  }

  test("ivf takedown: search == reduced-corpus search; consolidate drops rows") {
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    def searchSet(idx: IvfIndex, queries: DataFrame): Set[(Long, Long, Long)] =
      idx.search(queries, k = 3, nprobe = 2)
        .select("qid", "vec_id", "rn").as[(Long, Long, Long)].collect().toSet

    val dir = Files.createTempDirectory("ivf-del").toString
    val idx = IvfIndex.build(corpus.toDF("vec_id", "embedding"), dir, 10)
    val queries = corpus.take(4).map { case (i, v) => (1000L + i, v) }
      .toDF("qid", "qv")
    val before = searchSet(idx, queries)
    // the takedown contract is SAME CENTROIDS, reduced corpus — so the
    // reduced-rebuild oracle is only fair for non-centroid victims
    // (removing a `vec_id % modulus == 0` vector from the rebuild's
    // input would change the centroid set and hence ANN probing itself)
    val victims = before.map(_._2).filter(_ % 10 != 0).take(2).toSeq
    assert(victims.size == 2)
    idx.delete(victims, deleteId = 0L)

    val reducedDir = Files.createTempDirectory("ivf-red").toString
    val reduced = IvfIndex.build(
      corpus.filterNot(c => victims.contains(c._1)).toDF("vec_id", "embedding"),
      reducedDir, 10)
    assert(searchSet(idx, queries) == searchSet(reduced, queries),
      "tombstoned search != reduced-corpus rebuild search")
    assert(searchSet(idx, queries).forall(r => !victims.contains(r._2)))

    val intoDir = Files.createTempDirectory("ivf-cons").toString
    IncrementalIvf.consolidate(spark, dir, intoDir)
    val physical = spark.read.parquet(s"$intoDir/assigned")
      .select("vec_id").as[Long].collect().toSet
    assert(victims.forall(v => !physical.contains(v)),
      "tombstoned vectors survived consolidation physically")
    assert(physical.size == 60 - victims.size)
    assert(searchSet(IncrementalIvf.index(spark, intoDir), queries)
      == searchSet(reduced, queries), "consolidated search drifted")
  }
}
