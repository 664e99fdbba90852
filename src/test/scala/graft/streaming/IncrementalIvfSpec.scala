package graft.streaming

import graft.TestSpark
import graft.operators.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The incrementally-maintained IVF index must be indistinguishable
  * from a one-shot assignment against the same fixed centroids:
  *
  *  1. stream==batch — ingesting the corpus as bootstrap + 2
  *     micro-batches yields exactly the (vec_id, centroid_id)
  *     assignment of `ivfAssignTo(fullCorpus, centroids)`, and
  *     `IvfIndex.search` over the maintained directory returns exactly
  *     `SimilarityOps.ivfSearch` over that one-shot assignment;
  *  2. replay-idempotence — re-processing an already-ingested batch id
  *     (foreachBatch at-least-once) leaves the index byte-identical:
  *     the batch-id-keyed overwrite replaces its own previous attempt;
  *  3. pruning — the probe's scan selects only the probed centroid_id
  *     directories (across batch= subdirs), not the whole index.
  */
class IncrementalIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  private def corpus = graft.table(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def assignedSet(dir: String): Set[(Long, Long)] =
    spark.read.parquet(s"$dir/assigned")
      .select(col("vec_id").cast("long"), col("centroid_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("stream-maintained index == one-shot assignment; replay idempotent; probe prunes") {
    val dir = Files.createTempDirectory("inc-ivf").toString
    val ckpt = Files.createTempDirectory("inc-ivf-ckpt").toString

    val boot = corpus.filter(col("vec_id") % 3 === 0)
    // modulus 23 over the %3 bootstrap slice → ids ≡ 0 (mod 69): ~8
    // centroids at sf0.001, enough that a 2-query nprobe=2 probe CAN'T
    // cover them all and the pruning assertion below is meaningful
    IncrementalIvf.bootstrap(boot, dir, 23)

    val ms = MemoryStream[(Long, Array[Float])](spark)
    val q = IncrementalIvf.start(
      ms.toDF().toDF("vec_id", "embedding"), dir, ckpt)
    try {
      (1 to 2).foreach { m =>
        ms.addData(corpus.filter(col("vec_id") % 3 === m)
          .as[(Long, Array[Float])].collect().toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    // 1a. assignment equality with the one-shot twin (same centroids)
    val centroids = spark.read.parquet(s"$dir/centroids")
    val oneShot = SimilarityOps.ivfAssignTo(corpus, centroids)
    val expected = oneShot.select("vec_id", "centroid_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = assignedSet(dir)
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(got.size == corpus.count(), "duplicate or dropped vectors")

    // 1b. search equality through the shared probe path
    val queries = corpus.filter(col("vec_id") % 101 === 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    assert(queries.count() >= 2)
    def asSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val viaIndex = asSet(
      IncrementalIvf.index(spark, dir).search(queries, k = 5, nprobe = 2))
    val viaBatch = asSet(
      SimilarityOps.ivfSearch(oneShot, centroids, queries, k = 5, nprobe = 2))
    assert(viaIndex == viaBatch, s"diff=${(viaIndex -- viaBatch).take(3)}")
    assert(viaIndex.nonEmpty)

    // 2. replay: redeliver stream batch 1 (the m==2 slice landed as
    // batch=2: stream ids are 0-based and shifted past the bootstrap)
    IncrementalIvf.processBatch(
      corpus.filter(col("vec_id") % 3 === 2), dir, 2L)
    assert(assignedSet(dir) == got, "replayed batch changed the index")

    // 3. probe pruning: the search scan must select only probed
    // centroid_id leaves, not every (batch, centroid) directory
    val totalLeaves = spark.read.parquet(s"$dir/assigned")
      .select("batch", "centroid_id").distinct().count()
    val searchDf =
      IncrementalIvf.index(spark, dir).search(queries, k = 5, nprobe = 2)
    searchDf.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++ (other match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case _ => Nil
      })
    }
    val selected = scans(searchDf.queryExecution.executedPlan)
      .map(_.selectedPartitions.partitionCount)
    assert(selected.nonEmpty && selected.forall(_ > 0))
    assert(selected.max < totalLeaves,
      s"probe scanned all $totalLeaves leaves (selected=$selected)")

    // 4. consolidation: batch history rolled into one batch=0 in a
    // fresh dir — same assignments, same search results, layout (and
    // pruning) preserved
    val dir2 = Files.createTempDirectory("inc-ivf-consolidated").toString
    IncrementalIvf.consolidate(spark, dir, dir2)
    assert(assignedSet(dir2) == got, "consolidation changed assignments")
    val viaConsolidated = asSet(
      IncrementalIvf.index(spark, dir2).search(queries, k = 5, nprobe = 2))
    assert(viaConsolidated == viaIndex, "consolidation changed search results")
    val leaves2 = spark.read.parquet(s"$dir2/assigned")
      .select("batch", "centroid_id").distinct().count()
    assert(leaves2 < totalLeaves, "consolidation did not reduce leaf count")

    // 5. checkpoint restart: a NEW query over the same checkpoint and
    // source continues the batch-id sequence — earlier batches are not
    // rewritten and the new vectors land in the next batch dir
    val extra = corpus.filter(col("vec_id") % 3 === 1)
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => (id + 100000L, e) }.toSeq
    val q2 = IncrementalIvf.start(
      ms.toDF().toDF("vec_id", "embedding"), dir, ckpt)
    try {
      ms.addData(extra)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(new java.io.File(s"$dir/assigned/batch=3").isDirectory,
      "restarted stream did not continue the batch-id sequence")
    val after = assignedSet(dir)
    assert(after.map(_._1) == got.map(_._1) ++ extra.map(_._1).toSet,
      "restart lost or duplicated vectors")
  }

  test("drift metric flags a shifted batch; warm-start retrain+consolidate " +
      "equals a fresh trained build and does not degrade assignment quality") {
    val dir = Files.createTempDirectory("inc-ivf-drift").toString

    // planted geometry (the testdata embeddings are near-random, where
    // EVERYTHING is equally far and drift is a weak signal by nature):
    // 6 tight clusters around one-hot centers. Seeds `% 97 == 0` land
    // one per center (97 ≡ 1 mod 6), so the bootstrap assignment is
    // near-perfect — baseline drift ≈ 0.
    val Dim = 8
    def jit(i: Long, d: Int): Float = (((i * 31 + d * 17) % 13) - 6) / 100.0f
    def planted(i: Long, center: Int, sign: Float): (Long, Array[Float]) =
      (i, Array.tabulate(Dim)(d =>
        (if (d == center) sign else 0.0f) + jit(i, d)))
    val base = (0L until 500L).map(i => planted(i, (i % 6).toInt, 1.0f))
    val baseDf = base.toDF("vec_id", "embedding")
    IncrementalIvf.bootstrap(baseDf, dir, 97)

    // the SHIFT: a batch clustered around NEGATED centers — nearly
    // antipodal to every existing centroid. id' = id·97 + 1000001 ≡ 28
    // (mod 97): no shifted id is a seed, which makes the fresh-build
    // comparison below exact (buildTrained over the accumulated corpus
    // seeds from exactly the bootstrap's centroid set).
    val shifted = (0L until 200L)
      .map(i => planted(i * 97 + 1000001L, (i % 6).toInt, -1.0f))
      .toDF("vec_id", "embedding")
    IncrementalIvf.processBatch(shifted, dir, 1L)

    // the drift metric separates the shifted batch from the baseline
    val stats = IncrementalIvf.driftStats(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(stats.keySet == Set(0L, 1L), stats)
    val (baseN, baseDrift) = stats(0L)
    val (shiftN, shiftDrift) = stats(1L)
    assert(baseN == 500L && shiftN == 200L)
    assert(baseDrift < 0.1, s"baseline should be near-perfect: $baseDrift")
    assert(shiftDrift > baseDrift + 0.5,
      s"shifted batch not flagged: baseline=$baseDrift shifted=$shiftDrift")

    // warm-start retrain + consolidate == fresh trained build over the
    // same accumulated corpus (same initial centroids, same steps)
    val dir2 = Files.createTempDirectory("inc-ivf-retrained").toString
    IncrementalIvf.retrainConsolidate(spark, dir, dir2, iters = 2)
    val freshDir = Files.createTempDirectory("inc-ivf-fresh").toString
    val union = baseDf.unionByName(shifted)
    graft.operators.IvfIndex.buildTrained(union, freshDir, 97, iters = 2)

    val queries = union.filter(col("vec_id") % 101 === 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def asSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val viaRetrained = asSet(
      IncrementalIvf.index(spark, dir2).search(queries, k = 5, nprobe = 2))
    val viaFresh = asSet(
      IncrementalIvf.index(spark, freshDir).search(queries, k = 5, nprobe = 2))
    assert(viaRetrained == viaFresh && viaRetrained.nonEmpty,
      s"diff=${((viaRetrained -- viaFresh) ++ (viaFresh -- viaRetrained)).take(5)}")

    // retraining moved centroids toward the drifted density: overall
    // assignment quality (mean assign distance) must not degrade
    val pre = graft.operators.KMeansOps.inertia(
      IncrementalIvf.index(spark, dir).assigned
        .select(col("vec_id"), col("embedding"),
          col("centroid_id").cast("long").as("centroid_id")),
      IncrementalIvf.index(spark, dir).centroids)
    val post = graft.operators.KMeansOps.inertia(
      IncrementalIvf.index(spark, dir2).assigned
        .select(col("vec_id"), col("embedding"),
          col("centroid_id").cast("long").as("centroid_id")),
      IncrementalIvf.index(spark, dir2).centroids)
    assert(post <= pre + 1e-6, s"retrain degraded inertia: $pre -> $post")

    // the retrained index's drift stats read the consolidated batch=0
    // as the NEW baseline — the loop is closed
    val retrainedStats = IncrementalIvf.driftStats(spark, dir2).collect()
    assert(retrainedStats.length == 1 && retrainedStats.head.getLong(0) == 0L)
  }
}
