package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The stream-maintained inverted index must be indistinguishable from
  * the batch BM25 query over the same corpus:
  *  1. equality — ingest sf0.001 documents in 3 micro-batches, search
  *     == q_bm25's exact output (scores ARE the shared Bm25.rank, so
  *     this pins the postings/stats bookkeeping, not the formula);
  *  2. split-invariance — a different batch split yields the same
  *     ranking (every BM25 ingredient is split-independent);
  *  3. replay — redelivering a batch leaves the index identical;
  *  4. pruning — the search scan selects only the query terms'
  *     term_bucket leaves, not the whole postings tree.
  */
class IncrementalPostingsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"
  private val terms = Seq("hash", "join", "filter")

  private def docs = graft.table(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  private def asTuples(df: DataFrame): Seq[(Long, Double, Long)] =
    df.as[(Long, Double, Long)].collect().toSeq.sortBy(_._3)

  test("stream-maintained index == batch q_bm25; split-invariant; replay; prunes") {
    val dir = Files.createTempDirectory("inc-post").toString
    val ckpt = Files.createTempDirectory("inc-post-ckpt").toString

    val ms = MemoryStream[(Long, String)](spark)
    val q = IncrementalPostings.start(
      ms.toDF().toDF("doc_id", "text"), dir, ckpt)
    try {
      (0 to 2).foreach { m =>
        ms.addData(docs.filter(col("doc_id") % 3 === m)
          .as[(Long, String)].collect().toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val expected = asTuples(graft.SparkEntry.queries("q_bm25")(spark, sfDir))
    val got = asTuples(IncrementalPostings.search(spark, dir, terms, 20))
    assert(got == expected, s"stream!=batch: got=${got.take(3)}")
    assert(got.size == 20)

    // 2. split-invariance: 2-way split into a fresh dir, same ranking
    val dir2 = Files.createTempDirectory("inc-post-2").toString
    IncrementalPostings.processBatch(docs.filter(col("doc_id") % 2 === 0), dir2, 0L)
    IncrementalPostings.processBatch(docs.filter(col("doc_id") % 2 === 1), dir2, 1L)
    assert(asTuples(IncrementalPostings.search(spark, dir2, terms, 20)) == expected)

    // 3. replay: redeliver stream batch 1 (the m==1 slice), index unchanged
    val before = spark.read.parquet(s"$dir/postings")
      .select("doc_id", "term", "tf", "dl", "term_bucket", "batch")
      .collect().map(_.toSeq).toSet
    IncrementalPostings.processBatch(docs.filter(col("doc_id") % 3 === 1), dir, 1L)
    val after = spark.read.parquet(s"$dir/postings")
      .select("doc_id", "term", "tf", "dl", "term_bucket", "batch")
      .collect().map(_.toSeq).toSet
    assert(after == before, "replayed batch changed the postings")
    assert(asTuples(IncrementalPostings.search(spark, dir, terms, 20)) == expected)

    // 4. pruning: the search postings scan selects only the probed
    // term_bucket leaves across batches
    val totalLeaves = spark.read.parquet(s"$dir/postings")
      .select("batch", "term_bucket").distinct().count()
    val searchDf = IncrementalPostings.search(spark, dir, terms, 20)
    searchDf.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++ (other match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(qs.plan)
        case _ => Nil
      })
    }
    val postingScans = scans(searchDf.queryExecution.executedPlan)
      .filter(_.selectedPartitions.partitionCount > 0)
      .map(_.selectedPartitions.partitionCount)
    // ≤ 3 distinct term buckets × 3 batches, vs ~NB buckets × 3 batches
    assert(postingScans.nonEmpty)
    assert(postingScans.max <= 3 * 3,
      s"scan read $postingScans leaves (probed terms only need ≤9)")
    assert(postingScans.max < totalLeaves,
      s"search scanned all $totalLeaves leaves")

    // 5. consolidation: history rolled into one batch=0 in a fresh dir
    // — same ranking, fewer leaves, bucket layout (and pruning) kept
    val dir3 = Files.createTempDirectory("inc-post-consolidated").toString
    IncrementalPostings.consolidate(spark, dir, dir3)
    assert(asTuples(IncrementalPostings.search(spark, dir3, terms, 20)) == expected,
      "consolidation changed the ranking")
    val leaves3 = spark.read.parquet(s"$dir3/postings")
      .select("batch", "term_bucket").distinct().count()
    assert(leaves3 < totalLeaves, "consolidation did not reduce leaf count")
    assert(spark.read.parquet(s"$dir3/stats").count() == 1)

    // 6. positional phrase search: the index's shifted-position
    // intersections == the batch scan form, on the live AND the
    // consolidated index
    val phraseExpected = graft.SparkEntry.queries("q_phrase_search")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._3)
    assert(phraseExpected.nonEmpty)
    def phr(d: String) = IncrementalPostings
      .phraseSearch(spark, d, Seq("hash", "join"), 20)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._3)
    assert(phr(dir) == phraseExpected, "index phrase search != batch scan")
    assert(phr(dir3) == phraseExpected, "consolidated phrase search drifted")
  }

  test("takedown: tombstoned docs vanish and ranking == reduced-corpus batch") {
    val dir = Files.createTempDirectory("inc-post-del").toString
    IncrementalPostings.processBatch(docs.filter(col("doc_id") % 2 === 0), dir, 0L)
    IncrementalPostings.processBatch(docs.filter(col("doc_id") % 2 === 1), dir, 1L)

    // delete every doc_id % 7 == 0, plus a never-ingested id (ignored)
    val dead = docs.filter(col("doc_id") % 7 === 0)
      .select("doc_id").as[Long].collect().toSeq
    IncrementalPostings.delete(spark, dir, dead :+ 999999L, 0L)
    // double-delete in a second tombstone batch must not double-charge
    IncrementalPostings.delete(spark, dir, dead.take(2), 1L)

    // batch ranking over the REDUCED corpus, via the real q_bm25 on a
    // documents.parquet holding only the surviving docs
    val reducedDir = Files.createTempDirectory("inc-post-del-corpus").toString
    docs.filter(col("doc_id") % 7 =!= 0)
      .write.parquet(s"$reducedDir/documents.parquet")
    val expected = asTuples(
      graft.SparkEntry.queries("q_bm25")(spark, reducedDir))
    val got = asTuples(IncrementalPostings.search(spark, dir, terms, 20))
    assert(got == expected, s"post-delete ranking != reduced-corpus batch")
    assert(got.map(_._1).intersect(dead).isEmpty)

    // phrase search honors tombstones too
    val phraseGot = IncrementalPostings
      .phraseSearch(spark, dir, Seq("hash", "join"), 50)
      .as[(Long, Long, Long)].collect().map(_._1)
    assert(phraseGot.intersect(dead).isEmpty)

    // consolidation drops them physically: fresh dir has no deletes,
    // fewer postings, same ranking
    val dir2 = Files.createTempDirectory("inc-post-del-consolidated").toString
    IncrementalPostings.consolidate(spark, dir, dir2)
    assert(!new java.io.File(s"$dir2/deletes").exists())
    assert(asTuples(IncrementalPostings.search(spark, dir2, terms, 20)) == expected)
    val deadSet = dead.toSet
    assert(spark.read.parquet(s"$dir2/postings").select("doc_id").as[Long]
      .collect().forall(!deadSet.contains(_)))
  }

  test("vocabulary from the maintained index == batch word count; " +
      "tombstones reduce it") {
    val dir = Files.createTempDirectory("inc-post-vocab").toString
    IncrementalPostings.processBatch(docs.filter(col("doc_id") % 2 === 0), dir, 0L)
    IncrementalPostings.processBatch(docs.filter(col("doc_id") % 2 === 1), dir, 1L)

    def batchVocab(d: DataFrame): Seq[(String, Long)] = d
      .select(explode(split(trim(col("text")), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("c"))
      .orderBy(col("c").desc, col("term")).limit(10)
      .as[(String, Long)].collect().toSeq

    val got = IncrementalPostings.vocabulary(spark, dir, 10)
      .as[(String, Long)].collect().toSeq
    assert(got == batchVocab(docs), s"index vocabulary != corpus word count")

    // takedowns subtract the dead docs' counts exactly
    val dead = docs.filter(col("doc_id") % 3 === 0)
      .select("doc_id").as[Long].collect().toSeq
    IncrementalPostings.delete(spark, dir, dead, 0L)
    val gotReduced = IncrementalPostings.vocabulary(spark, dir, 10)
      .as[(String, Long)].collect().toSeq
    assert(gotReduced == batchVocab(docs.filter(col("doc_id") % 3 =!= 0)))
  }

  test("empty micro-batch leaves search and stats usable") {
    // foreachBatch can deliver zero-row batches (trigger with no new
    // data); the index must absorb them — the empty stats row (0 docs,
    // null sum_dl) must not poison N/avgdl, and the empty postings
    // partition must not break schema discovery
    val dir = Files.createTempDirectory("inc-post-empty").toString
    IncrementalPostings.processBatch(
      docs.filter(col("doc_id") % 2 === 0), dir, 0L)
    val before = asTuples(IncrementalPostings.search(spark, dir, terms, 20))
    IncrementalPostings.processBatch(
      docs.filter(lit(false)), dir, 1L) // zero rows
    assert(asTuples(IncrementalPostings.search(spark, dir, terms, 20)) == before,
      "empty batch changed the ranking")
  }

  test("phrase search: overlapping and duplicate-term phrases") {
    val dir = Files.createTempDirectory("inc-post-phrase").toString
    IncrementalPostings.processBatch(Seq(
      (1L, "a a a b"),        // "a a" overlaps: starts 0,1
      (2L, "x a a y a a z"),  // two separated occurrences
      (3L, "a b a b a")       // "a b" twice, "b a" twice
    ).toDF("doc_id", "text"), dir, 0L)
    def occ(phrase: Seq[String]) = IncrementalPostings
      .phraseSearch(spark, dir, phrase, 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(occ(Seq("a", "a")) == Map(1L -> 2L, 2L -> 2L))
    assert(occ(Seq("a", "b")) == Map(1L -> 1L, 3L -> 2L))
    assert(occ(Seq("a", "a", "a")) == Map(1L -> 1L))
    assert(occ(Seq("b", "a", "b")) == Map(3L -> 1L))
  }
}
