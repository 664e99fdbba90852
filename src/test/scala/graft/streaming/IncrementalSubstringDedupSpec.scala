package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The stream-maintained substring dedup must reproduce the batch
  * query under its contract (batches = ascending doc_id ranges):
  *  1. equality — 3 ordered micro-batches over sf0.001, union of
  *     per-batch reports == q_dedup_substring's full output;
  *  2. replay — redelivering a mid-stream batch leaves reports and
  *     gram index identical (lookup/newness read only EARLIER
  *     partitions, so the replay sees its first attempt's state);
  *  3. cross-batch charging — a planted doc repeating batch-1
  *     boilerplate is charged in its own later batch while the
  *     first-occurrence doc stays uncharged.
  */
class IncrementalSubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  private def docs = graft.table(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  private def asSet(df: DataFrame): Set[(Long, Long, Long, Long, Double)] =
    df.as[(Long, Long, Long, Long, Double)].collect().toSet

  test("ordered ingest == batch q_dedup_substring; replay idempotent") {
    val dir = Files.createTempDirectory("inc-sub").toString
    val ckpt = Files.createTempDirectory("inc-sub-ckpt").toString

    // ascending doc_id ranges — the arrival-order==id-order contract
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val slices = Seq(
      docs.filter(col("doc_id") < cuts(0)),
      docs.filter(col("doc_id") >= cuts(0) && col("doc_id") < cuts(1)),
      docs.filter(col("doc_id") >= cuts(1)))

    val ms = MemoryStream[(Long, String)](spark)
    val q = IncrementalSubstringDedup.start(
      ms.toDF().toDF("doc_id", "text"), dir, ckpt)
    try {
      slices.foreach { s =>
        ms.addData(s.as[(Long, String)].collect().toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val expected = asSet(
      graft.SparkEntry.queries("q_dedup_substring")(spark, sfDir))
    val got = asSet(IncrementalSubstringDedup.reports(spark, dir))
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.size == docs.count())

    // replay the MIDDLE batch: reports and gram index must not move
    val gramsBefore = spark.read.parquet(s"$dir/grams")
      .select("g", "fe", "batch").collect().map(_.toSeq).toSet
    IncrementalSubstringDedup.processBatch(slices(1), dir, 1L)
    assert(asSet(IncrementalSubstringDedup.reports(spark, dir)) == expected,
      "replayed batch changed the reports")
    assert(spark.read.parquet(s"$dir/grams")
      .select("g", "fe", "batch").collect().map(_.toSeq).toSet == gramsBefore,
      "replayed batch changed the gram index")

    // consolidation: gram history → one batch=0 in a fresh dir; reports
    // carried over; a post-consolidation batch still dedups against the
    // full consolidated index
    val dir2 = Files.createTempDirectory("inc-sub-consolidated").toString
    IncrementalSubstringDedup.consolidate(spark, dir, dir2)
    assert(asSet(IncrementalSubstringDedup.reports(spark, dir2)) == expected,
      "consolidation changed the reports")
    assert(spark.read.parquet(s"$dir2/grams").select("g", "fe")
      .collect().map(_.toSeq).toSet ==
      gramsBefore.map(_.dropRight(1)), "consolidation changed the gram set")
    val dupDoc = ids.max + 1
    val firstText = slices(0).orderBy("doc_id")
      .select("text").as[String].head()
    IncrementalSubstringDedup.processBatch(
      Seq((dupDoc, firstText)).toDF("doc_id", "text"), dir2, 3L)
    val rep = asSet(IncrementalSubstringDedup.reports(spark, dir2))
      .find(_._1 == dupDoc).get
    // an exact copy of a batch-0 doc: if long enough to gram, every
    // token is covered by one span
    if (firstText.trim.split(" ").length >= 8)
      assert(rep._3 >= 1L && rep._4 == rep._2,
        s"post-consolidation batch missed the duplicate: $rep")
  }

  test("takedown: reports forget, the dedup blocklist does not") {
    val dir = Files.createTempDirectory("inc-sub-del").toString
    val boiler = (1 to 12).map(i => s"d$i").mkString(" ")
    IncrementalSubstringDedup.processBatch(
      Seq((1L, s"$boiler t1 t2 t3")).toDF("doc_id", "text"), dir, 0L)
    IncrementalSubstringDedup.delete(spark, dir, Seq(1L), 0L)
    // the removed doc leaves the downstream report...
    assert(asSet(IncrementalSubstringDedup.reports(spark, dir)).isEmpty)
    // ...but a re-ingested copy of its content is charged as FULLY
    // duplicated — removed content stays blocklisted
    IncrementalSubstringDedup.processBatch(
      Seq((2L, s"$boiler t1 t2 t3")).toDF("doc_id", "text"), dir, 1L)
    val r = asSet(IncrementalSubstringDedup.reports(spark, dir))
      .map(x => x._1 -> x).toMap
    assert(r.keySet == Set(2L))
    assert(r(2L)._4 == r(2L)._2, s"re-ingested copy not fully charged: ${r(2L)}")
    // consolidation keeps the asymmetry: no deletes/ dir, report still
    // forgotten, blocklist still effective for a third copy
    val dir2 = Files.createTempDirectory("inc-sub-del-consolidated").toString
    IncrementalSubstringDedup.consolidate(spark, dir, dir2)
    assert(!new java.io.File(s"$dir2/deletes").exists())
    assert(asSet(IncrementalSubstringDedup.reports(spark, dir2))
      .map(_._1) == Set(2L))
    IncrementalSubstringDedup.processBatch(
      Seq((3L, s"$boiler t1 t2 t3")).toDF("doc_id", "text"), dir2, 3L)
    val r3 = asSet(IncrementalSubstringDedup.reports(spark, dir2))
      .map(x => x._1 -> x).toMap
    assert(r3(3L)._4 == r3(3L)._2)
  }

  test("empty micro-batch leaves the index and reports usable") {
    val dir = Files.createTempDirectory("inc-sub-empty").toString
    val boiler = (1 to 12).map(i => s"e$i").mkString(" ")
    IncrementalSubstringDedup.processBatch(
      Seq((1L, s"$boiler tail1 tail2 tail3")).toDF("doc_id", "text"), dir, 0L)
    IncrementalSubstringDedup.processBatch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), dir, 1L)
    // a later batch still dedups against the pre-empty-batch history
    IncrementalSubstringDedup.processBatch(
      Seq((2L, s"$boiler x1 x2 x3")).toDF("doc_id", "text"), dir, 2L)
    val r = asSet(IncrementalSubstringDedup.reports(spark, dir))
      .map(x => x._1 -> x).toMap
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L)._3 == 0L && r(2L)._3 == 1L && r(2L)._4 == 12L)
  }

  test("cross-batch charging: later copy charged, first occurrence never") {
    val dir = Files.createTempDirectory("inc-sub-plant").toString
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val tail1 = (1 to 10).map(i => s"u$i").mkString(" ")
    val tail2 = (1 to 10).map(i => s"v$i").mkString(" ")
    IncrementalSubstringDedup.processBatch(
      Seq((1L, s"$boiler $tail1")).toDF("doc_id", "text"), dir, 0L)
    IncrementalSubstringDedup.processBatch(
      Seq((2L, s"$boiler $tail2"),
          (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")).toDF("doc_id", "text"), dir, 1L)
    val r = asSet(IncrementalSubstringDedup.reports(spark, dir))
      .map(x => x._1 -> x).toMap
    assert(r(1L)._3 == 0L, s"first occurrence charged: ${r(1L)}")
    assert(r(2L)._3 == 1L && r(2L)._4 == 12L, s"later copy not charged: ${r(2L)}")
    assert(r(3L)._3 == 0L)
  }
}
