package graft

import graft.streaming.{IncrementalDedup, IncrementalPostings}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The compliance story composed end to end: SCAN (the q_pii_flags
  * regex detection) finds the documents that must leave, TAKEDOWN
  * removes them from every persistent index (retrieval postings + LSH
  * dedup bands), and afterwards each index behaves exactly as if the
  * flagged docs were never ingested — search equals the reduced-corpus
  * batch ranking and the dedup index no longer matches their content.
  * Each piece has its own contract spec; this pins that they COMPOSE.
  */
class CompliancePipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = graft.table(spark, sfDir, "documents")

  test("PII scan -> takedown -> every index answers as the reduced corpus") {
    // the q_pii_flags enrichment, per doc: ids % 5 == 0 carry an email
    val enriched = docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit(""))).as("text"))

    // 1. SCAN: flag every doc with an email hit
    val flagged = enriched
      .filter(regexp_count(col("text"),
        lit("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")) > 0)
      .select("doc_id").as[Long].collect().toSeq
    assert(flagged.nonEmpty && flagged.forall(_ % 5 == 0))

    // 2. the corpus (enriched form) was ingested into both indexes
    val postDir = Files.createTempDirectory("comp-post").toString
    IncrementalPostings.processBatch(enriched, postDir, 0L)
    val bandDir = Files.createTempDirectory("comp-band").toString
    val band = new IncrementalDedup.DedupIndex(spark, bandDir)
    IncrementalDedup.processBatch(enriched, band).unpersist()

    // 3. TAKEDOWN from both
    IncrementalPostings.delete(spark, postDir, flagged, 0L)
    band.delete(flagged, 0L)

    // 4a. retrieval == batch BM25 over the reduced corpus
    val reducedDir = Files.createTempDirectory("comp-reduced").toString
    enriched.filter(col("doc_id") % 5 =!= 0)
      .join(docs.drop("text"), "doc_id")
      .write.parquet(s"$reducedDir/documents.parquet")
    // q_bm25's own query terms — the batch side is the real query
    val terms = Seq("hash", "join", "filter")
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "bm25", "rnk").as[(Long, Double, Long)]
        .collect().toSeq.sortBy(_._3)
    val got = tuples(IncrementalPostings.search(spark, postDir, terms, 20))
    val expected = tuples(SparkEntry.queries("q_bm25")(spark, reducedDir))
    assert(got == expected, "post-takedown search != reduced-corpus batch")
    assert(got.map(_._1).intersect(flagged).isEmpty)

    // 4b. the dedup index no longer matches the removed content: a
    // re-ingested copy of a flagged doc is NEW (no pair), while a copy
    // of a surviving doc still matches
    val survivor = enriched.filter(col("doc_id") % 5 =!= 0)
      .select("doc_id", "text").as[(Long, String)].head()
    val removed = enriched.filter(col("doc_id") === flagged.head)
      .select("text").as[String].head()
    val probe = Seq((100001L, removed), (100002L, survivor._2))
      .toDF("doc_id", "text")
    val pairs = IncrementalDedup.processBatch(probe, band)
    val got2 = pairs.select("d1", "d2").as[(Long, Long)].collect().toSet
    pairs.unpersist()
    assert(got2.contains((survivor._1, 100002L)),
      s"surviving content must still match: $got2")
    assert(!got2.exists(p => flagged.contains(p._1) || flagged.contains(p._2)),
      s"tombstoned content resurfaced: $got2")
  }

  test("PII scan -> REDACT -> re-scan comes back zero (the in-place " +
      "masking alternative to whole-doc takedown)") {
    val pii = Seq(
      "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
      "[0-9]{3}-[0-9]{4}-[0-9]{4}",
      "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}")
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select(pii.map(p =>
        sum(regexp_count(col("text"), lit(p))).cast("long")): _*)
        .as[(Long, Long, Long)].head() match {
          case (a, b, c) => a + b + c
        }

    // 1. SCAN the enriched corpus: all three PII classes present
    val before = operators.Coverage17.redacted(spark, sfDir)
    assert(hits(before.select(col("orig").as("text"))) > 0,
      "enrichment planted no PII — the re-scan-zero claim would be vacuous")

    // 2. REDACT is the q_pii_redact masking; re-scan must be clean
    assert(hits(before.select("text")) == 0L,
      "redacted corpus still scans PII-positive")

    // 3. masked docs keep their surrounding content (the point of
    // masking over takedown): every doc survives, placeholders mark
    // the removals, and a doc with no PII is byte-identical
    val rows = before.select(col("doc_id"), col("text"), col("orig"))
      .as[(Long, String, String)].collect()
    assert(rows.length == docs.count())
    rows.foreach { case (id, red, orig) =>
      if (id % 5 != 0 && id % 7 != 0 && id % 11 != 0)
        assert(red == orig, s"doc $id had no PII but changed")
      else assert(red.contains("[EMAIL]") == (id % 5 == 0) &&
        red.contains("[PHONE]") == (id % 7 == 0) &&
        red.contains("[IP]") == (id % 11 == 0), s"doc $id placeholders wrong")
    }
  }
}
