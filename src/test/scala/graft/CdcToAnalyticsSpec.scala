package graft

import graft.cdc.{CdcCatalog, Envelope, Materializer, ParquetTableStore}
import graft.operators.SubstringDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end composition of the engine's two halves: a Debezium feed
  * materializes a `docs` mirror (last-writer-wins, deletes applied),
  * and the corpus analytics run DIRECTLY on that mirror — the "switch
  * from the reference" story: the same library that maintains the
  * table also dedups and searches it. The analytics must see exactly
  * the post-CDC state: an UPDATE that introduces boilerplate makes the
  * doc a duplicate, a DELETE removes a doc from the corpus, and the
  * dedup report over the mirror equals the report over the equivalent
  * plain corpus.
  */
class CdcToAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val boiler = (1 to 12).map(i => s"b$i").mkString(" ")

  private def doc(op: String, id: Int, text: String, tsMs: Long): String = {
    val after =
      if (op == "d") "null"
      else s"""{"id": $id, "text": "$text"}"""
    val before =
      if (op == "u" || op == "d") s"""{"id": $id, "text": "old"}""" else "null"
    s"""{"before": $before, "after": $after,
       |"source": {"db": "app", "table": "docs", "ts_ms": ${tsMs - 1}},
       |"op": "$op", "ts_ms": $tsMs}""".stripMargin.replaceAll("\n", " ")
  }

  private def raw(value: String, offset: Long) =
    ("mysql.app.docs", """{"id": 0}""", value, 0, offset)

  test("CDC-materialized mirror feeds substring dedup and phrase search") {
    val store = new ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("cdc-analytics").toString)
    val catalog = CdcCatalog.fromPropertiesString("pk.docs=id\nmap.docs=docs\n")
    val feed = Seq(
      raw(doc("r", 1, s"$boiler " + (1 to 10).map(i => s"u$i").mkString(" "), 0), 0),
      raw(doc("c", 2, (1 to 20).map(i => s"x$i").mkString(" "), 1), 1),
      raw(doc("c", 3, (1 to 20).map(i => s"y$i").mkString(" "), 2), 2),
      // update doc 2: its NEW text repeats doc 1's boilerplate → it
      // becomes a duplicate only in the post-CDC state
      raw(doc("u", 2, s"$boiler " + (1 to 7).map(i => s"z$i").mkString(" "), 3), 3),
      // delete doc 3: it must vanish from the corpus the analytics see
      raw(doc("d", 3, "", 4), 4))
    Materializer.applyBatch(
      feed.toDF("topic", "key", "value", "partition", "offset"),
      catalog, Envelope.defaultRegistry, store)

    val mirror = store.read("docs").get
      .select(col("id").cast("long").as("doc_id"), col("text"))
    // the corpus the analytics see is the LWW state: 1, 2-updated
    assert(mirror.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))

    val report = SubstringDedup.report(mirror)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 arrived first: never charged; doc 2's updated text carries
    // the 12-token boilerplate: one span, 12 dup tokens
    assert(report(1L)._3 == 0L)
    assert(report(2L)._3 == 1L && report(2L)._4 == 12L,
      s"update's boilerplate not detected: ${report(2L)}")

    // phrase search over the mirror sees the UPDATED text only
    val hits = mirror
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .select(col("doc_id"), expr(
        "cast(size(filter(sequence(0, size(w) - 2)," +
          " i -> w[i] = 'b1' and w[i + 1] = 'b2')) as bigint)").as("occ"))
      .filter(col("occ") > 0)
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L, 2L -> 1L))
  }
}
