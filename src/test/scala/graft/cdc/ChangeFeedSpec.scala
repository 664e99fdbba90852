package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** `ParquetTableStore.changesBetween` — the Delta-CDF-shaped version
  * diff. Pins the row-level contract (insert / update pre+post /
  * delete, no rows for untouched keys), the transitivity-ish sanity of
  * reading across several versions, and the SCALE contract: buckets
  * whose manifest entry is identical in both versions are never read
  * (asserted through inputFiles, not prose). */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val catalog: CdcCatalog = CdcCatalog.fromPropertiesString(
    "pk.customers=id\nmap.customers=customers\n")

  private def toDf(rows: Seq[(String, String, String, Int, Long)]): DataFrame =
    rows.toDF("topic", "key", "value", "partition", "offset")

  private def apply(sink: ParquetTableStore,
      rows: Seq[(String, String, String, Int, Long)]): String = {
    Materializer.applyBatch(toDf(rows), catalog, Envelope.defaultRegistry, sink)
    sink.versions("customers").last
  }

  test("insert / update / delete between adjacent versions") {
    val sink = new ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-cdf").toString,
      nBuckets = 8)
    val v1 = apply(sink, Seq(
      Fixtures.raw(Fixtures.customer("r", 1, "Sally", "Thomas", "s@x"), 0),
      Fixtures.raw(Fixtures.customer("r", 2, "George", "Bailey", "g@x"), 1),
      Fixtures.raw(Fixtures.customer("r", 3, "Ed", "Walker", "e@x"), 2)))
    val v2 = apply(sink, Seq(
      Fixtures.raw(Fixtures.customer("u", 1, "Sally2", "Thomas", "s@x"), 3),
      Fixtures.raw(Fixtures.customer("d", 2, "George", "Bailey", "g@x",
        before = Some((2, "George", "Bailey", "g@x"))), 4),
      Fixtures.raw(Fixtures.customer("c", 4, "New", "Kid", "n@x"), 5)))

    val feed = sink.changesBetween("customers", Seq("id"), v1, v2)
      .select("id", "first_name", "_change_type")
      .as[(Int, String, String)].collect().toSet
    assert(feed == Set(
      (1, "Sally", "update_preimage"),
      (1, "Sally2", "update_postimage"),
      (2, "George", "delete"),
      (4, "New", "insert")))
    // key 3 never changed → no row at all
    // identical versions → empty feed, table-shaped schema
    val none = sink.changesBetween("customers", Seq("id"), v2, v2)
    assert(none.count() == 0)
    assert(none.columns.contains("_change_type") &&
      none.columns.contains("first_name"))
    // changesSince(from = v1) against current == between(v1, v2)
    assert(sink.changesSince("customers", Seq("id"), v1)
      .select("id", "_change_type").as[(Int, String)].collect().toSet ==
      feed.map(f => (f._1, f._3)))
  }

  test("recorded path reads only change files; snapshot fallback reads " +
      "only changed buckets; both serve the same rows") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdf-prune")
    val sink = new ParquetTableStore(spark, root.toString, nBuckets = 16)
    val v1 = apply(sink, (1 to 40).map(i =>
      Fixtures.raw(Fixtures.customer("r", i, s"F$i", s"L$i", s"u$i@x"), i.toLong)))
    val v2 = apply(sink, Seq(
      Fixtures.raw(Fixtures.customer("u", 7, "F7b", "L7", "u7@x"), 100L)))
    val expect = Set(
      (7, "F7", "update_preimage"), (7, "F7b", "update_postimage"))

    // 1. RECORDED: every input file lives under changes/ (delta-sized)
    val recorded = sink.changesBetween("customers", Seq("id"), v1, v2)
    assert(recorded.inputFiles.nonEmpty &&
      recorded.inputFiles.forall(_.contains("/changes/")),
      s"recorded path escaped changes/: ${recorded.inputFiles.toSeq}")
    assert(recorded.select("id", "first_name", "_change_type")
      .as[(Int, String, String)].collect().toSet == expect)

    // 2. FALLBACK (simulate a vacuumed change dir: break the _PARENT
    // walk — v2's own marker, an earlier version's would leave the
    // (v1 → v2) walk intact): inputFiles ⊆ buckets whose manifest
    // entries differ
    java.nio.file.Files.delete(root.resolve("customers")
      .resolve("changes").resolve(v2).resolve("_PARENT"))
    val m1 = sink.manifest("customers", v1)
    val m2 = sink.manifest("customers", v2)
    val changedDirs = (m1.keySet ++ m2.keySet)
      .filter(b => m1.get(b) != m2.get(b))
      .flatMap(b => m1.get(b).toSeq ++ m2.get(b).toSeq)
    assert(changedDirs.nonEmpty && changedDirs.size <= 2,
      s"one touched key should touch one bucket: $changedDirs")
    val diffed = sink.changesBetween("customers", Seq("id"), v1, v2)
    val readFiles = diffed.inputFiles.toSeq
    assert(readFiles.nonEmpty)
    readFiles.foreach { f =>
      assert(changedDirs.exists(d => f.contains(
        new java.io.File(d).getName) && f.contains(
        new java.io.File(d).getParentFile.getName)),
        s"read a file outside the changed buckets: $f (allowed: $changedDirs)")
    }
    // the two paths are one contract
    assert(diffed.select("id", "first_name", "_change_type")
      .as[(Int, String, String)].collect().toSet == expect)
  }

  test("TIMESTAMP AS OF resolves to the latest version at the instant") {
    val sink = new ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-asof").toString,
      nBuckets = 4)
    val v1 = apply(sink, Seq(
      Fixtures.raw(Fixtures.customer("r", 1, "A", "X", "a@x"), 0)))
    val t1 = v1.stripPrefix("v").takeWhile(_ != '-').toLong
    Thread.sleep(5) // distinct commit millis
    val v2 = apply(sink, Seq(
      Fixtures.raw(Fixtures.customer("u", 1, "A2", "X", "a@x"), 1)))
    val t2 = v2.stripPrefix("v").takeWhile(_ != '-').toLong

    assert(sink.versionAsOf("customers", t1 - 1).isEmpty) // predates all
    assert(sink.versionAsOf("customers", t1).contains(v1))
    assert(sink.versionAsOf("customers", t2 - 1).contains(v1))
    assert(sink.versionAsOf("customers", Long.MaxValue).contains(v2))
    assert(sink.readAsOf("customers", t1).get
      .select("first_name").as[String].collect().toSeq == Seq("A"))
    assert(sink.readAsOf("customers", t2).get
      .select("first_name").as[String].collect().toSeq == Seq("A2"))
  }

  test("multi-version squash: transient states net out") {
    val sink = new ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-cdf-squash").toString,
      nBuckets = 8)
    val v1 = apply(sink, Seq(
      Fixtures.raw(Fixtures.customer("r", 1, "A", "X", "a@x"), 0),
      Fixtures.raw(Fixtures.customer("r", 2, "B", "X", "b@x"), 1)))
    // v2: insert 3, update 1 (first hop)
    apply(sink, Seq(
      Fixtures.raw(Fixtures.customer("c", 3, "C", "X", "c@x"), 2),
      Fixtures.raw(Fixtures.customer("u", 1, "A2", "X", "a@x"), 3)))
    // v3: update 1 again, delete 3 (inserted then deleted → nets out),
    // delete 2, update-then... re-insert 2? no — keep 2 deleted
    val v3 = apply(sink, Seq(
      Fixtures.raw(Fixtures.customer("u", 1, "A3", "X", "a@x"), 4),
      Fixtures.raw(Fixtures.customer("d", 3, "C", "X", "c@x",
        before = Some((3, "C", "X", "c@x"))), 5),
      Fixtures.raw(Fixtures.customer("d", 2, "B", "X", "b@x",
        before = Some((2, "B", "X", "b@x"))), 6)))
    val feed = sink.changesBetween("customers", Seq("id"), v1, v3)
    assert(feed.inputFiles.forall(_.contains("/changes/")))
    val got = feed.select("id", "first_name", "_change_type")
      .as[(Int, String, String)].collect().toSet
    // 1: ONE pre/post pair spanning the chain (A → A3, A2 invisible);
    // 2: delete with the original image; 3: nothing (never at v1 or v3)
    assert(got == Set(
      (1, "A", "update_preimage"), (1, "A3", "update_postimage"),
      (2, "B", "delete")), got)
  }

  test("vacuum sweeps orphan change dirs (crash before manifest) but " +
      "keeps retained versions' feeds") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdf-orphan")
    val sink = new ParquetTableStore(spark, root.toString, nBuckets = 4)
    val v1 = apply(sink, Seq(
      Fixtures.raw(Fixtures.customer("r", 1, "A", "X", "a@x"), 0)))
    val v2 = apply(sink, Seq(
      Fixtures.raw(Fixtures.customer("u", 1, "A2", "X", "a@x"), 1)))
    // simulate the crash window: a change dir whose version never got a
    // manifest — no _PARENT walk reaches it, and pre-fix no vacuum
    // deleted it either
    val orphan = root.resolve("customers").resolve("changes")
      .resolve("v9999999999999-000000.manifest")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("_PARENT"), v2.getBytes)
    assert(sink.vacuum("customers", keep = 2, minAgeMs = 0L).isEmpty) // nothing doomed
    assert(!java.nio.file.Files.exists(orphan), "orphan change dir kept")
    // retained versions' change dirs survive and still serve the feed
    val feed = sink.changesBetween("customers", Seq("id"), v1, v2)
    assert(feed.inputFiles.forall(_.contains("/changes/")))
    assert(feed.count() == 2)
  }

  test("a column added between versions surfaces as updates (nulls-widening)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdf-evo").toString
    val sink = new ParquetTableStore(spark, root, nBuckets = 4)
    val empty = Seq.empty[Int].toDF("id")
    // v1: plain two-column rows, driven straight through applyChanges
    // (the typed decode path would drop the undeclared column upstream
    // — the feed's evolution stance is a STORE property)
    sink.applyChanges("t", Seq("id"),
      Seq((1, "A"), (2, "B")).toDF("id", "name"), empty)
    val v1 = sink.versions("t").last
    // v2: key 1 re-upserted with an extra column
    sink.applyChanges("t", Seq("id"),
      Seq((1, "A", "gold")).toDF("id", "name", "tier"), empty)
    val v2 = sink.versions("t").last
    val feed = sink.changesBetween("t", Seq("id"), v1, v2)
    val byType = feed.select("_change_type", "tier").as[(String, Option[String])]
      .collect().toMap
    assert(byType == Map(
      "update_preimage" -> None, "update_postimage" -> Some("gold")))
    // key 2 lives in an untouched-or-rewritten bucket; either way its
    // pre/post images are null-safe-equal (tier null both sides after
    // alignment) → no feed row
    assert(!feed.select("id").as[Int].collect().contains(2))
  }
}
