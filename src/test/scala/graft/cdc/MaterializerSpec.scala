package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class MaterializerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val catalog: CdcCatalog = CdcCatalog.fromPropertiesString(
    "pk.customers=id\nmap.customers=customers\n")

  def toDf(rows: Seq[(String, String, String, Int, Long)]): DataFrame =
    rows.toDF("topic", "key", "value", "partition", "offset")

  def golden(sink: InMemorySink): Map[Seq[Any], Map[String, Any]] =
    sink.state("customers")

  test("golden scenario: r,r,c,u,d,tombstone,replay → {1, 3-updated}") {
    val sink = new InMemorySink
    Materializer.applyBatch(toDf(Fixtures.goldenSequence), catalog,
      Envelope.defaultRegistry, sink)
    val st = golden(sink)
    assert(st.keySet == Set(Seq(1), Seq(3)))
    assert(st(Seq(3))("email") == "ed.walker@walker.com")
    assert(st(Seq(1))("first_name") == "Sally")
  }

  test("idempotent replay: re-applying the same batch is a no-op") {
    val sink = new InMemorySink
    val batch = toDf(Fixtures.goldenSequence)
    Materializer.applyBatch(batch, catalog, Envelope.defaultRegistry, sink)
    val first = golden(sink)
    Materializer.applyBatch(batch, catalog, Envelope.defaultRegistry, sink)
    assert(golden(sink) == first)
  }

  test("last-writer-wins inside one batch: only max-offset change applies") {
    val sink = new InMemorySink
    val rows = Seq(
      Fixtures.raw(Fixtures.customer("c", 1, "V1", "X", "v1@x"), 10),
      Fixtures.raw(Fixtures.customer("u", 1, "V2", "X", "v2@x"), 11),
      Fixtures.raw(Fixtures.customer("u", 1, "V3", "X", "v3@x"), 12))
    Materializer.applyBatch(toDf(rows), catalog, Envelope.defaultRegistry, sink)
    assert(golden(sink)(Seq(1))("first_name") == "V3")
  }

  test("delete-then-reinsert within a batch keeps the reinsert (by offset)") {
    val sink = new InMemorySink
    val rows = Seq(
      Fixtures.raw(Fixtures.customer("c", 1, "A", "B", "a@b"), 0),
      Fixtures.raw(Fixtures.customer("d", 1, "A", "B", "a@b",
        before = Some((1, "A", "B", "a@b"))), 1),
      Fixtures.raw(Fixtures.customer("c", 1, "A2", "B2", "a2@b"), 2))
    Materializer.applyBatch(toDf(rows), catalog, Envelope.defaultRegistry, sink)
    assert(golden(sink)(Seq(1))("first_name") == "A2")
  }

  test("parquet table store: merge + delete across batches, reread survives") {
    val sink = new ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-pts").toString)
    val b1 = Seq(
      Fixtures.raw(Fixtures.customer("r", 1, "Sally", "Thomas", "sally@acme"), 0),
      Fixtures.raw(Fixtures.customer("r", 2, "George", "Bailey", "g@foobar"), 1))
    val b2 = Seq(
      Fixtures.raw(Fixtures.customer("u", 1, "Sally2", "Thomas", "sally@acme"), 2),
      Fixtures.raw(Fixtures.customer("d", 2, "George", "Bailey", "g@foobar",
        before = Some((2, "George", "Bailey", "g@foobar"))), 3))
    Materializer.applyBatch(toDf(b1), catalog, Envelope.defaultRegistry, sink)
    Materializer.applyBatch(toDf(b2), catalog, Envelope.defaultRegistry, sink)
    val rows = sink.read("customers").get
      .select("id", "first_name").as[(Int, String)].collect().toMap
    assert(rows == Map(1 -> "Sally2"))
  }

  test("unknown tables get inferred typed schemas (not all-strings)") {
    val sink = new InMemorySink
    val product =
      """{"before": null, "after": {"id": 7, "name": "gizmo", "price": 9.99,
        |"in_stock": true}, "source": {"db": "app", "table": "products",
        |"ts_ms": 1}, "op": "c", "ts_ms": 1}""".stripMargin.replaceAll("\n", " ")
    val rows = Seq(Fixtures.raw(product, 0, topic = "mysql.app.products"))
    Materializer.applyBatch(toDf(rows), catalog, Envelope.defaultRegistry, sink)
    val row = sink.state("products")(Seq(7L))
    assert(row("id") == 7L)            // JSON number → long, not "7"
    assert(row("price") == 9.99)       // → double
    assert(row("in_stock") == true)    // → boolean
    assert(row("name") == "gizmo")
  }

  test("inference off → dynamic string-map fallback still applies") {
    val sink = new InMemorySink
    val product =
      """{"before": null, "after": {"id": 7, "name": "gizmo"},
        |"source": {"db": "app", "table": "widgets", "ts_ms": 1},
        |"op": "c", "ts_ms": 1}""".stripMargin.replaceAll("\n", " ")
    val rows = Seq(Fixtures.raw(product, 0, topic = "mysql.app.widgets"))
    Materializer.applyBatch(toDf(rows), catalog, Envelope.defaultRegistry, sink,
      inferUnknown = false)
    val row = sink.state("widgets")(Seq("7"))
    assert(row("after") == Map("id" -> "7", "name" -> "gizmo"))
  }

  test("the reference's own verification query runs over the mirror via SQL") {
    val sink = new ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlview").toString)
    Materializer.applyBatch(toDf(Fixtures.goldenSequence), catalog,
      Envelope.defaultRegistry, sink)
    graft.Graft.registerMirror(spark, sink, Seq("customers"))
    // /root/reference/README.md:131-134 — verbatim
    val rows = spark.sql(
      "SELECT id, first_name, last_name, email FROM customers ORDER BY id")
      .as[(Int, String, String, String)].collect().toSeq
    assert(rows == Seq(
      (1, "Sally", "Thomas", "sally.thomas@acme.com"),
      (3, "Edward", "Walker", "ed.walker@walker.com")))
  }

  test("configured partitioning lays the table out by the given columns") {
    val root = java.nio.file.Files.createTempDirectory("graft-partstore").toString
    val sink = new ParquetTableStore(spark, root,
      partitioning = Map("customers" -> Seq("last_name")))
    Materializer.applyBatch(toDf(Fixtures.goldenSequence), catalog,
      Envelope.defaultRegistry, sink)
    // configured columns nest inside the key-hash buckets
    val v = sink.versions("customers").last
    val dirs = sink.manifest("customers", v).values
      .flatMap(p => new java.io.File(p).listFiles()
        .filter(_.isDirectory).map(_.getName)).toSet
    assert(dirs == Set("_p_last_name=Thomas", "_p_last_name=Walker"))
    // the layout column stays in the data files, so reads see it
    val ids = sink.read("customers").get.select("id").as[Int].collect().toSet
    assert(ids == Set(1, 3))

    // a second batch merges across sibling bucket roots from different
    // batch dirs and keeps the layout
    Materializer.applyBatch(toDf(Seq(
      Fixtures.raw(Fixtures.customer("u", 1, "Sal", "Thomas", "sal@acme"), 50))),
      catalog, Envelope.defaultRegistry, sink)
    val after = sink.read("customers").get
      .select("id", "first_name").as[(Int, String)].collect().toMap
    assert(after == Map(1 -> "Sal", 3 -> "Edward"))

    // the multi-root read plans as ONE basePath-anchored scan, not a
    // per-root union — planning stays constant in bucket count
    val scans = sink.read("customers").get.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one scan, got ${scans.size}")
  }

  test("legacy-layout bucket roots (column-stripping partitionBy) still read whole") {
    // Stores written before layout columns were duplicated into the
    // data files carry them only as Hive `col=value` dirs; the
    // single-scan read path must detect those roots and give them a
    // discovery read instead of silently dropping the column.
    val root = java.nio.file.Files.createTempDirectory("graft-legacy").toString
    val sink = new ParquetTableStore(spark, root,
      partitioning = Map("customers" -> Seq("last_name")))
    Materializer.applyBatch(toDf(Fixtures.goldenSequence), catalog,
      Envelope.defaultRegistry, sink)
    val v = sink.versions("customers").last
    // rewrite ONE bucket root into the legacy layout (mixed-store case)
    val legacyRoot = sink.manifest("customers", v).values.toSeq.sorted.head
    val df = spark.read.option("recursiveFileLookup", "true").parquet(legacyRoot)
    val tmp = java.nio.file.Files.createTempDirectory("graft-legacy-tmp")
      .resolve("out").toString
    df.write.partitionBy("last_name").parquet(tmp)
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf)
      f.delete()
    }
    rmRf(new java.io.File(legacyRoot))
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(legacyRoot))
    // legacy files have NO last_name column on disk — reads must still
    // reconstruct it alongside the untouched current-layout roots
    val rows = sink.read("customers").get
      .select("id", "last_name").as[(Int, String)].collect().toSet
    assert(rows == Set((1, "Thomas"), (3, "Walker")), s"got $rows")
  }

  test("a relocated store root still reads every retained version") {
    val root = java.nio.file.Files.createTempDirectory("graft-move").toString
    val sink = new ParquetTableStore(spark, root,
      partitioning = Map("customers" -> Seq("last_name")))
    Materializer.applyBatch(toDf(Fixtures.goldenSequence), catalog,
      Envelope.defaultRegistry, sink)
    Materializer.applyBatch(toDf(Seq(
      Fixtures.raw(Fixtures.customer("u", 1, "Sal", "Thomas", "sal@acme"), 50))),
      catalog, Envelope.defaultRegistry, sink)
    val moved = java.nio.file.Paths.get(root + "-moved")
    java.nio.file.Files.move(java.nio.file.Paths.get(root), moved)
    val reopened = new ParquetTableStore(spark, moved.toString,
      partitioning = Map("customers" -> Seq("last_name")))
    val rows = reopened.read("customers").get
      .select("id", "first_name").as[(Int, String)].collect().toMap
    assert(rows == Map(1 -> "Sal", 3 -> "Edward"))
    // every retained manifest resolves under the new root (time travel)
    reopened.versions("customers").foreach { v =>
      assert(reopened.readVersion("customers", v).count() > 0)
    }
  }

  test("bucket-scoped merge: a batch rewrites only buckets containing changed keys") {
    val root = java.nio.file.Files.createTempDirectory("graft-bucketmerge").toString
    val sink = new ParquetTableStore(spark, root, nBuckets = 16)
    // seed 40 keys so most of the 16 buckets are populated
    val seed = (1 to 40).map(i =>
      Fixtures.raw(Fixtures.customer("r", i, s"F$i", s"L$i", s"u$i@x"), i.toLong))
    Materializer.applyBatch(toDf(seed), catalog, Envelope.defaultRegistry, sink)
    val v1 = sink.versions("customers").last
    val m1 = sink.manifest("customers", v1)
    assert(m1.size > 4, s"seed should span several buckets, got ${m1.size}")
    // update one key, delete one key
    val b2 = Seq(
      Fixtures.raw(Fixtures.customer("u", 1, "F1b", "L1", "u1@x"), 100L),
      Fixtures.raw(Fixtures.customer("d", 2, "F2", "L2", "u2@x",
        before = Some((2, "F2", "L2", "u2@x"))), 101L))
    Materializer.applyBatch(toDf(b2), catalog, Envelope.defaultRegistry, sink)
    val v2 = sink.versions("customers").last
    val m2 = sink.manifest("customers", v2)
    val changed = m2.keySet.filter(b => m1.get(b) != m2.get(b)) ++
      (m1.keySet -- m2.keySet)
    assert(changed.size <= 2,
      s"only the ≤2 touched buckets may change, got $changed")
    // untouched buckets carry their exact data paths forward (file reuse)
    (m1.keySet -- changed).foreach(b => assert(m1(b) == m2(b)))
    // and the merge semantics still hold
    val rows = sink.read("customers").get
      .select("id", "first_name").as[(Int, String)].collect().toMap
    assert(rows.size == 39 && rows(1) == "F1b" && !rows.contains(2))
    // old version still reads complete (time travel over shared files)
    assert(sink.readVersion("customers", v1).count() == 40)
  }

  test("schema evolution: a column added in a later batch widens the table") {
    val sink = new ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-evolve").toString)
    def ev(id: Int, extra: String): String =
      (s"""{"before": null, "after": {"id": $id, "name": "n$id"$extra},
         |"source": {"db": "app", "table": "gadgets", "ts_ms": 1},
         |"op": "c", "ts_ms": 1}""").stripMargin.replaceAll("\n", " ")
    val cat = CdcCatalog.fromPropertiesString("pk.gadgets=id\n")
    // batch 1: two columns; batch 2: adds a `color` column (source DDL)
    Materializer.applyBatch(
      toDf(Seq(Fixtures.raw(ev(1, ""), 0, topic = "mysql.app.gadgets"))),
      cat, Map.empty, sink)
    Materializer.applyBatch(
      toDf(Seq(Fixtures.raw(ev(2, """, "color": "red""""), 1,
        topic = "mysql.app.gadgets"))),
      cat, Map.empty, sink)
    val out = sink.read("gadgets").get
    assert(out.columns.toSet == Set("id", "name", "color"))
    val rows = out.select("id", "color").as[(Long, Option[String])]
      .collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some("red")))
  }

  test("multi-table batch routes by topic and applies per-table PKs") {
    val cat = CdcCatalog.fromPropertiesString(
      "pk.customers=id\npk.orders=id\nmap.orders=orders_sink\n")
    val sink = new InMemorySink
    val order =
      """{"before": null, "after": {"id": 100, "order_date": "2026-01-28T00:00:00Z",
        |"purchaser": 1, "quantity": 2, "product": "thing"},
        |"source": {"db": "app", "table": "orders", "ts_ms": 1}, "op": "c", "ts_ms": 1}"""
        .stripMargin.replaceAll("\n", " ")
    val rows = Seq(
      Fixtures.raw(Fixtures.customer("c", 1, "A", "B", "a@b"), 0),
      Fixtures.raw(order, 0, topic = "mysql.app.orders"))
    Materializer.applyBatch(toDf(rows), cat, Envelope.defaultRegistry, sink)
    assert(sink.state("customers").keySet == Set(Seq(1)))
    assert(sink.state("orders_sink")(Seq(100L))("product") == "thing")
  }

  test("non-local roots are ACCEPTED (rename-free log commit needs no " +
      "atomic rename) and file: roots run the full merge path") {
    // pre-log protocol the constructor failed fast on hdfs://s3a://
    // because the _LATEST flip leaned on local ATOMIC_MOVE; the
    // version-log commit is rename-free, so every Hadoop FS routes
    new ParquetTableStore(spark, "hdfs://namenode:8020/store")
    new ParquetTableStore(spark, "s3a://bucket/store")
    // an explicit file: URI root exercises the exact Hadoop-FS code
    // path an hdfs:// root takes (the IndexFs adoption pattern)
    val tmp = java.nio.file.Files.createTempDirectory("pts-scheme")
    val sink = new ParquetTableStore(spark, s"file:$tmp")
    Materializer.applyBatch(toDf(Fixtures.goldenSequence), catalog,
      Envelope.defaultRegistry, sink)
    val rows = sink.read("customers").get
      .select("id", "first_name").as[(Int, String)].collect().toMap
    assert(rows == Map(1 -> "Sally", 3 -> "Edward"))
  }
}
