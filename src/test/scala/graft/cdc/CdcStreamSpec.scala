package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** End-to-end: file-based change stream (same shape as the Kafka source)
  * → CdcPipeline → materialized state, across multiple micro-batches
  * with a real checkpoint dir. */
class CdcStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def esc(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def writeBatch(dir: Path, n: Int,
      rows: Seq[(String, String, String, Int, Long)]): Unit = {
    val lines = rows.map { case (topic, key, value, part, off) =>
      val v = if (value == null) "null" else esc(value)
      s"""{"topic": ${esc(topic)}, "key": ${esc(key)}, "value": $v,""" +
        s""""partition": $part, "offset": $off}"""
    }
    Files.write(dir.resolve(s"batch_$n.json"),
      lines.mkString("\n").getBytes)
  }

  test("streamed golden scenario matches batch materialization") {
    val in = Files.createTempDirectory("cdc-stream-in")
    val ckpt = Files.createTempDirectory("cdc-stream-ckpt")
    val catalog = CdcCatalog.fromPropertiesString("pk.customers=id\n")
    val sink = new InMemorySink

    val (first, rest) = Fixtures.goldenSequence.splitAt(4)
    writeBatch(in, 0, first)
    val q = CdcPipeline.start(
      CdcPipeline.fileSource(spark, in.toString), catalog,
      Envelope.defaultRegistry, sink, ckpt.toString,
      trigger = Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      assert(sink.state("customers").keySet == Set(Seq(1), Seq(2), Seq(3)))
      writeBatch(in, 1, rest)
      q.processAllAvailable()
      val st = sink.state("customers")
      assert(st.keySet == Set(Seq(1), Seq(3)))
      assert(st(Seq(3))("email") == "ed.walker@walker.com")
    } finally q.stop()
  }

  test("undecodable records land in the DLQ; vacuum keeps newest versions") {
    val in = Files.createTempDirectory("cdc-dlq-in")
    val ckpt = Files.createTempDirectory("cdc-dlq-ckpt")
    val store = Files.createTempDirectory("cdc-dlq-store")
    val dlq = Files.createTempDirectory("cdc-dlq")
    val catalog = CdcCatalog.fromPropertiesString("pk.customers=id\n")
    val sink = new ParquetTableStore(spark, store.toString)

    writeBatch(in, 0, Seq(
      Fixtures.raw(Fixtures.customer("c", 1, "A", "B", "a@b"), 0),
      Fixtures.raw("{corrupt!!", 1),
      Fixtures.raw(Fixtures.customer("x", 9, "Bad", "Op", "bad@x"), 2)))
    val q = CdcPipeline.start(CdcPipeline.fileSource(spark, in.toString),
      catalog, Envelope.defaultRegistry, sink, ckpt.toString,
      trigger = Trigger.ProcessingTime(0), dlqDir = Some(dlq.toString))
    try {
      q.processAllAvailable()
      writeBatch(in, 1, Seq(
        Fixtures.raw(Fixtures.customer("u", 1, "A2", "B", "a@b"), 3)))
      q.processAllAvailable()
      writeBatch(in, 2, Seq(
        Fixtures.raw(Fixtures.customer("u", 1, "A3", "B", "a@b"), 4)))
      q.processAllAvailable()
    } finally q.stop()

    val rejected = spark.read.json(s"$dlq/customers")
    assert(rejected.count() == 2)
    import spark.implicits._
    val ops = rejected.select("op").as[String].collect().toSet
    assert(ops.contains("x")) // unknown op recorded with its op code
    // corrupt record recorded with the raw text
    assert(rejected.filter(col("corrupt").isNotNull).count() == 1)

    // 3 versions written; vacuum(keep=2) deletes the oldest only
    assert(sink.versions("customers").size == 3)
    val deleted = sink.vacuum("customers", keep = 2, minAgeMs = 0L)
    assert(deleted.size == 1 && sink.versions("customers").size == 2)
    assert(sink.read("customers").get
      .select("first_name").as[String].collect().toSeq == Seq("A3"))
  }

  test("restart from checkpoint resumes without reprocessing committed batches") {
    val in = Files.createTempDirectory("cdc-restart-in")
    val ckpt = Files.createTempDirectory("cdc-restart-ckpt")
    val store = Files.createTempDirectory("cdc-restart-store")
    val catalog = CdcCatalog.fromPropertiesString("pk.customers=id\n")
    val sink = new ParquetTableStore(spark, store.toString)
    val (first, rest) = Fixtures.goldenSequence.splitAt(4)

    writeBatch(in, 0, first)
    val q1 = CdcPipeline.start(CdcPipeline.fileSource(spark, in.toString),
      catalog, Envelope.defaultRegistry, sink, ckpt.toString,
      trigger = Trigger.ProcessingTime(0))
    try q1.processAllAvailable() finally q1.stop()
    assert(sink.versions("customers").size == 1)

    // restart with the same checkpoint: only the new file is processed
    writeBatch(in, 1, rest)
    val q2 = CdcPipeline.start(CdcPipeline.fileSource(spark, in.toString),
      catalog, Envelope.defaultRegistry, sink, ckpt.toString,
      trigger = Trigger.ProcessingTime(0))
    try q2.processAllAvailable() finally q2.stop()

    import spark.implicits._
    val ids = sink.read("customers").get.select("id").as[Int].collect().toSet
    assert(ids == Set(1, 3))
    // batch0 was NOT re-applied after restart: exactly one new version
    assert(sink.versions("customers").size == 2)
    // time travel: the pre-restart version still shows the snapshot state
    val v0 = sink.readVersion("customers", sink.versions("customers").head)
    assert(v0.select("id").as[Int].collect().toSet == Set(1, 2, 3))
  }

  test("random op sequences: materialized state == sequential replay") {
    val rnd = new scala.util.Random(42)
    val catalog = CdcCatalog.fromPropertiesString("pk.customers=id\n")
    for (_ <- 1 to 5) {
      val keys = 1 to 4
      val ops = (0 until 30).map { i =>
        val id = keys(rnd.nextInt(keys.size))
        val op = Seq("c", "u", "d", "r")(rnd.nextInt(4))
        val fx =
          if (op == "d") Fixtures.customer("d", id, "X", "X", s"x$id@x",
            before = Some((id, "X", "X", s"x$id@x")))
          else Fixtures.customer(op, id, s"fn$i", "ln", s"e$i@x")
        (op, id, i, fx)
      }
      // sequential replay oracle: foldLeft over ops in offset order
      val expected = ops.foldLeft(Map.empty[Int, String]) {
        case (st, (op, id, i, _)) =>
          if (op == "d") st - id else st + (id -> s"fn$i")
      }
      val sink = new InMemorySink
      import spark.implicits._
      val df = ops.map { case (_, _, i, fx) =>
        ("mysql.app.customers", s"""{"id": x}""", fx, 0, i.toLong)
      }.toDF("topic", "key", "value", "partition", "offset")
      Materializer.applyBatch(df, catalog, Envelope.defaultRegistry, sink)
      val got = sink.state("customers").map { case (k, v) =>
        k.head.asInstanceOf[Int] -> v("first_name").asInstanceOf[String]
      }
      assert(got == expected)
    }
  }
}
