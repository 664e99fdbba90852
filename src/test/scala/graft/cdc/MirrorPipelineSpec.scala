package graft.cdc

import graft.TestSpark
import graft.cdc.IncrementalView.ViewDef
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** MirrorPipeline: CDC envelope stream → mirrored store → incremental
  * views advanced per micro-batch from the recorded change feed. The
  * invariant: after every batch the view equals a recompute of the
  * mirror; a replayed batch (at-least-once restart) changes nothing. */
class MirrorPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def esc(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def writeBatch(dir: Path, n: Int,
      rows: Seq[(String, String, String, Int, Long)]): Unit = {
    val lines = rows.map { case (topic, key, value, part, off) =>
      val v = if (value == null) "null" else esc(value)
      s"""{"topic": ${esc(topic)}, "key": ${esc(key)}, "value": $v,""" +
        s""""partition": $part, "offset": $off}"""
    }
    Files.write(dir.resolve(s"batch_$n.json"), lines.mkString("\n").getBytes)
  }

  private val vdef = ViewDef(Seq("last_name"), Seq.empty)
  private val viewSpec = MirrorPipeline.ViewSpec(
    "customers", Seq("id"), "by_last", vdef)
  // min/max view riding the same pipeline: bufK=2 so the rename-move
  // batch DRAINS Walker's buffer and exercises the per-group rebuild
  // through the streaming path, not just the unit specs
  private val mmVdef = ViewDef(Seq("last_name"), Seq.empty,
    mins = Seq("id"), maxs = Seq("id"), bufK = 2)
  private val mmViewSpec = MirrorPipeline.ViewSpec(
    "customers", Seq("id"), "ids_by_last", mmVdef)
  // count-distinct cascade through the streaming path: the rename-move
  // batch retires Thomas's last 'George' occurrence
  private val ndVdef = ViewDef(Seq("last_name"), Seq.empty,
    distincts = Seq("first_name"))
  private val ndViewSpec = MirrorPipeline.ViewSpec(
    "customers", Seq("id"), "firsts_by_last", ndVdef)

  private def assertConsistent(store: ParquetTableStore): Unit = {
    val expected = IncrementalView.compute(store.read("customers").get, vdef)
      .select("last_name", "n")
    val got = store.read("by_last").get.select("last_name", "n")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      s"view != mirror recompute: ${got.collect().toSeq} vs " +
        s"${expected.collect().toSeq}")
    val expMm = IncrementalView.compute(store.read("customers").get, mmVdef)
      .selectExpr("last_name", "n", "element_at(minb_id, 1)",
        "element_at(maxb_id, 1)")
    val gotMm = IncrementalView.read(store, "ids_by_last", mmVdef).get
      .selectExpr("last_name", "n", "min_id", "max_id")
    assert(gotMm.except(expMm).isEmpty && expMm.except(gotMm).isEmpty,
      s"mm view != mirror recompute: ${gotMm.collect().toSeq} vs " +
        s"${expMm.collect().toSeq}")
    val expNd = store.read("customers").get.groupBy("last_name")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("first_name")).as("nd"))
    val gotNd = IncrementalView.read(store, "firsts_by_last", ndVdef).get
      .selectExpr("last_name", "n", "nd_first_name")
    assert(gotNd.except(expNd).isEmpty && expNd.except(gotNd).isEmpty,
      s"nd view != mirror recompute: ${gotNd.collect().toSeq} vs " +
        s"${expNd.collect().toSeq}")
  }

  test("views track the mirror per batch, and survive a replay restart") {
    val in = Files.createTempDirectory("mirror-in")
    val ckpt = Files.createTempDirectory("mirror-ckpt")
    // explicit file: URI root: the full mirror+IVM composition rides
    // the store's Hadoop-FS path end to end
    val storeRoot = "file:" + Files.createTempDirectory("mirror-store")
    val catalog = CdcCatalog.fromPropertiesString("pk.customers=id\n")
    val store = new ParquetTableStore(spark, storeRoot)

    writeBatch(in, 0, Seq(
      Fixtures.raw(Fixtures.customer("r", 1, "Sally", "Thomas", "s@x"), 0),
      Fixtures.raw(Fixtures.customer("r", 2, "George", "Thomas", "g@x"), 1),
      Fixtures.raw(Fixtures.customer("r", 3, "Ed", "Walker", "e@x"), 2)))
    val q = MirrorPipeline.start(
      CdcPipeline.fileSource(spark, in.toString), catalog,
      Envelope.defaultRegistry, storeRoot.toString, Seq(viewSpec, mmViewSpec, ndViewSpec),
      ckpt.toString,
      statsColumns = Map("customers" -> Seq("last_name")))
    try {
      q.processAllAvailable()
      assertConsistent(store)
      assert(store.read("by_last").get
        .select("last_name", "n").as[(String, Long)].collect().toMap ==
        Map("Thomas" -> 2L, "Walker" -> 1L))

      // batch 2: rename-move + delete
      writeBatch(in, 1, Seq(
        Fixtures.raw(Fixtures.customer("u", 2, "George", "Walker", "g@x"), 3),
        Fixtures.raw(Fixtures.customer("d", 3, "Ed", "Walker", "e@x",
          before = Some((3, "Ed", "Walker", "e@x"))), 4)))
      q.processAllAvailable()
      assertConsistent(store)
      assert(store.read("by_last").get
        .select("last_name", "n").as[(String, Long)].collect().toMap ==
        Map("Thomas" -> 1L, "Walker" -> 1L))
      // the rename-move drained Walker's bufK=2 buffer (3 spliced out,
      // 2 arrived against an empty prefix) — the rebuild must have
      // served the fresh extremes through the streaming path
      val mm = IncrementalView.read(store, "ids_by_last", mmVdef).get
        .selectExpr("last_name", "CAST(min_id AS BIGINT)",
          "CAST(max_id AS BIGINT)")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(mm == Map("Thomas" -> ((1L, 1L)), "Walker" -> ((2L, 2L))), mm)
    } finally q.stop()

    // the live mirror doubles as the serving path: point lookups ride
    // the key-hash buckets, attribute probes the zone-map bloom —
    // equality vs the full filter and FEWER buckets opened, while the
    // stream is the only writer the store has ever seen
    val statsStore = new ParquetTableStore(spark, storeRoot,
      statsColumns = Map("customers" -> Seq("last_name")))
    // probe keys carry the TABLE'S types (id is INT in the mirrored
    // schema): a long here would hash to a different bucket and read
    // nothing — the contract readKeys' scaladoc pins
    val (hit, keyRep) = statsStore.readKeysPruned("customers", Seq("id"),
      Seq(2).toDF("id")).get
    assert(hit.select("first_name").as[String].collect().toSeq ==
      Seq("George"))
    assert(keyRep.bucketsKept <= 1, keyRep)
    val (walkers, eqRep) = statsStore.readEqPruned(
      "customers", "last_name", "Walker").get
    assert(walkers.select("id").as[Long].collect().toSeq == Seq(2L))
    // exactly the one bucket whose bloom holds 'Walker' — the other
    // live bucket's bloom (Thomas only) proves its absence
    assert(eqRep.bucketsKept == 1, eqRep)

    // restart WITHOUT the checkpoint: both files replay (at-least-once
    // redelivery) — identical content re-merges, the change feeds net
    // to zero, and the views stay exactly consistent
    val ckpt2 = Files.createTempDirectory("mirror-ckpt2")
    val q2 = MirrorPipeline.start(
      CdcPipeline.fileSource(spark, in.toString), catalog,
      Envelope.defaultRegistry, storeRoot.toString, Seq(viewSpec, mmViewSpec, ndViewSpec),
      ckpt2.toString,
      statsColumns = Map("customers" -> Seq("last_name")))
    try {
      q2.processAllAvailable()
      assertConsistent(store)
      assert(store.read("by_last").get
        .select("last_name", "n").as[(String, Long)].collect().toMap ==
        Map("Thomas" -> 1L, "Walker" -> 1L))
    } finally q2.stop()
  }
}
