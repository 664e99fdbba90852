package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** `GridPercentile` — the live-percentile read edge over a count-only
  * incremental view. Contract: after ANY chain of refreshes, the
  * percentiles read off the maintained histogram equal a brute-force
  * sorted scan of the CURRENT base snapshot (the same ceil-threshold
  * arithmetic as q_grid_percentile's oracle), including groups that
  * churn through empty. */
class GridPercentileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val group = Seq("src")
  private val vdef = GridPercentile.viewDef(group, "bucket")
  private val pcts = Seq(50L, 90L, 99L)

  private def freshStore() = new ParquetTableStore(spark,
    "file:" + java.nio.file.Files.createTempDirectory("graft-gp"),
    nBuckets = 8)

  private def rows(t: Seq[(Int, String, Long)]): DataFrame =
    t.toDF("id", "src", "bucket")

  private def keys(ids: Seq[Int]): DataFrame = ids.toDF("id")

  /** Brute force: per (src, p), the bucket of the ceil(p·n/100)-th
    * smallest value, edge = bucket·width. */
  private def brute(base: Seq[(Int, String, Long)], width: Long)
      : Set[(String, Long, Long, Long)] =
    base.groupBy(_._2).flatMap { case (src, rs) =>
      val bs = rs.map(_._3).sorted
      val n = bs.size.toLong
      pcts.map { p =>
        val thresh = (p * n + 99) / 100
        (src, p, bs((thresh - 1).toInt) * width, n)
      }
    }.toSet

  private def readPcts(store: ParquetTableStore, width: Long = 1L)
      : Set[(String, Long, Long, Long)] =
    GridPercentile.read(store, "view", group, "bucket", pcts, width).get
      .select("src", "p", "edge", "n")
      .as[(String, Long, Long, Long)].collect().toSet

  test("percentiles off the live view equal a sorted-scan brute force " +
      "across 25 seeded churn rounds") {
    val store = freshStore()
    val rnd = new Random(4242)
    var live = Map.empty[Int, (String, Long)]
    var nextId = 0
    val srcs = Vector("a", "b", "c")

    def applyRound(): Unit = {
      val ups = scala.collection.mutable.ListBuffer.empty[(Int, String, Long)]
      val dels = scala.collection.mutable.ListBuffer.empty[Int]
      // inserts
      (0 until (3 + rnd.nextInt(6))).foreach { _ =>
        val r = (nextId, srcs(rnd.nextInt(srcs.size)), rnd.nextInt(16).toLong)
        ups += r; live += r._1 -> (r._2, r._3); nextId += 1
      }
      // updates (move bucket and/or group) — one image per PK per batch
      val ids = live.keys.toVector.filterNot(id => ups.exists(_._1 == id))
      (0 until math.min(ids.size, rnd.nextInt(4))).foreach { _ =>
        val id = ids(rnd.nextInt(ids.size))
        if (!ups.exists(_._1 == id)) {
          val r = (id, srcs(rnd.nextInt(srcs.size)), rnd.nextInt(16).toLong)
          ups += r; live += id -> (r._2, r._3)
        }
      }
      // deletes
      (0 until math.min(live.size, rnd.nextInt(3))).foreach { _ =>
        val vs = live.keys.toVector
        val id = vs(rnd.nextInt(vs.size))
        if (!ups.exists(_._1 == id)) { dels += id; live -= id }
      }
      store.applyChanges("base", Seq("id"), rows(ups.toSeq), keys(dels.toSeq))
    }

    applyRound()
    var from = IncrementalView.initialize(store, "base", "view", vdef)
    (1 to 25).foreach { round =>
      applyRound()
      val to = store.versions("base").last
      IncrementalView.refresh(store, "base", Seq("id"), "view", vdef,
        from, to)
      from = to
      val expected = brute(
        live.toSeq.map { case (id, (s, b)) => (id, s, b) }, 1L)
      assert(readPcts(store) == expected, s"diverged at round $round")
    }
  }

  test("a group that empties disappears; width scales the edge") {
    val store = freshStore()
    store.applyChanges("base", Seq("id"),
      rows(Seq((1, "a", 3L), (2, "a", 7L), (3, "b", 1L))), keys(Nil))
    val v1 = IncrementalView.initialize(store, "base", "view", vdef)
    assert(readPcts(store, width = 16L) ==
      brute(Seq((1, "a", 3L), (2, "a", 7L), (3, "b", 1L)), 16L))

    // empty out b
    store.applyChanges("base", Seq("id"), rows(Nil), keys(Seq(3)))
    val v2 = store.versions("base").last
    IncrementalView.refresh(store, "base", Seq("id"), "view", vdef, v1, v2)
    val got = readPcts(store)
    assert(!got.exists(_._1 == "b"))
    assert(got == brute(Seq((1, "a", 3L), (2, "a", 7L)), 1L))
  }

  test("read-edge arithmetic matches the batch query on the sf corpus") {
    // the same histogram the batch query aggregates, fed through the
    // read edge, must reproduce q_grid_percentile exactly
    import org.apache.spark.sql.functions._
    val docs = graft.table(spark, "/root/testdata/sf0.001", "documents")
    val hist = docs
      .select(col("source").as("src"),
        least(expr("n_chars div 16"), lit(63L)).as("bucket"))
      .groupBy("src", "bucket").agg(count(lit(1)).as("n"))
    val viaEdge = GridPercentile
      .percentiles(hist, group, "bucket", pcts, width = 16L)
      .select(col("src").as("source"), col("p"), col("edge"), col("n"))
    val batch = graft.SparkEntry.queries("q_grid_percentile")(
      spark, "/root/testdata/sf0.001")
    assert(viaEdge.except(batch).isEmpty && batch.except(viaEdge).isEmpty)
  }
}
