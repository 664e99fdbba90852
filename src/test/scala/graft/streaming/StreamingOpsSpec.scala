package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def t(s: String): Timestamp = Timestamp.valueOf(s)

  val evs: Seq[Ev] = Seq(
    Ev(0, t("2024-01-01 00:05:00"), 1, "view", 1.0),
    Ev(1, t("2024-01-01 00:20:00"), 1, "view", 2.0),
    Ev(2, t("2024-01-01 00:55:00"), 2, "purchase", 10.0),
    Ev(3, t("2024-01-01 01:10:00"), 1, "view", 3.0),
    Ev(4, t("2024-01-01 02:30:00"), 1, "view", 4.0), // >30min gap → new session
    Ev(5, t("2024-01-01 02:40:00"), 2, "purchase", 20.0))

  /** Run a streaming transform over the fixture events and collect the
    * complete/append result once all input is processed. */
  def runStream(fn: DataFrame => DataFrame, mode: String,
      input: Seq[Seq[Ev]] = Seq(evs)): DataFrame = {
    val ms = MemoryStream[Ev](spark)
    val name = s"out_${System.nanoTime()}"
    val q = fn(ms.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try {
      input.foreach { batch => ms.addData(batch); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
  }

  test("streamed tumbling agg equals batch aggregation") {
    val got = runStream(StreamingOps.tumblingAgg(_), "complete")
      .select("ws", "event_type", "n").as[(Timestamp, String, Long)].collect().toSet
    val expected = evs.toDF()
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(Timestamp, String, Long)].collect().toSet
    assert(got == expected)
  }

  test("streamed sliding agg equals batch sliding aggregation") {
    val got = runStream(StreamingOps.slidingAgg(_), "complete")
      .select("ws", "n").as[(Timestamp, Long)].collect().toSet
    val expected = evs.toDF()
      .groupBy(window(col("ts"), "1 hour", "30 minutes").getField("start").as("ws"))
      .agg(count(lit(1)).as("n"))
      .as[(Timestamp, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("streamed session windows match gap semantics across batches") {
    val batches = Seq(evs.take(3), evs.drop(3))
    val got = runStream(StreamingOps.sessionAgg(_), "complete", batches)
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // user 1: events 0,1 + 3 chain (gaps ≤30m: 00:05→00:20→(50m!)…)
    // gaps: 0→1 15m (merge), 1→3 50m (split), 3→4 80m (split)
    // user 1 sessions: {0,1}, {3}, {4}; user 2: {2}, {5}
    assert(got(1L) == Seq(1L, 1L, 2L))
    assert(got(2L) == Seq(1L, 1L))
  }

  test("watermark drops events later than the bound") {
    val ms = MemoryStream[Ev](spark)
    val q = StreamingOps.tumblingAgg(ms.toDF(), "30 minutes").writeStream
      .format("memory").queryName("late_out").outputMode("append").start()
    try {
      ms.addData(evs.filter(_.event_id <= 4)); q.processAllAvailable()
      // max ts now 02:30 → watermark 02:00 → a 00:xx event is too late:
      ms.addData(Seq(Ev(99, t("2024-01-01 00:01:00"), 3, "late", 9.9)))
      q.processAllAvailable()
      // advance watermark far enough to close and emit all windows
      ms.addData(Seq(Ev(100, t("2024-01-01 06:00:00"), 3, "flush", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val types = spark.table("late_out").select("event_type").as[String].collect().toSet
    assert(!types.contains("late"), "late event must be dropped by watermark")
    assert(types.contains("view"))
  }

  test("stream dedup suppresses redelivered events") {
    val dup = evs ++ evs.take(3) // redelivery of first three
    val got = runStream(StreamingOps.dedupStream(_), "append", Seq(dup))
    assert(got.count() == evs.size)
  }

  test("stream-stream join matches the batch join") {
    val p = MemoryStream[Ev](spark)
    val v = MemoryStream[Ev](spark)
    val joined = StreamingOps.purchaseViewJoin(
      p.toDF().filter(col("event_type") === "purchase"),
      v.toDF().filter(col("event_type") === "view"))
    val q = joined.writeStream.format("memory")
      .queryName("ssj_out").outputMode("append").start()
    try {
      p.addData(evs); v.addData(evs); q.processAllAvailable()
      // flush watermarks so in-window pairs are emitted
      p.addData(Seq(Ev(200, t("2024-01-01 10:00:00"), 9, "purchase", 0.0)))
      v.addData(Seq(Ev(201, t("2024-01-01 10:00:00"), 9, "view", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssj_out")
      .select("purchase_id", "view_id").as[(Long, Long)].collect().toSet
    val all = evs ++ Seq(Ev(200, t("2024-01-01 10:00:00"), 9, "purchase", 0.0),
      Ev(201, t("2024-01-01 10:00:00"), 9, "view", 0.0))
    val expected = (for {
      pp <- all if pp.event_type == "purchase"
      vv <- all if vv.event_type == "view" && vv.user_id == pp.user_id
      if !vv.ts.after(pp.ts) &&
        vv.ts.getTime >= pp.ts.getTime - 3600 * 1000
    } yield (pp.event_id, vv.event_id)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("left-outer stream-stream join: matched pairs emit like the " +
      "inner join, a late view still matches in a later batch, and a " +
      "never-matched purchase emits null-extended after expiry") {
    val p = MemoryStream[Ev](spark)
    val v = MemoryStream[Ev](spark)
    val joined = StreamingOps.purchaseViewJoinOuter(
      p.toDF().filter(col("event_type") === "purchase"),
      v.toDF().filter(col("event_type") === "view"))
    val name = s"ssjo_${System.nanoTime()}"
    val q = joined.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    // user 2 purchases at 00:55 with NO view ever (the dropped cohort);
    // user 1 purchases at 01:10 and the matching 00:40 view arrives in
    // a LATER batch (inside the watermark) — the match must still emit
    val purchase2 = Ev(10, t("2024-01-01 00:55:00"), 2, "purchase", 10.0)
    val purchase1 = Ev(11, t("2024-01-01 01:10:00"), 1, "purchase", 7.0)
    val lateView1 = Ev(12, t("2024-01-01 00:40:00"), 1, "view", 1.0)
    val flushP = Ev(90, t("2024-01-01 09:00:00"), 9, "purchase", 0.0)
    val flushV = Ev(91, t("2024-01-01 09:00:00"), 9, "view", 0.0)
    try {
      p.addData(Seq(purchase2, purchase1)); q.processAllAvailable()
      v.addData(Seq(lateView1)); q.processAllAvailable() // later batch
      // advance both watermarks far past every match window so the
      // never-matched purchase's null row can emit
      p.addData(Seq(flushP)); v.addData(Seq(flushV))
      q.processAllAvailable()
      // one more nudge: outer results emit on the NEXT state cleanup
      p.addData(Seq(Ev(92, t("2024-01-01 11:00:00"), 8, "purchase", 0.0)))
      v.addData(Seq(Ev(93, t("2024-01-01 11:00:00"), 8, "view", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name)
      .select(col("purchase_id"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"))
      .as[(Long, Long)].collect().toSet
    // the late view matched across batches
    assert(got.contains((11L, 12L)), s"late view must match: $got")
    // the never-matched purchase emitted exactly once, null-extended
    assert(got.contains((10L, -1L)), s"unmatched purchase must emit: $got")
    assert(spark.table(name).filter(col("purchase_id") === 10L).count() == 1L)
    // and it equals the batch LEFT join over the complete input
    val all = Seq(purchase2, purchase1, lateView1, flushP, flushV,
      Ev(92, t("2024-01-01 11:00:00"), 8, "purchase", 0.0),
      Ev(93, t("2024-01-01 11:00:00"), 8, "view", 0.0))
    val expected = (for {
      pp <- all if pp.event_type == "purchase"
    } yield {
      val vs = all.filter(vv => vv.event_type == "view" &&
        vv.user_id == pp.user_id && !vv.ts.after(pp.ts) &&
        vv.ts.getTime >= pp.ts.getTime - 3600 * 1000)
      if (vs.isEmpty) Set((pp.event_id, -1L))
      else vs.map(vv => (pp.event_id, vv.event_id)).toSet
    }).flatten.toSet
    assert(got == expected, s"stream != batch left join: $got vs $expected")
  }

  test("full-outer stream-stream join: both dangling cohorts emit " +
      "null-extended after expiry, late matches still pair, and the " +
      "result equals the batch full join over the complete input") {
    val p = MemoryStream[Ev](spark)
    val v = MemoryStream[Ev](spark)
    val joined = StreamingOps.purchaseViewJoinFull(
      p.toDF().filter(col("event_type") === "purchase"),
      v.toDF().filter(col("event_type") === "view"))
    val name = s"ssjf_${System.nanoTime()}"
    val q = joined.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    // user 2 purchases with NO view ever (left-dangling); user 3 views
    // with NO purchase ever (right-dangling); user 1's purchase matches
    // a view arriving in a LATER batch
    val purchase2 = Ev(10, t("2024-01-01 00:55:00"), 2, "purchase", 10.0)
    val purchase1 = Ev(11, t("2024-01-01 01:10:00"), 1, "purchase", 7.0)
    val view3 = Ev(13, t("2024-01-01 00:50:00"), 3, "view", 2.0)
    val lateView1 = Ev(12, t("2024-01-01 00:40:00"), 1, "view", 1.0)
    val flushP = Ev(90, t("2024-01-01 09:00:00"), 9, "purchase", 0.0)
    val flushV = Ev(91, t("2024-01-01 09:00:00"), 9, "view", 0.0)
    val nudgeP = Ev(92, t("2024-01-01 11:00:00"), 8, "purchase", 0.0)
    val nudgeV = Ev(93, t("2024-01-01 11:00:00"), 8, "view", 0.0)
    try {
      p.addData(Seq(purchase2, purchase1)); v.addData(Seq(view3))
      q.processAllAvailable()
      v.addData(Seq(lateView1)); q.processAllAvailable() // later batch
      p.addData(Seq(flushP)); v.addData(Seq(flushV)); q.processAllAvailable()
      p.addData(Seq(nudgeP)); v.addData(Seq(nudgeV)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name)
      .select(coalesce(col("purchase_id"), lit(-1L)),
        coalesce(col("view_id"), lit(-1L)), col("user_id"))
      .as[(Long, Long, Long)].collect().toSet
    // late view matched across batches
    assert(got.contains((11L, 12L, 1L)), s"late view must match: $got")
    // never-matched purchase emitted once, null-extended
    assert(got.contains((10L, -1L, 2L)), s"unmatched purchase: $got")
    // never-matched VIEW emitted once, null-extended — the cohort the
    // left join cannot produce — with its user carried by the coalesce
    assert(got.contains((-1L, 13L, 3L)), s"unmatched view: $got")
    assert(spark.table(name).filter(col("view_id") === 13L).count() == 1L)
    // equality with the batch FULL join over the complete input
    val all = Seq(purchase2, purchase1, view3, lateView1,
      flushP, flushV, nudgeP, nudgeV)
    val ps = all.filter(_.event_type == "purchase")
    val vs = all.filter(_.event_type == "view")
    def admissible(pp: Ev, vv: Ev): Boolean =
      vv.user_id == pp.user_id && !vv.ts.after(pp.ts) &&
        vv.ts.getTime >= pp.ts.getTime - 3600 * 1000
    val matched = for (pp <- ps; vv <- vs if admissible(pp, vv))
      yield (pp.event_id, vv.event_id, pp.user_id)
    val leftDangle = ps.filterNot(pp => vs.exists(vv => admissible(pp, vv)))
      .map(pp => (pp.event_id, -1L, pp.user_id))
    val rightDangle = vs.filterNot(vv => ps.exists(pp => admissible(pp, vv)))
      .map(vv => (-1L, vv.event_id, vv.user_id))
    val expected = (matched ++ leftDangle ++ rightDangle).toSet
    assert(got == expected, s"stream != batch full join: $got vs $expected")
  }

  test("right-outer stream-stream join: the view-side dangling cohort " +
      "emits null-extended, the purchase-side cohort does NOT, and the " +
      "result equals the batch right join over the complete input") {
    val p = MemoryStream[Ev](spark)
    val v = MemoryStream[Ev](spark)
    val joined = StreamingOps.purchaseViewJoinRight(
      p.toDF().filter(col("event_type") === "purchase"),
      v.toDF().filter(col("event_type") === "view"))
    val name = s"ssjr_${System.nanoTime()}"
    val q = joined.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    // user 2 purchases with NO view ever (left-dangling — must NOT
    // emit); user 3 views with NO purchase ever (right-dangling — must
    // emit null-extended); user 1's purchase matches a later-batch view
    val purchase2 = Ev(10, t("2024-01-01 00:55:00"), 2, "purchase", 10.0)
    val purchase1 = Ev(11, t("2024-01-01 01:10:00"), 1, "purchase", 7.0)
    val view3 = Ev(13, t("2024-01-01 00:50:00"), 3, "view", 2.0)
    val lateView1 = Ev(12, t("2024-01-01 00:40:00"), 1, "view", 1.0)
    val flushP = Ev(90, t("2024-01-01 09:00:00"), 9, "purchase", 0.0)
    val flushV = Ev(91, t("2024-01-01 09:00:00"), 9, "view", 0.0)
    val nudgeP = Ev(92, t("2024-01-01 11:00:00"), 8, "purchase", 0.0)
    val nudgeV = Ev(93, t("2024-01-01 11:00:00"), 8, "view", 0.0)
    try {
      p.addData(Seq(purchase2, purchase1)); v.addData(Seq(view3))
      q.processAllAvailable()
      v.addData(Seq(lateView1)); q.processAllAvailable() // later batch
      p.addData(Seq(flushP)); v.addData(Seq(flushV)); q.processAllAvailable()
      p.addData(Seq(nudgeP)); v.addData(Seq(nudgeV)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name)
      .select(coalesce(col("purchase_id"), lit(-1L)),
        coalesce(col("view_id"), lit(-1L)), col("user_id"))
      .as[(Long, Long, Long)].collect().toSet
    // late view matched across batches
    assert(got.contains((11L, 12L, 1L)), s"late view must match: $got")
    // never-matched VIEW emitted once, null-extended, user carried
    assert(got.contains((-1L, 13L, 3L)), s"unmatched view: $got")
    assert(spark.table(name).filter(col("view_id") === 13L).count() == 1L)
    // never-matched PURCHASE suppressed — the right join's defining cut
    assert(!got.exists(_._1 == 10L), s"unmatched purchase must not emit: $got")
    // equality with the batch RIGHT join over the complete input
    val all = Seq(purchase2, purchase1, view3, lateView1,
      flushP, flushV, nudgeP, nudgeV)
    val ps = all.filter(_.event_type == "purchase")
    val vs = all.filter(_.event_type == "view")
    def admissible(pp: Ev, vv: Ev): Boolean =
      vv.user_id == pp.user_id && !vv.ts.after(pp.ts) &&
        vv.ts.getTime >= pp.ts.getTime - 3600 * 1000
    val matched = for (pp <- ps; vv <- vs if admissible(pp, vv))
      yield (pp.event_id, vv.event_id, pp.user_id)
    val rightDangle = vs.filterNot(vv => ps.exists(pp => admissible(pp, vv)))
      .map(vv => (-1L, vv.event_id, vv.user_id))
    val expected = (matched ++ rightDangle).toSet
    assert(got == expected, s"stream != batch right join: $got vs $expected")
  }

  test("streamed sessions over the real corpus equal batch sessionization") {
    val sfDir = "/root/testdata/sf0.001"
    val corpus = graft.table(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val (first, second) = corpus.splitAt(corpus.length / 2)
    val got = runStream(StreamingOps.sessionAgg(_), "complete",
      Seq(first.toSeq, second.toSeq))
      .select("user_id", "session_start", "n_events")
      .as[(Long, Timestamp, Long)].collect().toSet
    val expected = corpus.toSeq.toDF()
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "n_events")
      .as[(Long, Timestamp, Long)].collect().toSet
    assert(got == expected)
    assert(got.size > 100) // real corpus: many sessions
  }

  test("running counts update across micro-batches") {
    val got = runStream(StreamingOps.runningCounts(_), "complete",
      Seq(evs.take(3), evs.drop(3)))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 4L, "purchase" -> 2L))
  }
}
