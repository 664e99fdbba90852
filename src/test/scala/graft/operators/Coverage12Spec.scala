package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala derivations for the Coverage12 operators:
  * the two-point CDC state diff (last-writer-wins semantics at both
  * timestamps, derived with an explicit sort instead of the engine's
  * single-aggregation struct-max trick) and per-document character
  * entropy (recomputed with a mutable counter map instead of the
  * higher-order-function pipeline).
  */
class Coverage12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("q_state_delta == explicit two-snapshot diff") {
    // canonical "yyyy-MM-dd HH:mm:ss[.f]" strings sort like the timestamps
    val t1 = "2024-01-08 00:00:00"
    val t2 = "2024-01-15 00:00:00"
    val ev = graft.table(spark, sfDir, "events")
      .selectExpr("user_id", "cast(ts as string) as tss", "event_id", "value")
      .as[(Long, String, Long, Double)].collect()

    def latest(upTo: String, rows: Array[(Long, String, Long, Double)]) =
      rows.filter(_._2 <= upTo)
        .groupBy(_._1)
        .view.mapValues(_.maxBy(r => (r._2, r._3))).toMap

    val s1 = latest(t1, ev)
    val s2 = latest(t2, ev)
    val expect = s2.collect {
      case (uid, cur) if cur._2 > t1 =>
        val old = s1.get(uid)
        (uid, if (old.isEmpty) "new" else "changed",
          old.map(_._3), old.map(_._4), cur._3, cur._4)
    }.toSet

    val got = graft.SparkEntry.queries("q_state_delta")(spark, sfDir)
      .as[(Long, String, Option[Long], Option[Double], Long, Double)]
      .collect().toSet
    assert(got == expect)
    assert(got.nonEmpty)
    // every 'new' row has null old state, every 'changed' row has one
    assert(got.forall { case (_, ch, oe, ov, _, _) =>
      if (ch == "new") oe.isEmpty && ov.isEmpty else oe.nonEmpty && ov.nonEmpty
    })
  }

  test("q_dedup_threshold_curve == plain-Scala shingle jaccard counts") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val sets = docs.map { case (id, text) =>
      val w = text.trim.split(" ")
      id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val jac = for {
      (i, si) <- sets; (j, sj) <- sets if j > i
      inter = (si & sj).size if inter > 0
    } yield BigDecimal(inter.toDouble / (si.size + sj.size - inter))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ths = Seq(0.7, 0.75, 0.8, 0.85, 0.9, 0.95)
    val expect = ths.map(t => t -> jac.count(_ >= t).toLong).toMap
    val got = graft.SparkEntry.queries("q_dedup_threshold_curve")(spark, sfDir)
      .as[(Double, Long)].collect().toMap
    assert(got == expect)
    // the curve is monotone non-increasing in the threshold
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
  }

  test("q_cdc_op_stats == plain-Scala churn histogram") {
    val ev = graft.table(spark, sfDir, "events")
      .select("user_id").as[Long].collect()
    val perKey = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = perKey.values.groupBy(identity).map { case (n, ks) =>
      val share = BigDecimal(n * ks.size.toDouble / ev.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (n, ks.size.toLong, share)
    }.toSet
    val got = graft.SparkEntry.queries("q_cdc_op_stats")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expect)
    // histogram masses add back up to the full corpus
    assert(got.map { case (n, k, _) => n * k }.sum == ev.length)
  }

  test("q_text_entropy == counter-map derivation") {
    val docs = graft.table(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expect = docs.map { case (id, text) =>
      val cs = text.split("").filter(_.nonEmpty)
      val counts = cs.groupBy(identity).view.mapValues(_.length)
        .toSeq.sortBy(_._1) // pinned order: sorted distinct char
      val n = cs.length.toDouble
      val sum = counts.foldLeft(0.0) { case (a, (_, c)) =>
        a + (c / n) * math.log(c / n)
      }
      val ent = BigDecimal(0.0 - sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, cs.length.toLong, counts.size.toLong, ent)
    }.toSet
    val got = graft.SparkEntry.queries("q_text_entropy")(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expect)
    // entropy is non-negative and bounded by log2 -> ln of alphabet size
    assert(got.forall { case (_, _, d, e) => e >= 0.0 && e <= math.log(d.toDouble) + 1e-9 })
  }
}
