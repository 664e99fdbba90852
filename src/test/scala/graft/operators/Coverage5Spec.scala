package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-5 coverage queries beyond the DuckDB
  * hash-gate: the sketch-candidated heavy hitters must equal the exact
  * formulation (and actually plan the sketch aggregate), and the
  * trained-IVF search must at least match the untrained index's recall
  * on a corpus whose density the %-sample seeds miss. */
class Coverage5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sfDir = "/root/testdata/sf0.001"

  test("sketch heavy hitters == exact heavy hitters, row for row") {
    val exact = graft.SparkEntry.queries("q_heavy_hitters")(spark, sfDir)
    val sketched = graft.SparkEntry.queries("q_heavy_hitters_sketch")(spark, sfDir)
    assert(sketched.exceptAll(exact).isEmpty && exact.exceptAll(sketched).isEmpty)
    assert(sketched.count() > 0)
  }

  test("the sketch query's plan actually contains the freq_sketch aggregate") {
    val plan = graft.SparkEntry.queries("q_heavy_hitters_sketch")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("freq_sketch"),
      s"candidate stage must be the Misra-Gries aggregate:\n$plan")
  }

  test("trained-IVF query equals one KMeansOps.lloyd step + search") {
    // the unrolled lazy Lloyd step in the query must be the trainer's
    // arithmetic — pin them against each other
    val fromQuery = graft.SparkEntry.queries("q_sim_ann_ivf_trained")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val e = graft.table(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val (cents, assigned) = KMeansOps.lloyd(e, 97, 1)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val fromTrainer = SimilarityOps.ivfSearch(assigned, cents, q, 10, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(fromQuery === fromTrainer)
    assert(fromQuery.nonEmpty)
  }

  test("retention day-0 cells equal cohort sizes (everyone is active on their first day)") {
    val ret = graft.SparkEntry.queries("q_retention")(spark, sfDir)
    val act = graft.table(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = act.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      .groupBy("cohort_day").agg(count(lit(1)).as("expected"))
    val day0 = ret.filter(col("days_since") === 0)
      .select(col("cohort_day"), col("n_users"))
    val mismatch = day0.join(cohorts, "cohort_day")
      .filter(col("n_users") =!= col("expected"))
    assert(mismatch.isEmpty)
    assert(day0.count() === cohorts.count())
  }

  test("co-occurrence lift: counts are bounded by document frequencies") {
    // n_ab can never exceed either term's doc frequency, and lift must
    // be positive — the structural invariants of the lift definition
    val lift = graft.SparkEntry.queries("q_cooccur_lift")(spark, sfDir)
    val hh = graft.SparkEntry.queries("q_heavy_hitters")(spark, sfDir)
      .select(col("term")).collect().map(_.getString(0)).toSet
    val rows = lift.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(hh.contains(r.getString(0)) && hh.contains(r.getString(1)),
        s"pair outside the heavy-hitter vocabulary: $r")
      assert(r.getLong(2) > 0 && r.getDouble(3) > 0, s"bad counts: $r")
    }
  }

  test("containment dominates jaccard: every high-jaccard pair is a containment pair") {
    // |A∩B|/min ≥ |A∩B|/union, so the jaccard output at ≥0.9 must be a
    // subset of the containment output at the same threshold
    val jac = graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sfDir)
      .filter(col("jaccard") >= 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cont = graft.SparkEntry.queries("q_dedup_containment")(spark, sfDir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.nonEmpty && jac.subsetOf(cont),
      s"missing: ${jac.diff(cont).take(5)}")
  }

  test("containment flags a truncation duplicate that jaccard misses") {
    val long = (1 to 200).map(i => s"w$i").mkString(" ")
    val short = (1 to 40).map(i => s"w$i").mkString(" ") // strict prefix
    val docs = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val sh = DedupOps.shingles(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    val jac = DedupOps.jaccardPairs(DedupOps.shingles(docs), 0.8)
    assert(jac.isEmpty, "a 20% prefix must be below jaccard 0.8")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("b.doc_id") > col("a.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    val cont = inter
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .select(round(col("inter").cast("double") / least(col("n1"), col("n2")), 6)
        .as("containment"))
      .head().getDouble(0)
    assert(cont === 1.0, s"prefix containment must be 1.0, got $cont")
  }

  test("MAD flagging resists the masking that breaks mean/stddev fences") {
    // 50 inliers + one extreme outlier: the outlier inflates the stddev
    // enough that a z-fence barely flags it, while the median/MAD fence
    // flags it with a huge margin AND leaves every inlier unflagged
    val vals = (1 to 50).map(i => ("a", 100.0 + (i % 11) - 5)) :+ (("a", 100000.0))
    val ev = vals.toDF("event_type", "value")
    val med = ev.groupBy("event_type").agg(expr("percentile(value, 0.5)").as("m"))
    val mad = ev.join(med, "event_type").groupBy(col("event_type"), col("m"))
      .agg(expr("percentile(abs(value - m), 0.5)").as("mad"))
    val flagged = ev.join(mad, "event_type")
      .withColumn("rz", round((col("value") - col("m")) / (lit(1.4826) * col("mad")), 6))
      .filter(abs(col("rz")) > 3.5)
      .select("value").collect().map(_.getDouble(0))
    assert(flagged.toSeq === Seq(100000.0),
      s"exactly the planted outlier must be flagged, got ${flagged.toSeq}")
  }

  test("trained IVF recall >= untrained IVF recall where seeds miss the density") {
    // 4 tight planted clusters, but the %25 seed sample puts THREE seeds
    // inside cluster 0 and none near clusters 2/3 — the shape training
    // exists to fix. Ids 0..24 cluster 0, 25..49 cluster 1, etc.; seeds
    // are ids 0, 25, 50, 75 → actually one per cluster, so skew the ids:
    // clusters sized 60/20/10/10 with seeds %25 (ids 0,25,50 in cluster
    // 0's span, 75 in cluster 2's).
    val rnd = new scala.util.Random(42)
    val centers = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val sizes = Seq(60, 20, 10, 10)
    val rows = sizes.zipWithIndex.flatMap { case (n, c) =>
      (0 until n).map { i =>
        val v = centers(c).map(x => x + 0.08f * rnd.nextGaussian().toFloat)
        (sizes.take(c).sum.toLong + i, v.toSeq)
      }
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id").isin(5L, 65L, 85L, 95L))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    val brute = SimilarityOps.bruteForceTopK(corpus, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recall(cents: org.apache.spark.sql.DataFrame,
        assigned: org.apache.spark.sql.DataFrame): Double = {
      val found = SimilarityOps.ivfSearch(assigned, cents, queries, 5, 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.intersect(found).size.toDouble / brute.size
    }

    val untrainedCents = corpus.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val untrained = recall(untrainedCents, SimilarityOps.ivfAssign(corpus, 25))
    val (tc, ta) = KMeansOps.lloyd(corpus, 25, 3)
    val trained = recall(tc, ta)
    assert(trained >= untrained,
      s"training must not lose recall: untrained=$untrained trained=$trained")
    info(s"recall@5 nprobe=1: untrained=$untrained trained=$trained")
  }
}
