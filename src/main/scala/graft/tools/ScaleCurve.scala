package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-time SCALE CURVES for the flagship query families (round-13
  * verdict #7): the 100×-scale claims rest on plan shapes plus
  * per-operator stress tools; this measures the composed flagships
  * end-to-end on synthetic corpora at 1×/4×/16× and prints the growth
  * ratios — near-linear (ratio_16 ≈ 16 against a 16× corpus) is the
  * pass condition; a super-linear family would show ratio_16 ≫ 16.
  *
  * Corpus synthesis (deterministic, hash-arithmetic — no RNG state):
  *  - documents: vocabulary shared with the test corpus (so the
  *    retrieval queries' term filters hit), 30–89 tokens per doc,
  *    every id ≡ 1 (mod 10) doc a NEAR-DUP of its predecessor (same
  *    base text + one extra token) so the dedup families have real
  *    work at every scale; lang/source/n_chars shaped like testdata;
  *  - embeddings: 64-dim hash-derived floats, label = id mod 10.
  *  - the fixed TPC-H side tables are copied from sf0.001 unscaled
  *    (none of the curved queries is bound by them).
  *
  * Caveats the numbers carry (printed, not hidden): local[32] wall
  * time at these sizes includes a per-job scheduling floor, so ratios
  * UNDER the data ratio mean the 1× run is floor-dominated, not that
  * the query is sublinear; the BPE trainer in q_corpus_prep_tokenized
  * runs a fixed merge count (its corpus passes scale linearly but the
  * job count is constant).
  */
object ScaleCurve {

  private val Vocab = Seq("hash", "join", "filter", "sort", "merge",
    "scan", "row", "batch", "key", "agg", "slow", "fast", "table",
    "value", "part", "a", "the", "line", "window", "spark", "order",
    "data", "column", "small", "query", "big", "group", "stream",
    "customer", "vector")

  private val Queries = Seq(
    // corpus-prep family
    "q_corpus_prep", "q_corpus_prep_tokenized",
    // LSH / near-dup family
    "q_dedup_minhash_lsh", "q_dedup_simhash", "q_dedup_containment_capped",
    // substring family
    "q_dedup_substring",
    // retrieval family
    "q_bm25", "q_sim_ann_ivfsq8", "q_sim_ann_pq", "q_hybrid_retrieval")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-curve")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val baseDocs = sys.env.getOrElse("SPARK_GRAFT_CURVE_DOCS", "1000").toLong
    val baseVecs = sys.env.getOrElse("SPARK_GRAFT_CURVE_VECS", "500").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val sideDir = sys.env.getOrElse("SPARK_GRAFT_CURVE_SIDE",
      "/root/testdata/sf0.001")
    val scales = Seq(1, 4, 16)

    val vlit = Vocab.map(w => s"'$w'").mkString("array(", ", ", ")")

    def synth(dir: String, nDocs: Long, nVecs: Long): Unit = {
      // near-dup plant: id ≡ 1 (mod 10) reuses the PREVIOUS id's base
      // text plus one extra token — same family at every scale
      spark.range(nDocs)
        .withColumn("gid", when(col("id") % 10 === 1, col("id") - 1)
          .otherwise(col("id")))
        .withColumn("base", expr(
          s"""array_join(transform(
             |  sequence(0, 29 + CAST(pmod(hash(gid), 60) AS INT)),
             |  j -> element_at($vlit,
             |         CAST(pmod(hash(gid, j), ${Vocab.size}) AS INT) + 1)),
             | ' ')""".stripMargin))
        .select(col("id").as("doc_id"),
          when(col("id") % 10 === 1,
            concat(col("base"), lit(" extra"), col("id")))
            .otherwise(col("base")).as("text"),
          when(col("id") % 17 === 0, lit("de")).otherwise(lit("en")).as("lang"),
          concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
        .withColumn("n_chars", length(col("text")))
        .coalesce(4)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      spark.range(nVecs)
        .select(col("id").as("vec_id"),
          expr("""CAST(transform(sequence(0, 63),
            | j -> pmod(hash(id, j), 2000) / 1000.0 - 1.0)
            | AS ARRAY<FLOAT>)""".stripMargin).as("embedding"),
          pmod(col("id"), lit(10)).cast("int").as("label"))
        .coalesce(2)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // fixed-size side tables (none of the curved queries is bound
      // by them; presence keeps every query runnable)
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events").foreach { t =>
        val src = java.nio.file.Paths.get(s"$sideDir/$t.parquet")
        if (java.nio.file.Files.exists(src))
          java.nio.file.Files.copy(src,
            java.nio.file.Paths.get(s"$dir/$t.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    def noop(): Double = {
      val t0 = System.nanoTime(); spark.range(1).count()
      (System.nanoTime() - t0) / 1e9
    }

    val root = java.nio.file.Files.createTempDirectory("graft-curve").toString
    val dirs = scales.map { s =>
      val d = s"$root/scale$s"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      synth(d, baseDocs * s, baseVecs * s)
      s -> d
    }.toMap

    // SELF-DEFENDING measurements (the CDC-gate lesson): every
    // (query, scale) sample carries its own noop canary, and a sample
    // whose canary reads a loaded window (> noopGate) is retried up to
    // maxTries times — the recorded value is the min over samples
    // whose canary passed (or over all, flagged "window":true, when
    // the window never cleared). The first curve capture read q_bm25
    // at 61× growth purely because its 4×/16× samples landed in an
    // ~8×-slow host window (bracketing canaries 0.79/0.67 s vs the
    // 0.09 s flat reference) — an independent quiet re-run of the same
    // query on the same synthetic dir read 1.3 s.
    val noopGate = sys.env.getOrElse("SPARK_GRAFT_CURVE_NOOP_GATE", "0.25").toDouble
    // comma-list filter for re-curving a single family after a perf
    // change without paying for the full sweep
    val only = sys.env.get("SPARK_GRAFT_CURVE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(Queries)(f => Queries.filter(f))
    val canary0 = noop()
    val results = selected.map { q =>
      val fn = graft.SparkEntry.queries(q)
      val bySc = scales.map { s =>
        var clean = List.empty[Double]
        var all = List.empty[Double]
        var tries = 0
        val maxTries = runs * 3
        while (clean.size < runs && tries < maxTries) {
          graft.operators.DedupOps.clearMemos()
          spark.catalog.clearCache()
          System.gc()
          val cBefore = noop()
          val t0 = System.nanoTime()
          fn(spark, dirs(s)).count()
          val sec = (System.nanoTime() - t0) / 1e9
          val cAfter = noop()
          all ::= sec
          if (math.max(cBefore, cAfter) <= noopGate) clean ::= sec
          tries += 1
        }
        val windowed = clean.isEmpty
        s -> ((if (windowed) all.min else clean.min), windowed)
      }.toMap
      val secs = scales.map(s => f"""\"$s\":${bySc(s)._1}%.2f""").mkString(",")
      val windowed = scales.exists(s => bySc(s)._2)
      val r4 = bySc(4)._1 / bySc(1)._1
      val r16 = bySc(16)._1 / bySc(1)._1
      println(f"""{"metric":"scale_curve","query":"$q","sec":{$secs},"ratio_4":$r4%.2f,"ratio_16":$r16%.2f,"window":$windowed}""")
      (q, bySc, r4, r16)
    }
    val canary1 = noop()
    println(f"""{"metric":"scale_curve_summary","base_docs":$baseDocs,"base_vecs":$baseVecs,"runs":$runs,"noop_gate":$noopGate,"noop_sec":[$canary0%.3f,$canary1%.3f],"queries":${results.size}}""")
    spark.stop()
  }
}
