package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query and
  * total wall seconds over SPARK_GRAFT_SF_DIR.
  *
  * Session tuning mirrors what a cluster deployment would set: shuffle
  * partitions sized to cores (not the 200 default), AQE on (runtime
  * coalescing + skew-join splitting — the local stand-in for what keeps
  * 1000-executor shuffles balanced). A warmup query runs first so JVM /
  * codegen / FileSourceScan initialization isn't billed to whichever
  * query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Round-14 optimization (guide §1.2 step 3, measured before/after):
      // the generated-class cache defaults to 100 entries, and a session
      // running hundreds of distinct query plans (this bench; any
      // analytics service with a repeated query mix) thrashes it — the
      // SAME plan re-run minutes later recompiles every codegen stage
      // through janino (thread dumps during the bench showed executor
      // tasks inside Parser.parseClassBody). 5000 entries holds the
      // whole 303-query suite's generated classes (~classes are
      // compiled bytecode, NOT results — this is JIT-style code caching,
      // no data crosses runs). A/B over 12 hot queries × 3 reps:
      // rep-2 wall 39.5 s → 28.9 s, rep-3 32.5 s → 25.4 s.
      // Parameterised for small-heap deployments.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table once (file listing + footer reads) and
    // force one codegen'd aggregation through the pipeline.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => table(spark, sfDir, t).limit(1).count())
    SparkEntry.queries.get("q_agg_pricing").foreach(_(spark, sfDir).count())

    // SPARK_GRAFT_BENCH_RUNS → per-query median over N runs, DEFAULT 3
    // (round-4 verdict: a runs=1 official capture was 3× inflated by one
    // noisy machine window — a flat multiplier across unrelated plans;
    // the median defends the signal, and the per-query "mins" emitted
    // below make any residual noise spike visible in the JSON instead of
    // silently inflating the total). For even N the two middle timings
    // are averaged (a true median, not upper-middle).
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts to named queries for
    // local iteration; the driver never sets it.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Run-major loop, clearing the process-level dedup memos at the top
    // of every run (round-3 advice): with query-major repetition, runs
    // 2..N of the pair-consuming queries served entirely from the memo
    // populated by run 1, so their medians excluded the dominant
    // pair-finding cost. Now every run pays it once; queries that served
    // from a memo populated EARLIER IN THE SAME RUN are listed in
    // "memo_served" so the per-query numbers are interpretable.
    //
    // Each run iterates a DIFFERENT deterministic permutation of the
    // queries (sort by md5(runIdx:name)) instead of alphabetical order
    // (round-5 verdict): with the same order every run, a machine-noise
    // window recurring at the same wall-clock phase hits the SAME
    // alphabetical band in 2 of 3 runs and the median lands inside the
    // contamination. Permuting per run decorrelates noise from query
    // identity, so median-of-3 actually defends.
    val memoServed = scala.collection.mutable.LinkedHashSet.empty[String]
    // Fixed-cost canaries, timed once per run (round-10 verdict #3): a
    // uniform host-level shift (CPU contention, thermal window, kernel
    // change) moves EVERY query by a similar factor and is otherwise
    // indistinguishable from a real fixed-overhead regression without
    // cross-round forensics. Two no-op-sized probes whose cost is
    // constant by construction — pure scheduling (range(1).count) and
    // one tiny fixed parquet scan (region: 5 rows at every SF) — are
    // recorded per run. Cross-round reading (SCALING.md): if the
    // canaries shifted by the same factor as the query totals, the
    // shift is environmental; canaries flat + queries up = code drift.
    val canaryNoop = scala.collection.mutable.ArrayBuffer.empty[Double]
    val canaryScan = scala.collection.mutable.ArrayBuffer.empty[Double]
    // INLINE canaries: the per-run probes above run once at each run's
    // START and therefore miss contention that arrives mid-run (two
    // same-code captures two hours apart showed a uniform 1.12× ratio
    // with flat start-of-run canaries). One no-op probe every 50
    // queries tracks the host THROUGH the run — a contention window
    // shows as a bulge in this series, at ~0.1 s × ~6 probes per run
    // of added cost.
    val canaryInline = scala.collection.mutable.ArrayBuffer.empty[Double]
    def timeSec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // completed-run timings, kept OUTSIDE the try so a crash mid-bench
    // still prints a parseable summary over everything finished so far;
    // 4th field = this SAMPLE served from a memo populated earlier in the
    // same run (per-sample, not per-query: with per-run permutation the
    // same query can be memo-cold in one run and memo-served in another)
    val timings = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(String, Double, Boolean, Boolean)]]
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    try {
      (1 to runs).foreach { runIdx =>
        graft.operators.DedupOps.clearMemos()
        // absorb the previous run's garbage (dropped caches, checkpoint
        // blocks, shuffle state) HERE, between runs, instead of letting
        // a collection pause land on whichever query runs first
        System.gc()
        canaryNoop += timeSec(spark.range(1).count())
        canaryScan += timeSec(table(spark, sfDir, "region").count())
        val order = selected.sortBy { case (n, _) => md5hex(s"$runIdx:$n") }
        timings += order.zipWithIndex.map { case ((name, fn), qi) =>
          if (qi % 50 == 0)
            canaryInline += timeSec(spark.range(1).count())
          graft.operators.DedupOps.drainMemoHits()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
                   catch { case e: Throwable =>
                     System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
          val hit = graft.operators.DedupOps.drainMemoHits().nonEmpty
          if (hit) memoServed += name
          (name, (System.nanoTime() - t0) / 1e9, ok, hit)
        }
      }
    } catch {
      case e: Throwable =>
        // the summary lines below still print over completed runs —
        // a harness crash must close with a parseable record, not a
        // stack trace as the last line (round-4 verdict)
        System.err.println(s"[bench] run loop CRASHED after ${timings.size} " +
          s"complete run(s): ${e.getMessage}")
    }
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Per-query sample basis (round-6 advice): with per-run permutation,
    // WHICH pair-consuming query pays the memo-populating cost varies per
    // run, so a query's samples can mix memo-cold and memo-served
    // conditions. A median over mixed conditions measures neither. When
    // both kinds exist, the median is computed over the memo-COLD samples
    // only — the condition that includes the dominant pair-finding cost
    // (the round-3 rationale for clearing memos per run) — and the query
    // is listed in "memo_mixed" so the narrower sample count is visible.
    val memoMixed = scala.collection.mutable.LinkedHashSet.empty[String]
    val basisByName: scala.collection.mutable.LinkedHashMap[String, Seq[Double]] =
      scala.collection.mutable.LinkedHashMap.empty
    val okByName = scala.collection.mutable.LinkedHashMap.empty[String, Boolean]
    selected.foreach { case (name, _) =>
      val perRun = timings.flatMap(_.find(_._1 == name)).toSeq
      if (perRun.nonEmpty) {
        val cold = perRun.filterNot(_._4)
        val basis =
          if (cold.nonEmpty && cold.size < perRun.size) { memoMixed += name; cold }
          else perRun
        basisByName(name) = basis.map(_._2)
        okByName(name) = perRun.forall(_._3)
      }
    }
    // Dedicated memo-cold runs (round-7 verdict #5): a memo_mixed
    // query's cold basis can shrink to a SINGLE sample — one noisy
    // window away from a misleading official median. Each mixed query
    // gets one extra timed execution with the memos cleared immediately
    // before it, so its official median covers >= 2 same-condition
    // (memo-cold) samples. Listed in "cold_extra" in the JSON.
    val coldExtra = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def timedColdRun(name: String, fn: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Option[Double] = {
      graft.operators.DedupOps.clearMemos()
      System.gc()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] cold run $name FAILED: ${e.getMessage}"); false }
      if (ok) Some((System.nanoTime() - t0) / 1e9) else None
    }
    selected.foreach { case (name, fn) =>
      if (memoMixed.contains(name) && okByName.getOrElse(name, false)) {
        timedColdRun(name, fn) match {
          case Some(secs) =>
            basisByName(name) = basisByName(name) :+ secs
            coldExtra(name) = 1
          case None => okByName(name) = false
        }
      }
    }
    // Retry pass (round-6 verdict #1): a loaded driver box can land
    // noise in 2-of-3 runs of a scattered query, putting the median far
    // above the min on an already-audited trivial plan. Any query whose
    // median exceeds 2x its min (and by more than 0.1 s — sub-0.1 s
    // jitter is not noise worth chasing) gets extra timed executions,
    // one at a time, medians recomputed over the grown sample set,
    // until the ratio clears or the retry budget (default 3 per query)
    // runs out. Every retry clears the memos first, so memo-MIXED
    // queries retry under the same memo-cold condition their official
    // basis now measures (round-7 verdict #5 — previously every
    // memo-consuming query was exempt and showed the residual noise).
    // Only queries memo-served in ALL runs stay exempt: their basis is
    // consistently the served condition, which a cold retry would
    // contaminate rather than defend.
    val maxRetries = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "3").toInt
    val retried = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def suspect(xs: Seq[Double]): Boolean = {
      val m = medianOf(xs); val mn = xs.min
      m > 2 * mn && m - mn > 0.1
    }
    selected.foreach { case (name, fn) =>
      val allServed = memoServed.contains(name) && !memoMixed.contains(name)
      if (!allServed && basisByName.contains(name) && okByName(name)) {
        var extra = 0
        while (suspect(basisByName(name)) && extra < maxRetries) {
          timedColdRun(name, fn) match {
            case Some(secs) =>
              basisByName(name) = basisByName(name) :+ secs
              extra += 1
              retried(name) = extra
            case None => okByName(name) = false; extra = maxRetries
          }
        }
      }
    }
    val results = selected.flatMap { case (name, _) =>
      basisByName.get(name).map { xs =>
        (name, medianOf(xs), xs.min, okByName(name))
      }
    }
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query min next to the median: a query whose median sits far
    // above its min flags a noise spike (GC / machine window) rather
    // than a plan regression — readable straight from the JSON
    val mins = results.map { case (k, _, mn, _) => s"\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    // a crashed query must be visible in the bench JSON, not silently
    // folded into a small wall-time (round-1 advice)
    val failed = results.collect { case (k, _, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val memoJson = memoServed.map(q => s"\"" + q + "\"").mkString("[", ",", "]")
    val mixedJson = memoMixed.map(q => s"\"" + q + "\"").mkString("[", ",", "]")
    val retriedJson = retried.map { case (q, n) => s"\"" + q + "\":" + n }
      .mkString("{", ",", "}")
    val coldExtraJson = coldExtra.map { case (q, n) => s"\"" + q + "\":" + n }
      .mkString("{", ",", "}")
    // "total" is a sum of per-query medians, not one wall-clock pass;
    // "total_min" (sum of per-query minima) is the noise floor — the
    // defensible figure when the capture ran on a loaded box, promoted to
    // a first-class field (round-6 verdict) instead of a derived number
    val total = results.map(_._2).sum
    val totalMin = results.map(_._3).sum
    val completedRuns = timings.size
    val canaryJson = {
      val noop = canaryNoop.mkString("[", ",", "]")
      val scan = canaryScan.mkString("[", ",", "]")
      val noopMed = if (canaryNoop.nonEmpty) medianOf(canaryNoop.toSeq) else 0.0
      val scanMed = if (canaryScan.nonEmpty) medianOf(canaryScan.toSeq) else 0.0
      val inline = canaryInline.map(v => f"$v%.4f").mkString("[", ",", "]")
      val inlineMed =
        if (canaryInline.nonEmpty) medianOf(canaryInline.toSeq) else 0.0
      val inlineMax = if (canaryInline.nonEmpty) canaryInline.max else 0.0
      s"""{"noop_sec":$noop,"scan_sec":$scan,"noop_median":$noopMed,""" +
        s""""scan_median":$scanMed,"inline_sec":$inline,""" +
        s""""inline_median":$inlineMed,"inline_max":$inlineMax}"""
    }
    // CDC-core throughput as a tracked gate (round-11 verdict #8): one
    // decode→route→compact→count measurement at a FIXED record count
    // per bench capture, so a CDC-pipeline regression is visible in
    // the round-over-round JSON exactly like a query regression.
    // SPARK_GRAFT_BENCH_CDC=0 disables; any other value overrides N.
    val cdcJson = {
      val nCdc = sys.env.getOrElse("SPARK_GRAFT_BENCH_CDC", "1000000").toLong
      if (nCdc <= 0) """{"skipped":true}"""
      else {
        // The CDC gate measures the CDC CORE, not the aftermath of the
        // 3×294-query session that just ran in this JVM. Round-13
        // forensics: the identical 1M-record measureCount read 6.6k
        // rec/s at the end of a full capture vs 270k in a fresh JVM on
        // the same quiet host — and clearing the dedup memos + query
        // cache + a System.gc() first only moved it to ~16k, so the
        // depression is JVM-LIFETIME state (code-cache/JIT pollution,
        // context-cleaner backlog, accumulated shuffle dirs), not
        // block-manager pressure. The honest measurement is a FRESH
        // child JVM running graft.cdc.CdcThroughput — the same clean
        // condition a real CDC deployment's dedicated driver has. The
        // in-process path remains the fallback (still a valid gate,
        // just noisier) if the child can't launch.
        def inProcess(): String = try {
          graft.operators.DedupOps.clearMemos()
          spark.catalog.clearCache()
          System.gc()
          val (first, steady) = graft.cdc.CdcThroughput.measureCount(spark, nCdc)
          f"""{"records":$nCdc,"first_sec":$first%.2f,"steady_sec":$steady%.2f,"rec_per_sec":${nCdc / steady}%.0f,"fresh_jvm":false}"""
        } catch { case e: Throwable =>
          System.err.println(s"[bench] cdc throughput FAILED: ${e.getMessage}")
          """{"failed":true}"""
        }
        // SELF-DEFENDING gate (round-13 verdict #3): the child runs up
        // to 3 attempts while its own noop canary reports a loaded
        // window (> 0.5 s vs the ~0.09 s flat reference); the BEST-
        // canary attempt becomes the record and the discarded readings
        // stay in the JSON, so a driver capture landing on a bad
        // window is retried instead of recorded — and when retries
        // exhaust, the attempts trail says so explicitly. A child line
        // that fails to parse (any missing field) counts as a FAILED
        // attempt, never as a measurement (r13 advice). Heap for the
        // child is SPARK_GRAFT_BENCH_CDC_HEAP (default 16g) so
        // constrained hosts can still take the fresh-JVM path.
        def childAttempt(): Either[String, Map[String, String]] = {
          val javaBin = System.getProperty("java.home") + "/bin/java"
          val cp = System.getProperty("java.class.path")
          val heap = sys.env.getOrElse("SPARK_GRAFT_BENCH_CDC_HEAP", "16g")
          val pb = new ProcessBuilder(javaBin, s"-Xmx$heap", "-cp", cp,
            "graft.cdc.CdcThroughput", nCdc.toString, "count")
          pb.redirectError(ProcessBuilder.Redirect.INHERIT)
          val proc = pb.start()
          val out = scala.io.Source.fromInputStream(proc.getInputStream)
            .getLines().toList
          val rc = proc.waitFor()
          val line = out.findLast(_.contains("\"metric\":\"cdc_throughput\""))
          if (rc != 0 || line.isEmpty) Left(s"child rc=$rc, no record line")
          else {
            val keys = Seq("records", "first_sec", "steady_sec",
              "noop_sec", "records_per_sec")
            val parsed = keys.flatMap { key =>
              (s""""$key":([-0-9.]+)""".r).findFirstMatchIn(line.get)
                .map(key -> _.group(1))
            }.toMap
            val missing = keys.filterNot(parsed.contains)
            if (missing.nonEmpty) Left(s"unparseable fields: $missing")
            else Right(parsed)
          }
        }
        try {
          val maxAttempts = 3
          val noopGate = 0.5
          val attempts = scala.collection.mutable.ArrayBuffer
            .empty[Either[String, Map[String, String]]]
          var done = false
          while (!done && attempts.size < maxAttempts) {
            val a = childAttempt()
            attempts += a
            done = a.exists(_("noop_sec").toDouble <= noopGate)
            if (!done && attempts.size < maxAttempts)
              System.err.println(s"[bench] cdc attempt ${attempts.size} " +
                s"rejected (${a.fold(identity, m => s"noop_sec=${m("noop_sec")}")}) — retrying")
          }
          val good = attempts.flatMap(_.toOption)
          if (good.isEmpty) {
            System.err.println(s"[bench] fresh-JVM cdc gate failed all " +
              s"$maxAttempts attempts — falling back to in-process")
            inProcess()
          } else {
            val best = good.minBy(_("noop_sec").toDouble)
            val discarded = attempts.map {
              case Left(err) => s"""{"failed":"$err"}"""
              case Right(m) if m eq best => null
              case Right(m) =>
                s"""{"noop_sec":${m("noop_sec")},"rec_per_sec":${m("records_per_sec")}}"""
            }.filter(_ != null).mkString("[", ",", "]")
            s"""{"records":${best("records")},"first_sec":${best("first_sec")},""" +
              s""""steady_sec":${best("steady_sec")},""" +
              s""""noop_sec":${best("noop_sec")},""" +
              s""""rec_per_sec":${best("records_per_sec")},""" +
              s""""attempts":${attempts.size},"discarded":$discarded,""" +
              s""""fresh_jvm":true}"""
          }
        } catch { case e: Throwable =>
          System.err.println(s"[bench] fresh-JVM cdc gate unavailable " +
            s"(${e.getMessage}) — falling back to in-process")
          inProcess()
        }
      }
    }
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","total_is":"sum_of_medians","total_min":$totalMin,"runs":$completedRuns,"canary":$canaryJson,"cdc":$cdcJson,"memo_cleared_per_run":true,"memo_served":$memoJson,"memo_mixed":$mixedJson,"cold_extra":$coldExtraJson,"retried":$retriedJson,"queries":$qs,"mins":$mins,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // stdout capture upstream truncates long output and keeps the TAIL:
    // end with a short self-contained summary line (total + slowest 5)
    // so a truncated capture still closes with one parseable record.
    // The full per-query JSON also lands on disk for round diffing.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      line.getBytes("UTF-8"))
    val slowest = results.sortBy(-_._2).take(5)
      .map { case (k, v, _, _) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"summary","total":$total,"total_min":$totalMin,"unit":"sec","runs":$completedRuns,"canary":$canaryJson,"slowest5":$slowest,"memo_served":$memoJson,"retried":$retriedJson,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
