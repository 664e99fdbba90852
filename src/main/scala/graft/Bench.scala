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
    // completed-run timings, kept OUTSIDE the try so a crash mid-bench
    // still prints a parseable summary over everything finished so far
    val timings = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(String, Double, Boolean)]]
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
        val order = selected.sortBy { case (n, _) => md5hex(s"$runIdx:$n") }
        timings += order.map { case (name, fn) =>
          graft.operators.DedupOps.drainMemoHits()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
                   catch { case e: Throwable =>
                     System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
          if (graft.operators.DedupOps.drainMemoHits().nonEmpty) memoServed += name
          (name, (System.nanoTime() - t0) / 1e9, ok)
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
    val results = selected.flatMap { case (name, _) =>
      val perRun = timings.flatMap(_.find(_._1 == name)).toSeq
      if (perRun.isEmpty) None
      else {
        val sorted = perRun.map(_._2).sorted
        val median =
          if (sorted.size % 2 == 1) sorted(sorted.size / 2)
          else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2
        Some((name, median, sorted.head, perRun.forall(_._3)))
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
    // "total" is a sum of per-query medians, not one wall-clock pass
    val total = results.map(_._2).sum
    val completedRuns = timings.size
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","total_is":"sum_of_medians","runs":$completedRuns,"memo_cleared_per_run":true,"memo_served":$memoJson,"queries":$qs,"mins":$mins,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // stdout capture upstream truncates long output and keeps the TAIL:
    // end with a short self-contained summary line (total + slowest 5)
    // so a truncated capture still closes with one parseable record.
    // The full per-query JSON also lands on disk for round diffing.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      line.getBytes("UTF-8"))
    val slowest = results.sortBy(-_._2).take(5)
      .map { case (k, v, _, _) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"summary","total":$total,"unit":"sec","runs":$completedRuns,"slowest5":$slowest,"memo_served":$memoJson,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
