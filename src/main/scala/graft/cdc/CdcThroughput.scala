package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.LongAdder

/** CDC throughput microbenchmark: synthesize N Debezium envelopes,
  * run the full decode → route → compact → sink pipeline, report
  * records/second as one JSON line.
  *
  * Comparison basis (BASELINE.md): the reference consumer is one
  * thread issuing one autocommitted JDBC statement per record
  * (DebeziumToPostgresConsumer.java:101,213-218) — its ceiling is
  * 1/RTT records/s (≈1k/s at 1 ms RTT) regardless of CPU. This
  * pipeline is bounded by parse+shuffle CPU across all cores, and the
  * sink sees only the compacted last-writer-wins rows.
  *
  * Usage: runMain graft.cdc.CdcThroughput [nRecords] [mode]
  *   mode: count (measure pipeline, discard at sink) | store (parquet)
  */
object CdcThroughput {

  /** Sink that forces full materialization of the changes but writes
    * nothing — isolates pipeline cost from sink IO. */
  class CountingSink extends CdcSink {
    val upserts = new LongAdder
    val deletes = new LongAdder
    def applyChanges(target: String, pks: Seq[String],
        ups: org.apache.spark.sql.DataFrame,
        dels: org.apache.spark.sql.DataFrame): Unit = {
      upserts.add(ups.count())
      deletes.add(dels.count())
    }
  }

  /** The synthetic Debezium envelope frame every throughput probe
    * decodes: 2× changes per key on average (updates overwrite
    * creates), 10% deletes — exercises compaction, not just parse. */
  def envelopes(spark: SparkSession, n: Long)
      : org.apache.spark.sql.DataFrame = {
    val keys = math.max(n / 2, 1)
    spark.range(n).select(
      lit("mysql.app.customers").as("topic"),
      format_string("""{"id": %d}""", col("id") % keys).as("key"),
      format_string(
        """{"before": null, "after": {"id": %d, "first_name": "fn%d",
          | "last_name": "ln%d", "email": "u%d@example.com",
          | "created_at": "2026-01-28T00:00:00Z"}, "source":
          | {"db": "app", "table": "customers", "ts_ms": %d},
          | "op": "%s", "ts_ms": %d}""".stripMargin.replaceAll("\n", ""),
        col("id") % keys, col("id"), col("id"), col("id") % keys,
        col("id"), when(col("id") % 10 === 9, "d").otherwise("c"), col("id"))
        .as("value"),
      lit(0).as("partition"),
      col("id").as("offset"))
  }

  /** Warm (JMH-style, see main's rationale) then time TWO passes of
    * decode → route → compact → count-sink at `n` records; returns
    * (first, steady) seconds. The bench harness records the
    * steady-state rate per round (BENCH/bench_full.json "cdc" field)
    * so CDC-core regressions surface the same way query regressions
    * do. */
  def measureCount(spark: SparkSession, n: Long,
      warmPasses: Int = 2): (Double, Double) = {
    val raw = envelopes(spark, n)
    val catalog = CdcCatalog.fromPropertiesString("pk.customers=id\n")
    val warmSink = new CountingSink
    Materializer.applyBatch(raw.limit(1000), catalog,
      Envelope.defaultRegistry, warmSink)
    (1 to warmPasses).foreach { _ =>
      Materializer.applyBatch(raw.limit(math.min(n, 1000000L).toInt),
        catalog, Envelope.defaultRegistry, warmSink)
    }
    val sink = new CountingSink
    val secs = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      Materializer.applyBatch(raw, catalog, Envelope.defaultRegistry, sink)
      (System.nanoTime() - t0) / 1e9
    }
    (secs.head, secs.last)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val mode = args.lift(1).getOrElse("count")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cdc-throughput")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = envelopes(spark, n)
    val catalog = CdcCatalog.fromPropertiesString("pk.customers=id\n")
    // Warmup to STEADY STATE, not just plan/codegen existence: a
    // 1000-row pass compiles the generated code but never reaches C2
    // JIT on the decode / columnar-cache-build hot loops, so a single
    // timed batch was dominated by compiler time (measured: the same
    // 4M batch runs ~57 s first and ~9 s warm on local[32]). A CDC
    // pipeline is a long-running stream — steady-state throughput is
    // the honest figure — so warm with two mid-sized batches first
    // (JMH-style) and report the steady-state rate.
    val warmSink = new CountingSink
    Materializer.applyBatch(raw.limit(1000), catalog,
      Envelope.defaultRegistry, warmSink)
    (1 to 2).foreach { _ =>
      Materializer.applyBatch(raw.limit(math.min(n, 1000000L).toInt), catalog,
        Envelope.defaultRegistry, warmSink)
    }

    // incr: seed the store with the full corpus once, then time K small
    // batches against it — the case the bucket-scoped merge exists for
    // (a micro-batch touching few keys must not pay O(table)).
    if (mode == "incr") {
      // 1024 buckets: a 100-key micro-batch touches ≤100 buckets, so
      // the merge reads/rewrites ≤10% of the table instead of all of
      // it — the per-batch-cost-∝-batch property the store exists for.
      val store = new ParquetTableStore(spark,
        java.nio.file.Files.createTempDirectory("cdc-tp-incr").toString,
        nBuckets = 1024)
      Materializer.applyBatch(raw, catalog, Envelope.defaultRegistry, store)
      val batches = 10
      val perBatch = 100
      // pre-materialize the micro-batches so timing measures the store
      // merge, not re-generation of the 2M-row synthetic source
      val smalls = (0 until batches).map { i =>
        val rows = raw.filter(col("offset") >= i.toLong * perBatch &&
          col("offset") < (i + 1).toLong * perBatch).collect().toSeq
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 4), raw.schema)
      }
      val t0 = System.nanoTime()
      smalls.foreach(small =>
        Materializer.applyBatch(small, catalog, Envelope.defaultRegistry, store))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"cdc_incr_batch","table_rows":$n,"batches":$batches,"changes_per_batch":$perBatch,"sec_per_batch":${sec / batches}%.2f}""")
      spark.stop(); return
    }

    val sink: CdcSink = mode match {
      case "store" => new ParquetTableStore(spark,
        java.nio.file.Files.createTempDirectory("cdc-tp").toString)
      case _ => new CountingSink
    }
    // Two timed passes over the same batch: pass 1 still carries
    // tail-end JIT/allocation ramp at full batch size; pass 2 is the
    // steady state a long-running stream actually sits at. Both are
    // printed; records_per_sec is the steady-state figure. (For
    // `store`, pass 2 upserts over the pass-1 table — the same keys —
    // which IS the steady state of a CDC mirror: updates, not first
    // inserts.)
    // a per-pass NOOP canary (pure scheduling, constant by
    // construction — the bench harness's probe) makes a host-window
    // hit on THIS measurement readable from the record itself: the
    // round-13 forensics caught a fresh-JVM run reading 21k rec/s
    // inside a transient load window that a standalone run minutes
    // later (206k) didn't see — without a canary the two records are
    // indistinguishable from a code regression.
    def noop(): Double = {
      val t0 = System.nanoTime(); spark.range(1).count()
      (System.nanoTime() - t0) / 1e9
    }
    // three canary samples — before, between and after the measured
    // passes — so a load spike confined to EITHER pass is visible
    // (a single post-hoc sample missed a pass-2-only spike, r13
    // verdict minor); the record carries the median
    val canaryBefore = noop()
    val t1 = System.nanoTime()
    Materializer.applyBatch(raw, catalog, Envelope.defaultRegistry, sink)
    val firstSec = (System.nanoTime() - t1) / 1e9
    val canaryMid = noop()
    val t2 = System.nanoTime()
    Materializer.applyBatch(raw, catalog, Envelope.defaultRegistry, sink)
    val steadySec = (System.nanoTime() - t2) / 1e9
    val canaryAfter = noop()
    val canary = Seq(canaryBefore, canaryMid, canaryAfter).sorted.apply(1)
    val rps = n / steadySec
    println(f"""{"metric":"cdc_throughput","records":$n,"mode":"$mode","first_sec":$firstSec%.2f,"steady_sec":$steadySec%.2f,"noop_sec":$canary%.3f,"noop_all":[$canaryBefore%.3f,$canaryMid%.3f,$canaryAfter%.3f],"records_per_sec":$rps%.0f}""")
    spark.stop()
  }
}
