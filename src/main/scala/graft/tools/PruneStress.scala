package graft.tools

import graft.cdc.ParquetTableStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the table store's read-path pruning buys on a
  * store-scale mirror — the `ParquetTableStore` analogue of
  * BandIndexStress: a synthetic base table (default 2M rows, 64
  * buckets, zone maps on a HIGH-cardinality attribute + a timestamp
  * column, blooms sized to the per-bucket row count) is written
  * through the REAL `applyChanges` path, then four probes run both
  * PRUNED (the new read APIs) and FULL-SCAN (read + filter), with
  * identical results asserted:
  *
  *  - needle probe: `readEq(attr, <rare value>)` — the bloom is the
  *    only structure that can prune a point predicate on a
  *    hash-bucketed layout (a value in k rows lives in ≤ k buckets);
  *  - key fetch: `readKeys(8 ids)` — the key hash names its buckets;
  *  - high-water probe: `readRange(ts > max)` — min/max prove the
  *    whole-range miss without opening anything;
  *  - stats overhead: the SAME delta merged into a stats-tracked and
  *    an untracked twin — the price of the sidecar aggregation.
  *
  * The ratios are the point: at mirror scale a probe that opens all
  * nBuckets bucket dirs is a table scan, not a lookup.
  */
object PruneStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-prune-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nRows = sys.env.getOrElse("SPARK_GRAFT_PRUNE_ROWS", "2000000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val nBuckets = 64
    val dir = java.nio.file.Files.createTempDirectory("prune-stress").toString
    // blooms sized to the rows each bucket will hold — the honest knob
    // (see BucketStats.BloomItems): a saturated bloom prunes nothing
    val perBucket = math.max(1024L, nRows * 2 / nBuckets)
    val stats = Map("t" -> Seq("attr", "ts"))
    val store = new ParquetTableStore(spark, dir, nBuckets = nBuckets,
      statsColumns = stats, bloomItems = perBucket)
    val bareDir = java.nio.file.Files.createTempDirectory("prune-bare").toString
    val bare = new ParquetTableStore(spark, bareDir, nBuckets = nBuckets)

    // attr is effectively unique (the needle column: urls/emails/order
    // numbers in a real mirror); ts correlates with id
    def rowsOf(range: org.apache.spark.sql.Dataset[java.lang.Long]) = range
      .select(col("id"),
        concat(lit("a"), xxhash64(col("id") * 31)).as("attr"),
        (col("id") * 1000L).as("ts"),
        md5(col("id").cast("string")).as("payload"))

    def timeMerge(s: ParquetTableStore,
        df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      s.applyChanges("t", Seq("id"), df, spark.range(0).toDF("id"))
      (System.nanoTime() - t0) / 1e9
    }
    val base = rowsOf(spark.range(nRows))
    val baseSec = timeMerge(store, base)
    timeMerge(bare, base)

    def time[A](run: => A): (A, Double) = {
      val samples = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val out = run
        (out, (System.nanoTime() - t0) / 1e9)
      }
      (samples.head._1, samples.map(_._2).min)
    }

    // -- needle probe ---------------------------------------------------
    val needleId = nRows / 3
    val needle = s"a${spark.range(needleId, needleId + 1)
      .select(xxhash64(col("id") * 31)).as[Long].head()}"
    val ((eqRows, eqRep), eqSec) = time {
      val (df, rep) = store.readEqPruned("t", "attr", needle).get
      (df.select("id").as[Long].collect().sorted.toSeq, rep)
    }
    val (eqFullRows, eqFullSec) = time {
      store.read("t").get.filter(col("attr") === needle)
        .select("id").as[Long].collect().sorted.toSeq
    }
    assert(eqRows == eqFullRows && eqRows == Seq(needleId),
      s"needle probe disagreed: $eqRows vs $eqFullRows")

    // -- key fetch --------------------------------------------------------
    val keyIds = (1L to 8L).map(k => k * nRows / 9)
    val ((keyRows, keyRep), keySec) = time {
      val (df, rep) = store.readKeysPruned("t", Seq("id"),
        keyIds.toDF("id")).get
      (df.select("id").as[Long].collect().sorted.toSeq, rep)
    }
    val (keyFullRows, keyFullSec) = time {
      store.read("t").get.filter(col("id").isin(keyIds: _*))
        .select("id").as[Long].collect().sorted.toSeq
    }
    assert(keyRows == keyFullRows && keyRows == keyIds.sorted,
      s"key fetch disagreed: $keyRows vs $keyFullRows")

    // -- high-water probe -------------------------------------------------
    val ((hwCount, hwRep), hwSec) = time {
      val (df, rep) = store.readRangePruned("t", "ts",
        Some(nRows * 1000L + 1L), None).get
      (df.count(), rep)
    }
    assert(hwCount == 0L)

    // -- stats overhead on a delta merge -----------------------------------
    // scattered delta (20k keys → every bucket touched → the stats
    // pass re-aggregates the WHOLE table: the worst case, both costs
    // O(touched rows)) vs trickle delta (20 keys → ≤ 20 buckets →
    // stats re-aggregates only those buckets' rows)
    val delta = rowsOf(spark.range(nRows, nRows + 20000))
    val statsSec = timeMerge(store, delta)
    val bareSec = timeMerge(bare, delta)
    val trickle = rowsOf(spark.range(nRows + 20000, nRows + 20020))
    val trickleStatsSec = timeMerge(store, trickle)
    val trickleBareSec = timeMerge(bare, trickle)

    println(f"""{"metric":"prune_stress","rows":$nRows,"buckets":$nBuckets,""" +
      f""""needle_buckets":${eqRep.bucketsKept},""" +
      f""""needle_sec":$eqSec%.3f,"needle_full_sec":$eqFullSec%.3f,""" +
      f""""key_buckets":${keyRep.bucketsKept},""" +
      f""""key_sec":$keySec%.3f,"key_full_sec":$keyFullSec%.3f,""" +
      f""""highwater_buckets":${hwRep.bucketsKept},"highwater_sec":$hwSec%.3f,""" +
      f""""base_merge_sec":$baseSec%.3f,""" +
      f""""delta_merge_stats_sec":$statsSec%.3f,""" +
      f""""delta_merge_bare_sec":$bareSec%.3f,""" +
      f""""trickle_merge_stats_sec":$trickleStatsSec%.3f,""" +
      f""""trickle_merge_bare_sec":$trickleBareSec%.3f}""")

    Seq(dir, bareDir).foreach { d =>
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
    spark.stop()
  }
}
