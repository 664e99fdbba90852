package graft.tools

import graft.cdc.{IncrementalView, ParquetTableStore}
import graft.cdc.IncrementalView.ViewDef
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what CDF-fed view maintenance buys — and, as important,
  * HOW each path scales with the base. For each base size (default
  * 1M and 8M rows, 200 groups) a ParquetTableStore scenario is built
  * once (base v1 + initialized view + a 1k-row delta of inserts/
  * updates/deletes → v2) and copied per timed sample, then the view
  * advances three ways —
  *
  *  - RECORDED refresh: `IncrementalView.refresh` over the recorded
  *    change files — reads O(delta) rows;
  *  - SNAPSHOT-DIFF refresh: same call with the `_PARENT` chain
  *    broken, forcing the fallback diff — 1k scattered keys touch
  *    all 64 buckets, so this reads ~the whole table twice (the
  *    measured pathology that motivated recording the feed);
  *  - RECOMPUTE: `IncrementalView.compute` over the full snapshot.
  *
  * Equality of refreshed vs recomputed views is asserted (exact
  * decimal sums — any drift is a bug, not noise). The SCALING TREND
  * is the point, not any single ratio: at local scale the recorded
  * refresh is mostly fixed job-scheduling overhead (it reads only
  * the delta), so its time stays FLAT across the 8× base growth
  * while snapshot-diff and recompute grow with the table — extended
  * to 100 TB with per-minute micro-batches, only the flat line is
  * runnable.
  */
object IvmStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ivm-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sizes = sys.env.getOrElse("SPARK_GRAFT_IVM_BASES", "1000000,8000000")
      .split(",").map(_.trim.toLong).toSeq
    val nDelta = sys.env.getOrElse("SPARK_GRAFT_IVM_DELTA", "1000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val groups = 200

    def baseRows(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id"),
      pmod(xxhash64(col("id")), lit(groups)).cast("string").as("grp"),
      (pmod(xxhash64(col("id"), lit(1)), lit(10000)) / 100.0).as("amount"))

    val vdef = ViewDef(Seq("grp"), Seq("amount"))
    val empty = Seq.empty[Long].toDF("id")

    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(src)
      try walk.forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      } finally walk.close()
    }

    // scenarios are store-sized (hundreds of MB at 32M rows) and one
    // is copied PER SAMPLE — delete as soon as a sample is timed, or
    // repeated runs fill the disk
    def rmTree(p: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }

    sizes.foreach { nBase =>
      // scenario built ONCE; each timed sample runs on a fresh copy
      // (refresh mutates the view, so samples can't share a store)
      val proto = java.nio.file.Files.createTempDirectory("ivm-proto")
      val protoStore = new ParquetTableStore(spark, proto.toString,
        nBuckets = 64)
      protoStore.applyChanges("base", Seq("id"),
        baseRows(spark.range(nBase).toDF("id")), empty)
      IncrementalView.initialize(protoStore, "base", "view", vdef)
      val v1 = protoStore.versions("base").last
      val third = nDelta / 3
      protoStore.applyChanges("base", Seq("id"),
        baseRows(spark.range(nBase, nBase + third).toDF("id"))
          .unionByName(baseRows(
            spark.range(0, third).toDF("id")).withColumn(
            "amount", col("amount") + 1.0)),
        spark.range(third, 2 * third).toDF("id"))
      val v2 = protoStore.versions("base").last

      def sample(breakChain: Boolean): (ParquetTableStore, java.nio.file.Path, Double) = {
        val root = java.nio.file.Files.createTempDirectory("ivm-run")
        copyTree(proto, root)
        if (breakChain)
          // v2's own marker — deleting an EARLIER version's would
          // leave the (v1 → v2) walk intact
          java.nio.file.Files.delete(root.resolve("base")
            .resolve("changes").resolve(v2).resolve("_PARENT"))
        val store = new ParquetTableStore(spark, root.toString, nBuckets = 64)
        System.gc()
        val t0 = System.nanoTime()
        IncrementalView.refresh(store, "base", Seq("id"), "view", vdef, v1, v2)
        (store, root, (System.nanoTime() - t0) / 1e9)
      }

      val recordedSamples = (1 to runs).map(_ => sample(breakChain = false))
      val refreshSec = recordedSamples.map(_._3).min
      // keep the first recorded sample for the equality check; free
      // every other copy immediately
      val (refStore, refRoot, _) = recordedSamples.head
      recordedSamples.tail.foreach(s => rmTree(s._2))
      val diffSec = (1 to runs).map { _ =>
        val (_, root, sec) = sample(breakChain = true)
        rmTree(root); sec
      }.min

      val recomputeSec = (1 to runs).map { _ =>
        val out = java.nio.file.Files.createTempDirectory("ivm-recompute")
        System.gc()
        val t0 = System.nanoTime()
        IncrementalView.compute(refStore.read("base").get, vdef)
          .write.mode("overwrite").parquet(out.toString + "/view")
        val sec = (System.nanoTime() - t0) / 1e9
        rmTree(out); sec
      }.min

      // equality: the refreshed view == a recompute, bit-for-bit
      val recomputed = IncrementalView.compute(refStore.read("base").get, vdef)
        .select("grp", "n", "sum_amount")
      val refreshed = refStore.read("view").get
        .select("grp", "n", "sum_amount")
      val drift = refreshed.except(recomputed).count() +
        recomputed.except(refreshed).count()
      assert(drift == 0, s"refresh drifted from recompute: $drift rows")

      println(f"""{"metric":"ivm_stress","base_rows":$nBase,""" +
        f""""delta_rows":$nDelta,"groups":$groups,""" +
        f""""refresh_recorded_sec":$refreshSec%.3f,""" +
        f""""refresh_snapshot_diff_sec":$diffSec%.3f,""" +
        f""""recompute_sec":$recomputeSec%.3f}""")
      rmTree(refRoot); rmTree(proto)
    }
    spark.stop()
  }
}
