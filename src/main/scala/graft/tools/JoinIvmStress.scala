package graft.tools

import graft.cdc.{IncrementalJoinView, IncrementalView, ParquetTableStore}
import graft.cdc.IncrementalJoinView.JoinViewDef
import graft.cdc.IncrementalView.ViewDef
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the join-view IVM cost model's two legs separately —
  * because they scale DIFFERENTLY, and the honest statement of that
  * difference is the design guidance:
  *
  *  - ΔL refresh (orders churn, the high-frequency case): leg 1 is
  *    ΔL ⋈ R@to where the join keys are R's merge PKs, so the right
  *    snapshot is a `readKeysPrunedAt` POINT LOOKUP — cost is
  *    delta-sized and must stay FLAT as the big left table grows;
  *  - ΔR refresh (customer attribute churn, the rare case): leg 2 is
  *    L@from ⋈ ΔR — ONE scan of the big left snapshot with the
  *    broadcast delta. Table-linear by design (there is no index of
  *    L by the join key); the measurement shows the line so a
  *    deployment knows to batch dimension churn rather than pay the
  *    scan per tiny delta;
  *  - RECOMPUTE: the full join + aggregation — the table-linear
  *    baseline both refresh paths must beat.
  *
  * Equality of the refreshed view vs a recompute of the joined
  * snapshot is asserted per size (exact decimal sums). */
object JoinIvmStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-join-ivm-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sizes = sys.env.getOrElse("SPARK_GRAFT_JIVM_BASES",
      "1000000,8000000").split(",").map(_.trim.toLong).toSeq
    val nDelta = sys.env.getOrElse("SPARK_GRAFT_JIVM_DELTA", "1000").toLong
    val nCust = 10000
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt

    def ordRows(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("oid"),
      pmod(xxhash64(col("id")), lit(nCust)).cast("long").as("ck"),
      (pmod(xxhash64(col("id"), lit(1)), lit(10000)) / 100.0).as("amount"))

    def custRows(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("custkey"),
      pmod(xxhash64(col("id"), lit(2)), lit(20)).cast("string").as("region"))

    val jdef = JoinViewDef(
      left = "ord", leftPks = Seq("oid"),
      right = "cust", rightPks = Seq("custkey"),
      leftKeys = Seq("ck"), rightKeys = Seq("custkey"),
      view = "rev", vdef = ViewDef(Seq("region"), Seq("amount")))
    val emptyO = Seq.empty[Long].toDF("oid")
    val emptyC = Seq.empty[Long].toDF("custkey")

    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(src)
      try walk.forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      } finally walk.close()
    }
    def rmTree(p: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }

    sizes.foreach { nBase =>
      val proto = java.nio.file.Files.createTempDirectory("jivm-proto")
      val protoStore = new ParquetTableStore(spark, proto.toString,
        nBuckets = 64)
      protoStore.applyChanges("ord", Seq("oid"),
        ordRows(spark.range(nBase).toDF("id")), emptyO)
      protoStore.applyChanges("cust", Seq("custkey"),
        custRows(spark.range(nCust).toDF("id")), emptyC)
      IncrementalJoinView.initialize(protoStore, jdef)
      val vL1 = protoStore.version("ord").get
      val vR1 = protoStore.version("cust").get

      // ΔL: inserts + amount updates + deletes, 1/3 each
      val third = nDelta / 3
      protoStore.applyChanges("ord", Seq("oid"),
        ordRows(spark.range(nBase, nBase + third).toDF("id"))
          .unionByName(ordRows(spark.range(0, third).toDF("id"))
            .withColumn("amount", col("amount") + 1.0)),
        spark.range(third, 2 * third).toDF("id").toDF("oid"))
      val vL2 = protoStore.version("ord").get
      // ΔR: 100 customers move region (the rare dimension churn)
      protoStore.applyChanges("cust", Seq("custkey"),
        custRows(spark.range(100).toDF("id"))
          .withColumn("region",
            pmod(xxhash64(col("custkey"), lit(3)), lit(20)).cast("string")),
        emptyC)
      val vR2 = protoStore.version("cust").get

      def timed(body: ParquetTableStore => Unit): Double = {
        val root = java.nio.file.Files.createTempDirectory("jivm-run")
        copyTree(proto, root)
        val store = new ParquetTableStore(spark, root.toString, nBuckets = 64)
        System.gc()
        val t0 = System.nanoTime()
        body(store)
        val sec = (System.nanoTime() - t0) / 1e9
        rmTree(root)
        sec
      }

      val dLSec = (1 to runs).map(_ => timed { s =>
        IncrementalJoinView.refresh(s, jdef, vL1, vL2, vR1, vR1)
      }).min
      val dRSec = (1 to runs).map(_ => timed { s =>
        IncrementalJoinView.refresh(s, jdef, vL1, vL1, vR1, vR2)
      }).min
      val recomputeSec = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val joined = protoStore.readVersion("ord", vL2).join(
          protoStore.readVersion("cust", vR2)
            .withColumnRenamed("custkey", "ck"), "ck")
        IncrementalView.compute(joined, jdef.vdef).count() // agg materialized
        (System.nanoTime() - t0) / 1e9
      }.min

      // equality: both refreshes applied in sequence == a recompute
      val eqRoot = java.nio.file.Files.createTempDirectory("jivm-eq")
      copyTree(proto, eqRoot)
      val eqStore = new ParquetTableStore(spark, eqRoot.toString, nBuckets = 64)
      IncrementalJoinView.refreshToCurrent(eqStore, jdef)
      val joined = eqStore.read("ord").get.join(
        eqStore.read("cust").get.withColumnRenamed("custkey", "ck"), "ck")
      val expected = IncrementalView.compute(joined, jdef.vdef)
        .select("region", "n", "sum_amount")
      val got = eqStore.read("rev").get.select("region", "n", "sum_amount")
      val drift = got.except(expected).count() + expected.except(got).count()
      assert(drift == 0, s"join-view refresh drifted: $drift rows")
      rmTree(eqRoot); rmTree(proto)

      println(f"""{"metric":"join_ivm_stress","base_rows":$nBase,""" +
        f""""delta_rows":$nDelta,"customers":$nCust,""" +
        f""""refresh_deltaL_sec":$dLSec%.3f,""" +
        f""""refresh_deltaR_sec":$dRSec%.3f,""" +
        f""""recompute_sec":$recomputeSec%.3f}""")
    }
    spark.stop()
  }
}
