package graft.tools

import graft.cdc.{IncrementalView, ParquetTableStore}
import graft.cdc.IncrementalView.ViewDef
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prices MIN/MAX view maintenance (the K-extreme buffer design) at
  * growing base sizes. Three timed refresh paths per base size, all
  * over the RECORDED change feed (the IvmStress winner), 1k-row
  * deltas, 200 groups:
  *
  *  - SUMS-ONLY: the invertible baseline — what the buffer machinery
  *    must not meaningfully exceed on ordinary deltas;
  *  - MIN/MAX BENIGN: same delta against a mins+maxs view. Deletes
  *    hit random mid-range rows, so buffers splice locally or ignore;
  *    zero group rebuilds — the expected steady-state path;
  *  - MIN/MAX DRAIN STORM: the delta deletes every group's bufK+2
  *    smallest values, draining ALL 200 min buffers at once — the
  *    worst case, every touched group pays the semi-joined rebuild
  *    against the base snapshot. This bounds the blast radius: cost
  *    approaches one recompute of the TOUCHED groups, never more,
  *    and the storm requires ≥bufK same-side extremum deletes per
  *    group in one span (tune bufK to the workload's delete shape).
  *
  * After each refresh the min/max scalars are asserted equal to a
  * recompute (exact decimals) and the buffers prefix-checked — the
  * stress doubles as a larger-scale correctness drill for the exact
  * invariant the unit specs pin at toy sizes.
  */
object ViewMinMaxStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-view-minmax-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sizes = sys.env.getOrElse("SPARK_GRAFT_IVM_BASES", "1000000,8000000")
      .split(",").map(_.trim.toLong).toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val groups = 200
    val bufK = 8

    def baseRows(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id"),
      pmod(xxhash64(col("id")), lit(groups)).cast("string").as("grp"),
      (pmod(xxhash64(col("id"), lit(1)), lit(10000)) / 100.0).as("amount"))

    val sumsDef = ViewDef(Seq("grp"), Seq("amount"))
    val mmDef = ViewDef(Seq("grp"), Seq("amount"),
      mins = Seq("amount"), maxs = Seq("amount"), bufK = bufK)
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
    def rmTree(p: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }

    sizes.foreach { nBase =>
      // one scenario per (view shape, delta shape); a fresh copy per
      // timed sample (refresh mutates the view)
      def buildProto(vdef: ViewDef, drainStorm: Boolean):
          (java.nio.file.Path, String, String) = {
        val proto = java.nio.file.Files.createTempDirectory("mmview-proto")
        val store = new ParquetTableStore(spark, proto.toString, nBuckets = 64)
        store.applyChanges("base", Seq("id"),
          baseRows(spark.range(nBase).toDF("id")), empty)
        IncrementalView.initialize(store, "base", "view", vdef)
        val v1 = store.versions("base").last
        val delKeys =
          if (drainStorm)
            // every group's bufK+2 smallest amounts — all buffers drain
            baseRows(spark.range(nBase).toDF("id"))
              .withColumn("rk", row_number().over(
                Window.partitionBy("grp").orderBy("amount", "id")))
              .filter(col("rk") <= bufK + 2).select("id")
          else spark.range(nBase / 2, nBase / 2 + 2000).toDF("id")
        store.applyChanges("base", Seq("id"),
          baseRows(spark.range(nBase, nBase + 500).toDF("id"))
            .unionByName(baseRows(spark.range(0, 500).toDF("id"))
              .withColumn("amount", col("amount") + 1.0)),
          delKeys)
        (proto, v1, store.versions("base").last)
      }

      def timeRefresh(vdef: ViewDef, drainStorm: Boolean): Double = {
        val (proto, v1, v2) = buildProto(vdef, drainStorm)
        val secs = (1 to runs).map { i =>
          val root = java.nio.file.Files.createTempDirectory("mmview-run")
          copyTree(proto, root)
          val store = new ParquetTableStore(spark, root.toString, nBuckets = 64)
          System.gc()
          val t0 = System.nanoTime()
          IncrementalView.refresh(store, "base", Seq("id"), "view", vdef, v1, v2)
          val sec = (System.nanoTime() - t0) / 1e9
          if (i == runs && (vdef.mins.nonEmpty || vdef.maxs.nonEmpty)) {
            // correctness drill at stress scale: scalars exact,
            // buffers prefixes of a recompute's
            val exp = IncrementalView.compute(store.read("base").get, vdef)
              .selectExpr("grp", "n", "sum_amount", "minb_amount",
                "maxb_amount")
              .collect().map(r => r.getString(0) -> r).toMap
            IncrementalView.read(store, "view", vdef).get
              .selectExpr("grp", "n", "sum_amount", "minb_amount",
                "maxb_amount")
              .collect().foreach { r =>
                val e = exp(r.getString(0))
                require(r.getLong(1) == e.getLong(1) &&
                  r.getDecimal(2) == e.getDecimal(2), s"n/sum drift at $r")
                val (gm, em) = (r.getSeq[java.math.BigDecimal](3),
                  e.getSeq[java.math.BigDecimal](3))
                val (gx, ex) = (r.getSeq[java.math.BigDecimal](4),
                  e.getSeq[java.math.BigDecimal](4))
                require(gm.nonEmpty && em.startsWith(gm), s"minb drift at $r")
                require(gx.nonEmpty && ex.startsWith(gx), s"maxb drift at $r")
              }
          }
          rmTree(root); sec
        }
        rmTree(proto)
        secs.min
      }

      val sumsSec = timeRefresh(sumsDef, drainStorm = false)
      val mmSec = timeRefresh(mmDef, drainStorm = false)
      val stormSec = timeRefresh(mmDef, drainStorm = true)

      println(f"""{"metric":"view_minmax_stress","base_rows":$nBase,""" +
        f""""groups":$groups,"buf_k":$bufK,""" +
        f""""refresh_sums_sec":$sumsSec%.3f,""" +
        f""""refresh_minmax_sec":$mmSec%.3f,""" +
        f""""refresh_minmax_drainstorm_sec":$stormSec%.3f}""")
    }
    spark.stop()
  }
}
