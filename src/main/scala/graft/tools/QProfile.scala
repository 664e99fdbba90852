package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

/** Dev probe (round-14 optimization workhorse): run named declared
  * queries repeatedly under the bench's session settings and print
  * per-execution wall seconds, PROCESS-CPU seconds (catches per-task
  * CPU burn that 32-way parallelism hides from wall time), and the
  * per-stage breakdown (id, millis, tasks, head of the stage name) so
  * a slow query can be attributed to a stage without the UI.
  *
  * usage: runMain graft.tools.QProfile [sfDir] [reps] q_a q_b ...
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("QPROFILE_CODEGEN_CACHE", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = for {
            a <- i.completionTime; b <- i.submissionTime
          } yield a - b
          stages.add(f"    stage ${i.stageId}%3d ${ms.getOrElse(-1L)}%6d ms " +
            f"tasks=${i.numTasks}%3d ${i.name.takeWhile(_ != '\n').take(70)}")
        }
      })
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    // warmup like the bench
    table(spark, dir, "region").limit(1).count()
    SparkEntry.queries.get("q_agg_pricing").foreach(_(spark, dir).count())
    stages.clear()
    (1 to reps).foreach { rep =>
      names.foreach { name =>
        graft.operators.DedupOps.clearMemos()
        System.gc()
        spark.sparkContext.setJobDescription(s"qprofile: $name rep $rep")
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        println(f"[qp] $name rep $rep: wall $wall%.2f s, cpu $cpu%.1f s")
        if (sys.env.contains("QPROFILE_STAGES")) {
          var s = stages.poll()
          while (s != null) { println(s); s = stages.poll() }
        } else stages.clear()
        spark.sparkContext.setJobDescription(null)
      }
    }
    spark.stop()
  }
}
