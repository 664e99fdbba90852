package graft.tools

import graft._
import graft.operators.{ProductQuant, SimilarityOps}
import org.apache.spark.sql.functions._

/** Dev probe: per-phase timing of q_sim_ann_pq (train / encode / ADC
  * search) across repeated executions — isolates which phase carries
  * the run-to-run variance the bench sees. */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = Graft.session(s"local[$cpus]", "pq-profile")
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
            f"tasks=${i.numTasks}%3d ${i.name.takeWhile(_ != '\n').take(60)}")
        }
      })
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[pq] $label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      var s = stages.poll()
      while (s != null) { println(s); s = stages.poll() }
    }
    (1 to reps).foreach { rep =>
      println(s"[pq] --- rep $rep ---")
      val e = table(spark, dir, "embeddings")
      val centroids = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      var assigned: org.apache.spark.sql.DataFrame = null
      var books: org.apache.spark.sql.DataFrame = null
      var codes: org.apache.spark.sql.DataFrame = null
      t("assign") { assigned = SimilarityOps.ivfAssign(e, 97).localCheckpoint() }
      t("train") { books = ProductQuant.train(assigned, centroids,
        ProductQuant.M, ProductQuant.CbMod).localCheckpoint() }
      t("encode") {
        codes = ProductQuant.encode(assigned, centroids, books, ProductQuant.M)
        codes.write.format("noop").mode("overwrite").save()
      }
      t("search") {
        ProductQuant.adcSearch(codes, books, centroids, e, q, 10, 8, 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
