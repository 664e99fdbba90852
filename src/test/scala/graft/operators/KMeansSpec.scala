package graft.operators

import graft.TestSpark
import graft.functions.{VecSum, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spherical k-means trainer + the vec_sum aggregate under it. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 3 planted clusters around orthogonal axes, 30 vectors each; ids
    * chosen so the % 30 seed sample lands one seed near each cluster. */
  private lazy val planted = {
    val base = Seq(
      Array(1.0f, 0f, 0f, 0f), Array(0f, 1.0f, 0f, 0f), Array(0f, 0f, 1.0f, 0f))
    val rows = for {
      c <- 0 until 3
      i <- 0 until 30
    } yield {
      val jitter = 0.05f * ((i % 7) - 3) / 3f
      val v = base(c).clone()
      v(3) = jitter
      ((c * 30 + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("vec_sum equals the exploded component sum") {
    VecSum.register(spark)
    val viaAgg = planted.groupBy(col("vec_id") % 2)
      .agg(call_function("vec_sum", col("embedding")).as("s"))
      .select(posexplode(col("s")))
      .select(col("pos"), col("col").as("v"))
      .groupBy("pos").agg(graft.sumExact(col("v")).as("total"))
    val viaExplode = planted.select(posexplode(col("embedding")))
      .select(col("pos"), col("col").cast("double").as("v"))
      .groupBy("pos").agg(graft.sumExact(col("v")).as("total"))
    val a = viaAgg.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val b = viaExplode.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    a.foreach { case (p, v) => assert(math.abs(v - b(p)) < 1e-9, s"pos $p") }
  }

  test("vec_sum plans as an ObjectHashAggregate (no explode, no sort)") {
    VecSum.register(spark)
    val plan = planted.groupBy(col("vec_id") % 5)
      .agg(call_function("vec_sum", col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Generate") && !plan.contains("SortAggregate"), plan)
  }

  test("vec_sum skips nulls and returns null for all-null groups") {
    VecSum.register(spark)
    val df = Seq((0L, Some(Seq(1.0f, 2.0f))), (0L, None), (1L, None))
      .toDF("g", "embedding")
    val out = df.groupBy("g")
      .agg(call_function("vec_sum", col("embedding")).as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(0L).isDefined && out(1L).isEmpty)
  }

  test("lloyd recovers planted clusters and inertia is non-increasing") {
    val seeds = 30 // vec_id % 30 == 0 → ids 0, 30, 60: one seed per planted cluster
    val history = (0 to 3).map { iters =>
      val (centroids, assigned) = KMeansOps.lloyd(planted, seeds, iters)
      (iters, KMeansOps.inertia(assigned, centroids), assigned)
    }
    history.sliding(2).foreach { case Seq((_, j0, _), (i, j1, _)) =>
      assert(j1 <= j0 + 1e-12, s"inertia rose at iteration $i: $j0 -> $j1")
    }
    val (_, _, finalAssign) = history.last
    // every planted cluster maps to exactly one centroid
    val purity = finalAssign
      .withColumn("truth", floor(col("vec_id") / 30))
      .groupBy("truth").agg(countDistinct("centroid_id").as("k"))
      .collect().map(_.getLong(1))
    assert(purity.forall(_ === 1L), purity.mkString(","))
  }

  test("lloyd fixpoint assignment equals brute-force nearest centroid") {
    val (centroids, assigned) = KMeansOps.lloyd(planted, 30, 3)
    VectorOps.ensure(spark)
    val brute = planted.crossJoin(broadcast(centroids))
      .withColumn("d", round(VectorOps.cosine(col("embedding"), col("cv")), 6))
      .groupBy("vec_id")
      .agg(expr("argmax_by(cid, d, cid)").as("expected"))
    val mismatches = assigned.join(brute, "vec_id")
      .filter(col("centroid_id") =!= col("expected"))
    assert(mismatches.isEmpty)
  }

  test("q_kmeans_update means match the trainer's first-iteration update") {
    val dir = "/root/testdata/sf0.001"
    val fromQuery = graft.SparkEntry.queries("q_kmeans_update")(spark, dir)
      .select(col("centroid_id"), col("pos"), col("mean"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val e = graft.table(spark, dir, "embeddings")
    VecSum.register(spark)
    val fromTrainer = SimilarityOps.ivfAssign(e, 97)
      .groupBy("centroid_id")
      .agg(call_function("vec_sum", col("embedding")).as("vsum"),
        count(lit(1)).as("n"))
      .select(col("centroid_id"), posexplode(expr("transform(vsum, x -> round(x / n, 6))")))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getDouble(2)).toMap
    assert(fromQuery.keySet === fromTrainer.keySet)
    fromQuery.foreach { case (k, v) =>
      assert(math.abs(v - fromTrainer(k)) < 1e-9, s"$k: $v vs ${fromTrainer(k)}")
    }
  }
}
