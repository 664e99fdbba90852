package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 optimization equivalence: q_pagerank / q_ppr collapse the
  * 10 damped iterations onto the collected bounded event-type graph
  * (RankLoops). This spec re-runs the PREVIOUS Spark-loop formulation
  * (keyed join + aggregate per round, exactly the pre-round-14 code)
  * and asserts the rounded outputs match row for row. */
class RankLoopsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def sparkLoop(uniform: Boolean): Map[String, Double] = {
    val s = spark
    val ev = graft.table(s, sfDir, "events")
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val nx = ev.select(col("event_type").as("src"),
      lead(col("event_type"), 1).over(wOrd).as("dst"))
      .filter(col("dst").isNotNull)
    val edges = nx.groupBy("src", "dst").agg(count(lit(1)).as("c"))
    val outd = edges.groupBy("src").agg(sum(col("c")).as("tot"))
    val wts = edges.join(outd, "src")
      .select(col("src"), col("dst"), (col("c") / col("tot")).as("w"))
      .localCheckpoint()
    val nodes = ev.select(col("event_type").as("node")).distinct()
      .localCheckpoint()
    val nn = nodes.agg(count(lit(1)).as("n"))
    val seed = nodes.agg(min(col("node")).as("seed"))
    def restartCol(mass: Double) =
      if (uniform) lit(mass) / col("n")
      else when(col("node") === col("seed"), lit(mass)).otherwise(lit(0.0))
    val base =
      if (uniform) nodes.crossJoin(broadcast(nn))
      else nodes.crossJoin(broadcast(seed))
    var p = base.select(col("node"), restartCol(1.0).as("r"))
    for (_ <- 1 to 10) {
      val inflow = wts
        .join(p.withColumnRenamed("node", "src"), "src")
        .groupBy("dst").agg(sum(col("r") * col("w")).as("inflow"))
      p = base
        .join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          (restartCol(0.15) + lit(0.85) * coalesce(col("inflow"), lit(0.0)))
            .as("r"))
        .localCheckpoint()
    }
    p.select(col("node"), (round(col("r"), 6) + lit(0.0)).as("out"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("q_pagerank (driver loop) == the previous Spark-loop formulation") {
    val legacy = sparkLoop(uniform = true)
    val got = graft.SparkEntry.queries("q_pagerank")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === legacy)
  }

  test("q_ppr (driver loop) == the previous Spark-loop formulation") {
    val legacy = sparkLoop(uniform = false)
    val got = graft.SparkEntry.queries("q_ppr")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === legacy)
  }
}
