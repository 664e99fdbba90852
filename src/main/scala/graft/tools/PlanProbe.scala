package graft.tools

import graft._

/** Dev probe: print a query's finalized (post-AQE) physical plan —
  * the same rendering PlanAuditSpec audits, for interactive budget
  * tuning. Usage: runMain graft.tools.PlanProbe <query> [sfDir]. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("local[8]", "plan-probe")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = SparkEntry.queries(args(0))(spark, dir)
    df.queryExecution.toRdd.count()
    val full = df.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    println(plan)
    spark.stop()
  }
}
