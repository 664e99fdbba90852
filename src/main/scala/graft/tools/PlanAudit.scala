package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit for named driver queries: prints, per query, the
  * join strategies chosen, the parquet PushedFilters, and the number of
  * whole-stage-codegen spans — the three things each round's scale
  * review checks first. Usage:
  *
  *   runMain graft.tools.PlanAudit [sfDir] [query...]
  *
  * With no query names, audits every SparkEntry query.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      try {
        val p = graft.SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.executedPlan.toString
        def c(s: String) = p.linesIterator.count(_.contains(s))
        println(s"== $n: bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")}" +
          s" bnl=${c("BroadcastNestedLoop")} exch=${c("Exchange")}" +
          s" codegen=${c("WholeStageCodegen")}")
        "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(p).toList.distinct
          .filter(_.length > "PushedFilters: []".length)
          .take(4).foreach(f => println("   " + f.take(180)))
      } catch {
        case e: Throwable => println(s"== $n: FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
