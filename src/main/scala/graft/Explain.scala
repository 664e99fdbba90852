package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of the named
  * queries (all, if none given) so pushdown/broadcast/codegen can be
  * audited — `runMain graft.Explain [sfDir] [query...]`.
  *
  * A `--summary` first flag prints, instead of full plans, one line per
  * query with the join strategies chosen, exchange count, and the
  * parquet PushedFilters — the compact form each round's scale review
  * reads first.
  *
  * Arguments starting with `sql:` are executed as ad-hoc SQL over the
  * registered corpus views (engine functions like vec_dot available via
  * GraftExtensions) and both explained and shown. */
object Explain {
  def main(args: Array[String]): Unit = {
    val (flags, rest) = args.partition(_ == "--summary")
    val summary = flags.nonEmpty
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (rest.length > 1) rest.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach {
      case sql if sql.startsWith("sql:") =>
        views(spark, sfDir, "region", "nation", "customer", "supplier",
          "part", "orders", "lineitem", "events", "documents", "embeddings")
        println(s"\n########## $sql ##########")
        val df = spark.sql(sql.stripPrefix("sql:"))
        df.explain("formatted")
        df.show(20, truncate = false)
      case n if summary =>
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          // drive THIS queryExecution (df.count() would execute a
          // derivative plan and leave this one un-finalized): with AQE,
          // codegen stages and the actually-chosen join strategies only
          // exist in the FINAL adaptive plan
          df.queryExecution.toRdd.count()
          // the finalized AdaptiveSparkPlan prints "Final Plan" AND
          // "Initial Plan" sections — keep only the final one, or
          // every node would count twice
          val full = df.queryExecution.executedPlan.toString
          val p = full.indexOf("== Initial Plan ==") match {
            case -1 => full
            case i => full.substring(0, i)
          }
          def c(s: String) = p.linesIterator.count(_.contains(s))
          // codegen stages appear as "*(n) Op" prefixes in plan
          // toString, not as literal WholeStageCodegen nodes; count
          // DISTINCT stage ids so a 5-operator fused stage counts once
          val codegen = "\\*\\((\\d+)\\)".r
            .findAllMatchIn(p).map(_.group(1)).toSet.size
          println(s"== $n: bhj=${c("BroadcastHashJoin")}" +
            s" smj=${c("SortMergeJoin")} bnl=${c("BroadcastNestedLoop")}" +
            s" exch=${c("Exchange")} codegen=$codegen")
          "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(p).toList.distinct
            .filter(_.length > "PushedFilters: []".length)
            .take(4).foreach(f => println("   " + f.take(180)))
        } catch {
          case e: Throwable => println(s"== $n: FAILED ${e.getMessage}")
        }
      case n =>
        println(s"\n########## $n ##########")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
