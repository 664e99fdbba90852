package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of the named
  * queries (all, if none given) so pushdown/broadcast/codegen can be
  * audited — `runMain graft.Explain [sfDir] [query...]`.
  *
  * Arguments starting with `sql:` are executed as ad-hoc SQL over the
  * registered corpus views (engine functions like vec_dot available via
  * GraftExtensions) and both explained and shown. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
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
      case n =>
        println(s"\n########## $n ##########")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
