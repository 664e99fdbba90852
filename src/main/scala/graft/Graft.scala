package graft

import org.apache.spark.sql.SparkSession

/** Public entry point for library users: a session pre-configured the
  * way the engine expects (extensions installed, AQE on, UTC, shuffle
  * parallelism sized to cores instead of the 200 default).
  */
object Graft {
  def session(master: String = "local[*]",
      appName: String = "graft"): SparkSession = {
    val cores = Runtime.getRuntime.availableProcessors()
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // generated-class cache sized for a many-query session (see
      // Bench.scala for the measurement); compiled code only, no data
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .getOrCreate()
    s
  }

  /** Register every corpus table of an sf directory as a temp view, so
    * `spark.sql` answers ad-hoc queries over them. */
  def registerCorpus(spark: SparkSession, dir: String): Unit =
    views(spark, dir, "region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")

  /** Register the current state of CDC-materialized tables as temp
    * views — the engine's replacement for the reference's "psql into
    * the Postgres mirror" read path (e.g. the verification query
    * /root/reference/README.md:131-134 runs verbatim via spark.sql). */
  def registerMirror(spark: SparkSession, store: graft.cdc.ParquetTableStore,
      tables: Seq[String]): Unit =
    tables.foreach(t => store.read(t).foreach(_.createOrReplaceTempView(t)))
}
