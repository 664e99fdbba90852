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
      .getOrCreate()
    s
  }
}
