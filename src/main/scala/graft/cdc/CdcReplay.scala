package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** CLI: replay a directory of change-event files (JSON lines shaped like
  * the Kafka source: topic/key/value/partition/offset) into a
  * Spark-native materialized table store, then print the final state of
  * each table — the engine's equivalent of the reference's "insert into
  * MySQL, then SELECT from Postgres" verification loop
  * (/root/reference/README.md:85-134).
  *
  * Usage: graft.cdc.CdcReplay <inDir> <storeDir> [configProperties]
  *        graft.cdc.CdcReplay --stateful <inDir>   (state-store changelog view)
  *        graft.cdc.CdcReplay --scd2 <inDir>       (SCD2 audit history view)
  */
object CdcReplay {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--stateful")) { statefulReplay(args(1)); return }
    if (args.headOption.contains("--scd2")) { scd2Replay(args(1)); return }
    // flag pairs = --sql <query>, --asof <epoch-ms>; positional args =
    // everything outside them
    val sqlIdx = args.indexOf("--sql")
    val afterSql =
      if (sqlIdx < 0) args.toSeq
      else args.toSeq.patch(sqlIdx, Nil, 2)
    val asofIdx = afterSql.indexOf("--asof")
    // time-travel replay: rebuild the mirror as of this envelope ts_ms
    // (the CDC dual of q_state_at; Materializer scopes decoded events)
    val asOfMs = if (asofIdx < 0) None else Some(afterSql(asofIdx + 1).toLong)
    val positional =
      if (asofIdx < 0) afterSql else afterSql.patch(asofIdx, Nil, 2)
    val inDir = positional(0)
    val storeDir = positional(1)
    val catalog = positional.lift(2) match {
      case Some(path) =>
        CdcCatalog.fromPropertiesString(
          new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
      case None =>
        // 3-tier resolution like the reference ($CONSUMER_CONFIG →
        // ./config.properties → classpath), defaulting if none exists.
        try CdcCatalog.load() catch {
          case _: IllegalStateException =>
            CdcCatalog.fromPropertiesString("pk.customers=id\npk.orders=id\n")
        }
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-cdc-replay")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sink = new ParquetTableStore(spark, storeDir)
    val ckpt = java.nio.file.Files.createTempDirectory("cdc-replay-ckpt")
    val dlqDir = s"$storeDir/_dlq"
    val q = CdcPipeline.start(
      CdcPipeline.fileSource(spark, inDir), catalog,
      Envelope.defaultRegistry, sink, ckpt.toString,
      trigger = Trigger.ProcessingTime(0), dlqDir = Some(dlqDir),
      asOfMs = asOfMs)
    q.processAllAvailable()
    q.stop()

    val tables = new java.io.File(storeDir).listFiles()
      .filter(f => f.isDirectory && f.getName != "_dlq").map(_.getName).sorted
    tables.foreach { t =>
      println(s"=== $t ===")
      sink.read(t).foreach(df => df.orderBy(df.columns.head).show(100, truncate = false))
    }
    val dlqTables = Option(new java.io.File(dlqDir).listFiles()).getOrElse(Array.empty)
    dlqTables.filter(_.isDirectory).foreach { t =>
      println(s"=== DLQ ${t.getName} ===")
      spark.read.json(t.toString).show(20, truncate = false)
    }
    // --sql "<query>": the read path — mirror tables as SQL views (the
    // engine's psql-into-the-sink equivalent, README.md:131-134).
    args.indexOf("--sql") match {
      case i if i >= 0 && args.length > i + 1 =>
        graft.Graft.registerMirror(spark, sink, tables.toSeq)
        println(s"=== sql: ${args(i + 1)} ===")
        spark.sql(args(i + 1)).show(100, truncate = false)
      case _ => ()
    }
    spark.stop()
  }

  /** SCD2 audit view: the full version history of every key with
    * validity intervals (`Scd2History`) — what the Type-1 mirror
    * overwrites away. Batch read of the same file-shaped feed. */
  private def scd2Replay(inDir: String): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cdc-scd2-replay")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val catalog = try CdcCatalog.load() catch {
      case _: IllegalStateException =>
        CdcCatalog.fromPropertiesString("pk.customers=id\npk.orders=id\n")
    }
    val raw = spark.read.schema(Decode.rawSchema).json(inDir)
    println("=== scd2 history ===")
    Scd2History.history(raw, catalog)
      .orderBy("db", "table", "key_json", "valid_from_ms")
      .show(200, truncate = false)
    spark.stop()
  }

  /** Changelog view: the same file stream through the in-engine
    * state-store materializer (dynamic map decode) — prints every
    * emitted key image (op-applied row or delete marker). */
  private def statefulReplay(inDir: String): Unit = {
    import org.apache.spark.sql.functions.{col, concat_ws}
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cdc-stateful-replay")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val decoded = Decode.decode(
      CdcPipeline.fileSource(spark, inDir), Envelope.dynamicRowSchema)
      .select(
        concat_ws("/", col("table"),
          org.apache.spark.sql.functions.coalesce(
            col("after.id"), col("before.id"))).as("key"),
        col("op"), col("offset"), col("after"))
      .as[StatefulMaterializer.KeyedChange]
    val q = StatefulMaterializer.materialize(decoded)
      .writeStream.format("memory").queryName("changelog")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    println("=== changelog (state-store materialization) ===")
    spark.table("changelog").orderBy("key").show(100, truncate = false)
    spark.stop()
  }
}
