package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot bootstrap (SURVEY.md §2-A S1): the alternative to Debezium's
  * own `snapshot.mode=initial` — read the source table once over JDBC
  * and land it in the sink before the binlog stream attaches. Matches
  * the reference's semantics where snapshot rows (op='r') are plain
  * upserts (/root/reference/connectors/mysql-source.json:19,
  * consumer …:175-178).
  *
  * Scale: `partitionColumn`/`numPartitions` shard the snapshot SELECT
  * into parallel range scans, so a TB-scale table bootstraps across the
  * cluster instead of through one connection.
  */
object CdcBootstrap {

  final case class JdbcSource(url: String, user: String, password: String,
      driver: Option[String] = None)

  /** Parallel snapshot read of one source table. */
  def snapshot(spark: SparkSession, src: JdbcSource, table: String,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      bounds: Option[(Long, Long)] = None): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", src.url)
      .option("dbtable", table)
      .option("user", src.user)
      .option("password", src.password)
    src.driver.foreach(d => r = r.option("driver", d))
    (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) =>
        r = r.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", numPartitions)
      case _ => ()
    }
    r.load()
  }

  /** Snapshot every table in the registry into `sink` as upserts (the
    * same idempotent path the stream uses → safe to re-run, and safe to
    * overlap with Debezium's own op='r' events). */
  def bootstrap(spark: SparkSession, src: JdbcSource, catalog: CdcCatalog,
      db: String, tables: Seq[String], sink: CdcSink): Unit =
    tables.foreach { t =>
      val df = snapshot(spark, src, s"$db.$t")
      val pks = catalog.pkFor(db, t)
      val target = catalog.targetFor(db, t)
      sink.applyChanges(target, pks, df, df.limit(0).select(pks.map(df.col): _*))
    }
}
