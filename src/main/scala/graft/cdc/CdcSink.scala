package graft.cdc

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.collection.concurrent.TrieMap

/** Where a micro-batch of compacted changes lands. `upserts` carries full
  * row images (the `after` image), `deleteKeys` carries PK tuples only.
  * Both arrive pre-deduplicated (one change per key, last writer wins),
  * so every implementation can apply them idempotently — the contract
  * that makes at-least-once replay safe (SURVEY.md §2-A C1).
  */
trait CdcSink extends Serializable {
  def applyChanges(target: String, pks: Seq[String],
      upserts: DataFrame, deleteKeys: DataFrame): Unit
}

/** JDBC sink with the reference's UPSERT/DELETE semantics
  * (DebeziumToPostgresConsumer.java:197-253): dynamic
  * `INSERT … ON CONFLICT (pks) DO UPDATE SET col=EXCLUDED.col`,
  * lowercased identifiers, all-PK degenerate case self-assigns, DELETE
  * by PK from the before-image.
  *
  * Strict upgrades over the reference (noted in SURVEY.md §2-A X2): one
  * connection per partition instead of one global, prepared-statement
  * reuse + addBatch/executeBatch instead of one round-trip per record,
  * one commit per partition instead of autocommit per statement. At
  * cluster scale each executor core streams its partition into the DB.
  */
class JdbcUpsertSink(url: String, user: String, password: String,
    batchSize: Int = 500) extends CdcSink {

  def applyChanges(target: String, pks: Seq[String],
      upserts: DataFrame, deleteKeys: DataFrame): Unit = {
    val upCols = upserts.columns.toSeq.map(_.toLowerCase)
    val upSql = JdbcUpsertSink.upsertSql(target, upCols, pks)
    val delSql = JdbcUpsertSink.deleteSql(target, pks)
    val (u, p, bs) = (user, password, batchSize)
    val jdbcUrl = url

    upserts.foreachPartition { rows: Iterator[Row] =>
      JdbcUpsertSink.withConnection(jdbcUrl, u, p) { conn =>
        val st = conn.prepareStatement(upSql)
        var n = 0
        rows.foreach { r =>
          (0 until r.length).foreach(i => st.setObject(i + 1, r.get(i)))
          st.addBatch(); n += 1
          if (n % bs == 0) st.executeBatch()
        }
        st.executeBatch(); conn.commit()
      }
    }
    deleteKeys.foreachPartition { rows: Iterator[Row] =>
      JdbcUpsertSink.withConnection(jdbcUrl, u, p) { conn =>
        val st = conn.prepareStatement(delSql)
        var n = 0
        rows.foreach { r =>
          (0 until r.length).foreach(i => st.setObject(i + 1, r.get(i)))
          st.addBatch(); n += 1
          if (n % bs == 0) st.executeBatch()
        }
        st.executeBatch(); conn.commit()
      }
    }
  }
}

object JdbcUpsertSink {

  private def withConnection(url: String, user: String, password: String)
      (f: java.sql.Connection => Unit): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, user, password)
    try { conn.setAutoCommit(false); f(conn) } finally conn.close()
  }

  // Identifier whitelist: values are parameterized but identifiers are
  // interpolated, and with schema inference enabled column names come
  // from untrusted CDC JSON keys — a crafted envelope key must fail
  // fast here, never reach the sink database as SQL.
  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r

  private def ident(name: String): String = {
    val lc = name.toLowerCase
    require(Ident.matches(lc), s"illegal SQL identifier: '$name'")
    lc
  }

  /** `INSERT INTO t (cols) VALUES (?…) ON CONFLICT (pks) DO UPDATE SET
    * col=EXCLUDED.col…`; all-PK tables degenerate to a no-op
    * self-assignment (reference :222-232). Identifiers lowercased
    * (reference :210) and validated against `[A-Za-z_][A-Za-z0-9_]*`. */
  def upsertSql(target: String, cols: Seq[String], pks: Seq[String]): String = {
    val lc = cols.map(ident)
    val lpk = pks.map(ident)
    val nonPk = lc.filterNot(lpk.contains)
    val sets =
      if (nonPk.isEmpty) lpk.map(c => s"$c = EXCLUDED.$c")
      else nonPk.map(c => s"$c = EXCLUDED.$c")
    s"INSERT INTO ${ident(target)} (${lc.mkString(", ")}) " +
      s"VALUES (${lc.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${lpk.mkString(", ")}) DO UPDATE SET ${sets.mkString(", ")}"
  }

  /** `DELETE FROM t WHERE pk1 = ? AND pk2 = ?…` (reference :234-253). */
  def deleteSql(target: String, pks: Seq[String]): String =
    s"DELETE FROM ${ident(target)} WHERE " +
      pks.map(p => s"${ident(p)} = ?").mkString(" AND ")
}

/** Driver-memory sink for tests and interactive inspection: the
  * materialized state is a Map per table keyed by PK tuple. Collects to
  * the driver — test-scale only by design (golden scenarios, property
  * tests); production paths use the JDBC or parquet sinks. */
class InMemorySink extends CdcSink {
  val tables: TrieMap[String, TrieMap[Seq[Any], Map[String, Any]]] = TrieMap.empty

  def state(target: String): Map[Seq[Any], Map[String, Any]] =
    tables.get(target).map(_.toMap).getOrElse(Map.empty)

  def applyChanges(target: String, pks: Seq[String],
      upserts: DataFrame, deleteKeys: DataFrame): Unit = {
    val t = tables.getOrElseUpdate(target, TrieMap.empty)
    val upCols = upserts.columns.toSeq
    upserts.collect().foreach { r =>
      val m = upCols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
      t.put(pks.map(m), m)
    }
    val delCols = deleteKeys.columns.toSeq
    deleteKeys.collect().foreach { r =>
      val m = delCols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
      t.remove(pks.map(m))
    }
  }
}

/** Spark-native materialized table: a versioned parquet directory per
  * target table, advanced by an anti-join merge each batch
  * (current ⟕̸ changed-keys ∪ upserts). This is the in-engine variant of
  * the reference's Postgres mirror; on a real deployment the same merge
  * is one `MERGE INTO` against Delta/Iceberg — the anti-join here is the
  * same shuffle the table format would run. Writes a new version dir and
  * flips a pointer file, so readers never see a half-written table and a
  * replayed batch (at-least-once) simply rewrites the same content.
  */
class ParquetTableStore(spark: SparkSession, root: String,
    partitioning: Map[String, Seq[String]] = Map.empty) extends CdcSink {
  import org.apache.spark.sql.functions.col
  import java.nio.file.{Files, Paths, StandardCopyOption}

  private def dir(t: String) = Paths.get(root, t)
  private def pointer(t: String) = dir(t).resolve("_LATEST")

  def read(target: String): Option[DataFrame] = {
    val p = pointer(target)
    if (Files.exists(p)) {
      val v = new String(Files.readAllBytes(p)).trim
      Some(spark.read.parquet(dir(target).resolve(v).toString))
    } else None
  }

  /** All retained versions of a table, oldest first. */
  def versions(target: String): Seq[String] = {
    val d = dir(target).toFile
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("v"))
      .map(_.getName).sorted.toSeq
  }

  /** Time travel: read the table as of an older version (each batch
    * writes a full new version, so any retained version is a complete,
    * consistent snapshot — the poor man's Delta time travel). */
  def readVersion(target: String, version: String): DataFrame =
    spark.read.parquet(dir(target).resolve(version).toString)

  /** Drop all but the newest `keep` versions (never the current one).
    * Returns the deleted version names. */
  def vacuum(target: String, keep: Int = 2): Seq[String] = {
    val vs = versions(target)
    val current = {
      val p = pointer(target)
      if (Files.exists(p)) new String(Files.readAllBytes(p)).trim else ""
    }
    val doomed = vs.dropRight(math.max(keep, 1)).filterNot(_ == current)
    doomed.foreach { v =>
      val d = dir(target).resolve(v)
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
    doomed
  }

  def applyChanges(target: String, pks: Seq[String],
      upserts: DataFrame, deleteKeys: DataFrame): Unit = {
    val changedKeys = upserts.select(pks.map(col): _*)
      .unionByName(deleteKeys.select(pks.map(col): _*)).distinct()
    val next = read(target) match {
      // allowMissingColumns: schema evolution — a column added (or
      // dropped) by later source DDL widens the table with nulls
      // instead of failing the merge
      case Some(cur) => cur.join(changedKeys, pks, "left_anti")
        .unionByName(upserts, allowMissingColumns = true)
      case None => upserts
    }
    val version = s"v${System.currentTimeMillis()}"
    Files.createDirectories(dir(target))
    // configured layout (e.g. by tenant/date): partition pruning on
    // reads of the materialized table at scale
    val writer = partitioning.get(target) match {
      case Some(cols) if cols.nonEmpty =>
        next.write.mode("overwrite").partitionBy(cols: _*)
      case _ => next.write.mode("overwrite")
    }
    writer.parquet(dir(target).resolve(version).toString)
    val tmp = dir(target).resolve("_LATEST.tmp")
    Files.write(tmp, version.getBytes)
    Files.move(tmp, pointer(target), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
