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

/** How one upsert row becomes SQL. A dialect yields (sql, row-column
  * indices bound as its parameters) pairs, executed in order per row
  * with shared batching. */
trait UpsertDialect extends Serializable {
  def upsert(target: String, cols: Seq[String], pks: Seq[String]): Seq[(String, Seq[Int])]
}

/** The reference's Postgres dialect: one `INSERT … ON CONFLICT` per row
  * (DebeziumToPostgresConsumer.java:197-232). */
object PostgresUpsertDialect extends UpsertDialect {
  def upsert(target: String, cols: Seq[String], pks: Seq[String]): Seq[(String, Seq[Int])] =
    Seq(JdbcUpsertSink.upsertSql(target, cols, pks) -> cols.indices.toSeq)
}

/** ANSI-portable dialect: DELETE by PK then INSERT. Row-level result is
  * identical to ON CONFLICT because batches arrive pre-compacted — at
  * most one change per key — so the delete can never swallow a
  * same-batch sibling. Lets the identical sink path run against any
  * JDBC database (exercised live on embedded Derby in tests). */
object PortableUpsertDialect extends UpsertDialect {
  def upsert(target: String, cols: Seq[String], pks: Seq[String]): Seq[(String, Seq[Int])] = {
    val lc = cols.map(_.toLowerCase)
    val pkIdx = pks.map(p => lc.indexOf(p.toLowerCase))
    require(pkIdx.forall(_ >= 0), s"pks $pks not all present in $cols")
    Seq(
      JdbcUpsertSink.deleteSql(target, pks) -> pkIdx,
      s"INSERT INTO ${target.toLowerCase} (${lc.mkString(", ")}) " +
        s"VALUES (${lc.map(_ => "?").mkString(", ")})" -> cols.indices.toSeq)
  }
}

/** Opens connections on executors; swap in tests to observe the wire. */
trait ConnectionFactory extends Serializable {
  def connect(): java.sql.Connection
}

case class DriverManagerFactory(url: String, user: String, password: String)
    extends ConnectionFactory {
  def connect(): java.sql.Connection =
    java.sql.DriverManager.getConnection(url, user, password)
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
class JdbcUpsertSink(factory: ConnectionFactory, batchSize: Int = 500,
    dialect: UpsertDialect = PostgresUpsertDialect) extends CdcSink {

  def this(url: String, user: String, password: String, batchSize: Int) =
    this(DriverManagerFactory(url, user, password), batchSize)
  def this(url: String, user: String, password: String) =
    this(url, user, password, 500)

  private def run(df: DataFrame, units: Seq[(String, Seq[Int])]): Unit = {
    val (f, bs) = (factory, batchSize)
    df.foreachPartition { rows: Iterator[Row] =>
      JdbcUpsertSink.withConnection(f) { conn =>
        JdbcUpsertSink.writeRows(conn, rows, units, bs)
        conn.commit()
      }
    }
  }

  /** Like [[run]], but each partition first consults the batch ledger
    * and skips its writes entirely when `(target, batchId, unit,
    * partition)` was already committed — the ledger row is inserted in
    * the SAME transaction as the data, so a crash before commit leaves
    * no ledger entry and the replay re-applies cleanly. */
  private def runIdempotent(df: DataFrame, units: Seq[(String, Seq[Int])],
      target: String, batchId: Long, unit: String): Unit = {
    val (f, bs) = (factory, batchSize)
    df.foreachPartition { rows: Iterator[Row] =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      JdbcUpsertSink.withConnection(f) { conn =>
        if (!JdbcUpsertSink.batchApplied(conn, target, batchId, unit, pid)) {
          JdbcUpsertSink.writeRows(conn, rows, units, bs)
          JdbcUpsertSink.recordBatch(conn, target, batchId, unit, pid)
          conn.commit()
        } else {
          conn.rollback() // release the probe's read transaction
        }
      }
    }
  }

  def applyChanges(target: String, pks: Seq[String],
      upserts: DataFrame, deleteKeys: DataFrame): Unit = {
    val upCols = upserts.columns.toSeq.map(_.toLowerCase)
    run(upserts, dialect.upsert(target, upCols, pks))
    run(deleteKeys,
      Seq(JdbcUpsertSink.deleteSql(target, pks) -> deleteKeys.columns.indices.toSeq))
  }

  /** [[applyChanges]] with an exactly-once EFFECT under replay: a
    * transactional `(target, batch_id, unit, partition)` ledger row
    * commits atomically with each partition's writes, and an
    * already-ledgered partition skips the wire entirely.
    *
    * The reference's contract is at-least-once + idempotent row
    * semantics (SURVEY §2-A C1) — replays converge but RE-WRITE every
    * row. This upgrade makes the replay wire-invisible: zero statements
    * reach the database the second time (JdbcSinkLiveSpec counts them,
    * and proves via an out-of-band sentinel that a replay cannot even
    * overwrite a concurrent manual fix). Defense in depth, not a
    * replacement: if a replay arrives with a DIFFERENT partitioning
    * (repartitioned job, changed AQE plan), unledgered partitions fall
    * back to the idempotent upsert path and converge as before.
    * `batchId` is the streaming micro-batch id (foreachBatch's) or any
    * monotone replay-stable epoch.
    */
  def applyChangesIdempotent(target: String, pks: Seq[String],
      upserts: DataFrame, deleteKeys: DataFrame, batchId: Long): Unit = {
    JdbcUpsertSink.ensureLedger(factory)
    val upCols = upserts.columns.toSeq.map(_.toLowerCase)
    runIdempotent(upserts, dialect.upsert(target, upCols, pks),
      target, batchId, "u")
    runIdempotent(deleteKeys,
      Seq(JdbcUpsertSink.deleteSql(target, pks) -> deleteKeys.columns.indices.toSeq),
      target, batchId, "d")
  }
}

object JdbcUpsertSink {

  private[cdc] def withConnection(factory: ConnectionFactory)
      (f: java.sql.Connection => Unit): Unit = {
    val conn = factory.connect()
    try { conn.setAutoCommit(false); f(conn) } finally conn.close()
  }

  /** The shared prepared-statement write loop: every row through every
    * unit's statement, flushed in `bs`-sized JDBC batches. Commits are
    * the caller's responsibility. */
  private[cdc] def writeRows(conn: java.sql.Connection, rows: Iterator[Row],
      units: Seq[(String, Seq[Int])], bs: Int): Unit = {
    val sts = units.map { case (sql, idx) => conn.prepareStatement(sql) -> idx }
    var n = 0
    def flush(): Unit = sts.foreach(_._1.executeBatch())
    rows.foreach { r =>
      sts.foreach { case (st, idx) =>
        idx.zipWithIndex.foreach { case (ri, pi) => st.setObject(pi + 1, r.get(ri)) }
        st.addBatch()
      }
      n += 1
      if (n % bs == 0) flush()
    }
    flush()
  }

  /** Batch ledger: `(target, batch_id, unit, part_id)` primary key;
    * `target` is a parameterized VALUE here (never interpolated), so
    * arbitrary table names can't reach the ledger SQL. */
  private[cdc] val LedgerTable = "graft_applied_batches"

  private[cdc] def ensureLedger(factory: ConnectionFactory): Unit =
    withConnection(factory) { conn =>
      try {
        conn.createStatement().execute(
          s"CREATE TABLE $LedgerTable (target VARCHAR(128) NOT NULL, " +
            "batch_id BIGINT NOT NULL, unit VARCHAR(8) NOT NULL, " +
            "part_id INT NOT NULL, " +
            "PRIMARY KEY (target, batch_id, unit, part_id))")
        conn.commit()
      } catch {
        case _: java.sql.SQLException =>
          conn.rollback() // table exists (no portable IF NOT EXISTS);
          // probe it — anything else (permissions, bad schema) rethrows
          conn.createStatement()
            .executeQuery(s"SELECT COUNT(*) FROM $LedgerTable").close()
          conn.rollback() // release the probe's read transaction
      }
    }

  private[cdc] def batchApplied(conn: java.sql.Connection, target: String,
      batchId: Long, unit: String, partId: Int): Boolean = {
    val st = conn.prepareStatement(s"SELECT 1 FROM $LedgerTable " +
      "WHERE target = ? AND batch_id = ? AND unit = ? AND part_id = ?")
    st.setString(1, target); st.setLong(2, batchId)
    st.setString(3, unit); st.setInt(4, partId)
    val rs = st.executeQuery()
    try rs.next() finally { rs.close(); st.close() }
  }

  private[cdc] def recordBatch(conn: java.sql.Connection, target: String,
      batchId: Long, unit: String, partId: Int): Unit = {
    val st = conn.prepareStatement(s"INSERT INTO $LedgerTable " +
      "(target, batch_id, unit, part_id) VALUES (?, ?, ?, ?)")
    st.setString(1, target); st.setLong(2, batchId)
    st.setString(3, unit); st.setInt(4, partId)
    st.executeUpdate(); st.close()
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

/** A writer lost the optimistic-concurrency race: another writer
  * committed the successor version first. The losing merge's staged
  * data, manifest and change feed are cleaned up before this is
  * thrown; the caller re-reads the (new) current version and retries
  * its applyChanges from fresh state. */
class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

/** Spark-native materialized table with bucket-scoped merges: data
  * files live under hash buckets of the primary key, and each batch
  * rewrites ONLY the buckets that contain changed keys — per-batch cost
  * is O(batch + touched buckets), not O(table), which is what makes the
  * in-engine mirror viable when the table is 100 TB and a micro-batch
  * touches a handful of keys. This is the same file-level rewrite a
  * Delta/Iceberg `MERGE INTO` performs.
  *
  * Layout per table:
  * {{{
  *   <root>/<table>/_log/<seq>.commit  version-log entry (the commit)
  *   <root>/<table>/v<ts>.manifest     bucket -> data path, one per line
  *   <root>/<table>/data/<batch>/_b=N/ parquet for bucket N from <batch>
  *   <root>/<table>/changes/<version>/ recorded change data feed
  *   <root>/<table>/_stats/<ver>.stats per-bucket zone maps (tracked tables)
  * }}}
  *
  * A version is a manifest: unchanged buckets carry their previous data
  * path forward, so every retained version is a complete consistent
  * snapshot (time travel) while sharing unchanged files.
  *
  * COMMIT PROTOCOL (rename-free — deployable where the 100 TB lives).
  * All filesystem access rides the root's HADOOP FileSystem, so the
  * same store runs on `file:`, `hdfs://` and `s3a://` roots. A merge
  * stages its data dirs, its manifest and its recorded change feed
  * (all invisible — nothing references them yet), then commits by
  * EXCLUSIVELY creating `_log/<seq>.commit` (20-digit zero-padded
  * monotonic sequence, content `<manifest-name>\n#END`) at
  * `parentSeq + 1` — the Delta `_delta_log` shape. The current version
  * is the HIGHEST WELL-FORMED log entry:
  *
  *  - Torn commit: log-entry VISIBILITY IS ATOMIC WITH CONTENT
  *    (IndexFs.createExclusive publishes via hard-link on local
  *    roots, temp+rename on HDFS, conditional put on object stores),
  *    so a crash leaves either a complete entry or nothing — a torn
  *    slot can only come from the check-then-act residual (object
  *    stores without conditional put) or a pre-fix writer. Either
  *    way it fails the `#END` terminator check and readers serve the
  *    previous entry; the next writer grants it a bounded grace
  *    window (in case it is merely in-flight on a residual store)
  *    then skips over the corpse and commits above it.
  *  - Concurrent writers from the same parent: the exclusive create
  *    arbitrates — exactly one wins the slot; the loser's staged
  *    files are deleted and it gets [[ConcurrentWriteException]]
  *    (clean loss; retry from the new current version).
  *  - Atomicity of the exclusive create: temp-file + `link(2)` on
  *    local roots, temp-file + atomic non-overwriting rename on
  *    HDFS, S3A conditional puts on recent Hadoop (the same
  *    contract Delta requires of its LogStore).
  *
  * Stores written by the pre-log protocol are adopted transparently:
  * when the log has no entry, the legacy `_LATEST` pointer resolves
  * (at sequence 0) and the next commit starts the log above it.
  *
  * A replayed batch (at-least-once) rewrites the same buckets with the
  * same content, so replay converges; metadata markers
  * (`readMarker`/`writeMarker`) carry the same `#END` torn-write guard.
  */
class ParquetTableStore(private[cdc] val spark: SparkSession, root: String,
    partitioning: Map[String, Seq[String]] = Map.empty,
    nBuckets: Int = 64,
    statsColumns: Map[String, Seq[String]] = Map.empty,
    bloomItems: Long = BucketStats.BloomItems) extends CdcSink {
  import org.apache.spark.sql.functions.{broadcast, col, lit, pmod, xxhash64}
  import org.apache.hadoop.fs.Path
  import graft.streaming.IndexFs

  private val rootPath = new Path(root)
  private def dir(t: String) = new Path(rootPath, t)
  private def logDir(t: String) = new Path(dir(t), "_log")

  /** Well-formed small-file terminator — the torn-write guard for
    * commit entries and markers. */
  private val End = "#END"

  private def parseTerminated(content: String): Option[String] = {
    val i = content.lastIndexOf("\n" + End)
    if (i >= 0) Some(content.substring(0, i)) else None
  }

  private val CommitName = """(\d{20})\.commit""".r

  /** Log entries, ascending by sequence. */
  private def logEntries(t: String): Seq[(Long, String)] =
    IndexFs.listNames(spark, logDir(t).toString).collect {
      case n @ CommitName(seq) => (seq.toLong, n)
    }.sortBy(_._1)

  /** (sequence, version) of the highest WELL-FORMED commit; a legacy
    * pre-log `_LATEST` pointer resolves at sequence 0. */
  private def currentCommit(t: String): Option[(Long, String)] =
    logEntries(t).reverseIterator.flatMap { case (seq, name) =>
      IndexFs.readText(spark, new Path(logDir(t), name).toString)
        .flatMap(parseTerminated).map(v => (seq, v.trim))
    }.nextOption().orElse(
      IndexFs.readText(spark, new Path(dir(t), "_LATEST").toString)
        .map(v => (0L, v.trim)))

  private def currentVersion(t: String): Option[String] =
    currentCommit(t).map(_._2)

  /** Commit `version` at the first free log slot from `firstSeq` up.
    * Occupied WELL-FORMED slot = a concurrent writer won from the same
    * parent — this merge is stale, loser cleanup is the caller's.
    * Occupied TORN slot = a crashed commit that never counted — skip
    * over it (readers resolve highest well-formed, so committing above
    * a corpse is safe and unblocks the sequence).
    *
    * Declaring a torn slot a corpse is only safe when visibility is
    * atomic with content (IndexFs.createExclusive's contract on local,
    * HDFS and conditional-put object stores — a crash leaves either a
    * complete entry or nothing). On the check-then-act residual
    * (object stores without conditional put) an in-flight writer COULD
    * briefly expose a partial entry, so a torn slot gets a bounded
    * grace window of re-reads before being skipped: if it completes,
    * this merge correctly loses; only a slot still torn after the
    * window is treated as a corpse. */
  /** Test seam: runs immediately before the commit's exclusive create
    * so specs can interleave a competing writer deterministically into
    * the race window. No-op in production. */
  private[cdc] var onBeforeCommit: () => Unit = () => ()

  /** Torn-slot grace: re-reads × sleep before a torn slot is declared
    * a corpse. Test seam so the corpse-skip specs stay fast. */
  private[cdc] var tornSlotGraceMs: Long = 100L
  private[cdc] var tornSlotGraceReads: Int = 5

  private def commitVersion(t: String, firstSeq: Long,
      version: String): Unit = {
    onBeforeCommit()
    var seq = firstSeq
    while (true) {
      val p = new Path(logDir(t), f"$seq%020d.commit")
      if (IndexFs.createExclusive(spark, p.toString, s"$version\n$End\n"))
        return
      var reads = 0
      var taken = IndexFs.readText(spark, p.toString)
        .flatMap(parseTerminated).isDefined
      while (!taken && reads < tornSlotGraceReads) {
        Thread.sleep(tornSlotGraceMs)
        reads += 1
        taken = IndexFs.readText(spark, p.toString)
          .flatMap(parseTerminated).isDefined
      }
      if (taken)
        throw new ConcurrentWriteException(
          s"commit slot $seq of '$t' was taken by a concurrent writer; " +
            s"this merge (parent of '$version') is stale — re-read the " +
            s"current version and retry")
      seq += 1
    }
  }

  /** bucket -> data directory (absolute), as recorded by `version`.
    * Manifests persist paths RELATIVE to the table dir so a store root
    * can be moved or renamed wholesale without invalidating retained
    * versions; absolute entries (older manifests) pass through as-is. */
  def manifest(target: String, version: String): Map[Int, String] =
    IndexFs.readText(spark, new Path(dir(target), version).toString)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"manifest '$version' of '$target' not found"))
      .split("\n").toSeq.filter(_.nonEmpty)
      .map { line =>
        val Array(b, path) = line.split("\t", 2)
        val abs =
          if (new Path(path).isAbsolute || path.contains("://")) path
          else new Path(dir(target), path).toString
        b.toInt -> abs
      }.toMap

  private def relativeToTable(t: String, abs: String): String = {
    val prefix = dir(t).toString + "/"
    if (abs.startsWith(prefix)) abs.substring(prefix.length) else abs
  }

  /** Scheme-free path form for same-store comparisons (Hadoop
    * listStatus returns fully-qualified paths; manifest resolution may
    * build scheme-less ones). */
  private def norm(p: String): String = new Path(p).toUri.getPath

  // Every table reads as ONE multi-path scan — planning is constant in
  // nBuckets (mergeSchema nulls in columns a bucket predates). Tables
  // with a configured layout keep those columns IN the data files and
  // lay directories out by `_p_<col>=v` copies: Hive-style partition
  // discovery is never involved, so sibling bucket roots from different
  // batch dirs can't trip its single-table-root requirement
  // (CONFLICTING_DIRECTORY_STRUCTURES — discovery demands one common
  // non-partition prefix, which manifest-carried batch dirs never
  // have). File pruning comes from the manifest (bucket level) and the
  // `_p_` dirs stay glob-able for external path-level pruning; a
  // production deployment would put Delta/Iceberg behind this trait
  // and get manifest-native scans with stats-based pruning.
  private def readPaths(target: String, paths: Seq[String]): Option[DataFrame] = {
    val layout = partitioning.getOrElse(target, Seq.empty)
    if (paths.isEmpty) None
    else if (layout.isEmpty)
      // recursiveFileLookup turns partition DISCOVERY off entirely, so
      // sibling `_b=N` bucket roots from different batch dirs can never
      // trip basePath inference or CONFLICTING_DIRECTORY_STRUCTURES —
      // the rename-free layout depends on this (bucket dirs keep their
      // partitionBy names; nothing needs a post-write rename)
      Some(spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true").parquet(paths.sorted: _*))
    else {
      // Back-compat: bucket roots written before layout columns were
      // duplicated into the data files carry them ONLY as Hive
      // `col=value` directory names — a recursive (discovery-free) scan
      // would silently drop those columns. Detect per root with one FS
      // listing; legacy roots get a per-root discovery read, while all
      // current-layout roots still share ONE recursive multi-root scan
      // (a bucket dir is written atomically by one writer version, so
      // layouts never mix inside a root).
      val (legacy, current) = paths.sorted.partition(isLegacyLayout(_, layout))
      val currentScan =
        if (current.isEmpty) None
        else Some(spark.read.option("mergeSchema", "true")
          .option("recursiveFileLookup", "true").parquet(current: _*))
      // Hive partition-column TYPE INFERENCE re-types reconstructed
      // layout columns from directory names ("01234" → int 1234,
      // date-shaped strings → DATE) — cast them back to the type the
      // current-layout data files carry so the union neither corrupts
      // values nor fails on incompatible types. (Pure-legacy stores
      // keep the inferred types: there is no authoritative schema left
      // to prefer, and the pre-migration reader behaved identically.)
      val legacyScans = legacy.map { p =>
        val df = spark.read.option("mergeSchema", "true").parquet(p)
        currentScan match {
          case Some(cur) => layout.foldLeft(df) { (d, c) =>
            cur.schema.find(_.name == c)
              .filter(f => d.columns.contains(c) && d.schema(c).dataType != f.dataType)
              .map(f => d.withColumn(c, col(c).cast(f.dataType)))
              .getOrElse(d)
          }
          case None => df
        }
      }
      Some((currentScan.toSeq ++ legacyScans)
        .reduce(_.unionByName(_, allowMissingColumns = true)))
    }
  }

  // A bucket root's layout never changes after it is written, so the
  // one-FS-listing detection is memoized — repeated reads of a
  // many-bucket table don't re-stat every root.
  private val legacyLayoutMemo =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  private def isLegacyLayout(root: String, layout: Seq[String]): Boolean =
    legacyLayoutMemo.getOrElseUpdate(root,
      IndexFs.childDirs(spark, root).exists(name =>
        layout.exists(col => name.startsWith(s"$col="))))

  def read(target: String): Option[DataFrame] =
    currentVersion(target).flatMap(v =>
      readPaths(target, manifest(target, v).values.toSeq))

  /** The version `read` serves — the highest committed log entry,
    * which is the only authority (a manifest file orphaned by a crash
    * between manifest write and commit is NOT current, so callers
    * recording "the version I saw" must use this, never
    * `versions(target).last`). */
  def version(target: String): Option[String] = currentVersion(target)

  /** Small metadata sidecar per table (e.g. the base version an
    * incremental view reflects — `IncrementalView`'s `_REFLECTS`).
    * Written rename-free (overwrite put) with the `#END` terminator; a
    * torn marker reads as ABSENT, which every marker protocol treats
    * as its safe direction (`_REFLECTS` absent → re-initialize;
    * `_REFRESH_INTENT` absent → no recovery claim to honor).
    *
    * LEGACY markers (pre-log protocol) were written atomically via
    * tmp + ATOMIC_MOVE with the bare value and NO trailing newline —
    * they can never be torn, and requiring the terminator would read
    * every pre-upgrade `_REFLECTS` as absent (silent full rebuild of
    * every incremental view on upgrade). Newline-free content is
    * therefore accepted as a complete legacy value. Residual: a torn
    * CURRENT-format write cut before its first newline also reads
    * newline-free — for `_REFLECTS` a truncated version name simply
    * fails the retained-version lookup and falls back to the rebuild
    * it would have gotten anyway; `_REFRESH_INTENT` recovery
    * additionally validates field shape before honoring a claim. */
  def readMarker(target: String, name: String): Option[String] =
    IndexFs.readText(spark, new Path(dir(target), name).toString)
      .flatMap(c => parseTerminated(c).orElse(
        if (!c.contains("\n") && c.nonEmpty) Some(c) else None))

  def writeMarker(target: String, name: String, value: String): Unit =
    IndexFs.writeText(spark, new Path(dir(target), name).toString,
      s"$value\n$End\n")

  def removeMarker(target: String, name: String): Unit =
    IndexFs.delete(spark, new Path(dir(target), name).toString)

  /** All retained versions of a table, oldest first. */
  def versions(target: String): Seq[String] =
    IndexFs.listNames(spark, dir(target).toString)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .sorted

  /** Time travel: read the table as of an older version. Manifests pin
    * the exact data paths of every bucket at write time, so any
    * retained version is a complete, consistent snapshot even though
    * versions share unchanged bucket files. */
  def readVersion(target: String, version: String): DataFrame =
    readPaths(target, manifest(target, version).values.toSeq)
      .getOrElse(spark.emptyDataFrame)

  // ---- pruned reads ---------------------------------------------------
  // The read-side answer to "the manifest IS the bucket-level file
  // pruning": three ways to open FEWER than all nBuckets bucket dirs.
  //  - readKeys: point lookups — the key hash names its bucket, so a
  //    k-key probe opens ≤ k of nBuckets dirs regardless of table size.
  //  - readRange: zone maps — per-bucket min/max recorded at merge
  //    time (`_stats/<version>.stats` sidecar, carry-forward like
  //    manifest paths). On a HASH-bucketed layout these prune columns
  //    whose values correlate with the bucket (low-cardinality or
  //    PK-derived); uniform high-cardinality columns span every bucket
  //    and honestly don't prune — see BucketStats and SCALING.md.
  //  - readPartitionEq: the configured `_p_<col>=v` layout dirs,
  //    narrowed per bucket root by a glob — value-level path pruning
  //    for the declared partition columns.
  // A torn or missing stats sidecar degrades to a full scan (never a
  // wrong prune); every API returns its PruneReport twin so specs and
  // the stress tool assert on buckets OPENED, not on wall-clock.

  private def statsDir(t: String) = new Path(dir(t), "_stats")
  private def statsPath(t: String, version: String) =
    new Path(statsDir(t), version.stripSuffix(".manifest") + ".stats")

  private def readStatsFile(t: String,
      version: String): Option[Map[Int, Map[String, ColStats]]] =
    IndexFs.readText(spark, statsPath(t, version).toString)
      .flatMap(parseTerminated).map(BucketStats.parse)

  /** The zone maps backing the CURRENT version (None when the table
    * is not stats-tracked or the sidecar is torn/absent). */
  def bucketStats(target: String): Option[Map[Int, Map[String, ColStats]]] =
    currentVersion(target).flatMap(readStatsFile(target, _))

  /** `column BETWEEN lo AND hi` (either bound optional, NULL never
    * matches) reading only buckets whose zone maps may overlap. */
  def readRange(target: String, column: String, lo: Option[Any],
      hi: Option[Any]): Option[DataFrame] =
    readRangePruned(target, column, lo, hi).map(_._1)

  def readRangePruned(target: String, column: String, lo: Option[Any],
      hi: Option[Any]): Option[(DataFrame, PruneReport)] =
    currentVersion(target).flatMap(
      readRangePrunedAt(target, _, column, lo, hi))

  /** Version-pinned twin: the same pruned range read against a
    * RETAINED version — a reader pinning one snapshot for a
    * multi-query session stays consistent while merges continue
    * (sidecars are retained and vacuumed with their manifests, so
    * time travel and pruning reach exactly the same history). */
  def readRangePrunedAt(target: String, version: String, column: String,
      lo: Option[Any], hi: Option[Any]): Option[(DataFrame, PruneReport)] = {
    require(lo.nonEmpty || hi.nonEmpty,
      "readRange needs at least one bound")
    val loE = lo.map(BucketStats.encodeBound)
    val hiE = hi.map(BucketStats.encodeBound)
    val m = manifest(target, version)
    val keep = readStatsFile(target, version) match {
      case Some(st) => m.keySet.filter { b =>
        st.get(b).flatMap(_.get(column)) match {
          case Some(cs) => BucketStats.mayOverlap(cs, loE, hiE)
          case None => true // untracked bucket/column: never mis-prune
        }
      }
      case None => m.keySet
    }
    val resid = (lo.map(col(column) >= lit(_)) ++
      hi.map(col(column) <= lit(_))).reduce(_ && _)
    statFiltered(target, m, keep, column, resid, lo.orElse(hi))
  }

  /** `column = value` reading only buckets whose zone maps (min/max +
    * membership bloom) may contain the value. The bloom is what makes
    * point predicates prunable on a HASH-bucketED layout at all — a
    * value present in k rows lives in ≤ k buckets, and every other
    * bucket's bloom proves its absence (false positives only ever
    * open extra buckets). */
  def readEq(target: String, column: String, value: Any): Option[DataFrame] =
    readEqPruned(target, column, value).map(_._1)

  def readEqPruned(target: String, column: String,
      value: Any): Option[(DataFrame, PruneReport)] =
    currentVersion(target).flatMap(readEqPrunedAt(target, _, column, value))

  /** Version-pinned twin of [[readEqPruned]] (see readRangePrunedAt). */
  def readEqPrunedAt(target: String, version: String, column: String,
      value: Any): Option[(DataFrame, PruneReport)] = {
    val m = manifest(target, version)
    val keep = readStatsFile(target, version) match {
      case Some(st) => m.keySet.filter { b =>
        st.get(b).flatMap(_.get(column)) match {
          case Some(cs) => BucketStats.mayContainEq(cs, value)
          case None => true
        }
      }
      case None => m.keySet
    }
    statFiltered(target, m, keep, column, col(column) === lit(value),
      Some(value))
  }

  private def statFiltered(target: String, m: Map[Int, String],
      keep: Set[Int], column: String,
      resid: org.apache.spark.sql.Column,
      boundSample: Option[Any]): Option[(DataFrame, PruneReport)] = {
    val report = PruneReport(m.size, keep.size)
    // Schema evolution: a version written before `column` existed has
    // it in NO file of the kept buckets — the predicate must see an
    // all-NULL column (range/eq never match NULL: zero rows, honestly
    // unpruned), not an unresolved-column failure. Only the unborn
    // case is patched; a column present in ANY kept file comes from
    // the mergeSchema read as usual. The patched null is TYPED from
    // the predicate's own bound (the one type the call proves it
    // expects) so a provably-empty pruned read never exposes NullType
    // to consumers unioning it with sibling reads; a bound whose type
    // has no literal form falls back to NullType (documented residual).
    val nullCol = boundSample.flatMap(v =>
      scala.util.Try(org.apache.spark.sql.catalyst.expressions
        .Literal(v).dataType).toOption)
      .map(dt => lit(null).cast(dt)).getOrElse(lit(null))
    def withCol(df: DataFrame): DataFrame =
      if (df.columns.contains(column)) df
      else df.withColumn(column, nullCol)
    if (keep.isEmpty)
      // provably empty; limit(0) keeps the schema and costs zero IO
      // (OptimizeLimitZero collapses it to an empty relation)
      readPaths(target, m.values.toSeq.sorted.take(1))
        .map(df => (withCol(df).filter(resid).limit(0), report))
    else
      readPaths(target, keep.toSeq.sorted.flatMap(m.get))
        .map(df => (withCol(df).filter(resid), report))
  }

  /** Point lookups: rows of `target` matching the (small, driver-side
    * broadcastable) key set. `keys` carries exactly the pk columns
    * WITH THE TABLE'S TYPES — the bucket is recomputed with the same
    * `xxhash64(pks)` the merge used, so a type mismatch would probe
    * the wrong bucket; the semi-join below would then return nothing
    * rather than wrong rows. Opens ≤ |distinct key buckets| dirs. */
  def readKeys(target: String, pks: Seq[String],
      keys: DataFrame): Option[DataFrame] =
    readKeysPruned(target, pks, keys).map(_._1)

  def readKeysPruned(target: String, pks: Seq[String],
      keys: DataFrame): Option[(DataFrame, PruneReport)] =
    currentVersion(target).flatMap(readKeysPrunedAt(target, _, pks, keys))

  /** Version-pinned twin of [[readKeysPruned]] (see readRangePrunedAt). */
  def readKeysPrunedAt(target: String, version: String, pks: Seq[String],
      keys: DataFrame): Option[(DataFrame, PruneReport)] = {
    val bucketOf = pmod(xxhash64(pks.map(col): _*), lit(nBuckets)).cast("int")
    val m = manifest(target, version)
    // ≤ nBuckets scalars — bucket ids, not data
    val wanted = keys.select(bucketOf.as("_b")).distinct()
      .collect().map(_.getInt(0)).toSet
    val keep = m.keySet.intersect(wanted)
    val report = PruneReport(m.size, keep.size)
    if (keep.isEmpty)
      readPaths(target, m.values.toSeq.sorted.take(1))
        .map(df => (df.limit(0), report))
    else
      readPaths(target, keep.toSeq.sorted.flatMap(m.get)).map { df =>
        (df.join(broadcast(keys.select(pks.map(col): _*).distinct()),
          pks, "left_semi"), report)
      }
  }

  /** `column = value` over a configured layout column, narrowing each
    * bucket root to its `_p_<column>=<value>` subtree (deeper layout
    * levels via glob). Buckets with no matching subtree are skipped
    * entirely. Legacy-layout roots (pre-`_p_` stores) carry the value
    * only as a reconstructed directory column, so their presence
    * degrades this table to a full read + filter — correct, just
    * unpruned. */
  def readPartitionEq(target: String, column: String,
      value: String): Option[DataFrame] =
    readPartitionEqPruned(target, column, value).map(_._1)

  def readPartitionEqPruned(target: String, column: String,
      value: String): Option[(DataFrame, PruneReport)] =
    partitionPruned(target, column, col(column) === lit(value),
      v => v == value)

  /** `lo <= column <= hi` (either bound optional) over a configured
    * layout column, keeping only the `_p_<column>=v` subtrees whose
    * DIRECTORY NAME falls in the range — the 100 TB time-slice scan.
    * Values compare as STRINGS, the partition-dir contract (ISO
    * dates, zero-padded counters); a layout whose values don't sort
    * lexicographically belongs in zone maps, not dir names. */
  def readPartitionRange(target: String, column: String, lo: Option[String],
      hi: Option[String]): Option[DataFrame] =
    readPartitionRangePruned(target, column, lo, hi).map(_._1)

  def readPartitionRangePruned(target: String, column: String,
      lo: Option[String], hi: Option[String])
      : Option[(DataFrame, PruneReport)] = {
    require(lo.nonEmpty || hi.nonEmpty,
      "readPartitionRange needs at least one bound")
    val resid = (lo.map(col(column) >= lit(_)) ++
      hi.map(col(column) <= lit(_))).reduce(_ && _)
    partitionPruned(target, column, resid,
      v => lo.forall(v >= _) && hi.forall(v <= _))
  }

  /** Shared dir-pruning walk: glob each bucket root's subtree level
    * for `column`, keep leaf dirs whose value passes `keep`, read only
    * those (residual filter applied — dir names are authoritative for
    * the value, the filter is defense in depth). Legacy-layout roots
    * (pre-`_p_` stores) carry values only as reconstructed directory
    * columns, so their presence degrades the table to a full read +
    * filter — correct, just unpruned. */
  private def partitionPruned(target: String, column: String,
      resid: org.apache.spark.sql.Column,
      keep: String => Boolean): Option[(DataFrame, PruneReport)] = {
    val layout = partitioning.getOrElse(target, Seq.empty)
    require(layout.contains(column),
      s"'$column' is not a configured layout column of '$target' " +
        s"(layout: ${layout.mkString(", ")})")
    currentVersion(target).flatMap { v =>
      val m = manifest(target, v)
      val roots = m.values.toSeq.sorted
      if (roots.exists(isLegacyLayout(_, layout)))
        readPaths(target, roots)
          .map(df => (df.filter(resid), PruneReport(m.size, m.size)))
      else {
        val nest = layout.takeWhile(_ != column)
          .map(c => s"_p_$c=*/").mkString
        val prefix = s"_p_$column="
        val perBucket = roots.map { r =>
          r -> IndexFs.glob(spark, s"$r/$nest$prefix*").filter(p =>
            keep(new Path(p).getName.stripPrefix(prefix)))
        }
        val kept = perBucket.filter(_._2.nonEmpty)
        val report = PruneReport(m.size, kept.size)
        if (kept.isEmpty)
          readPaths(target, roots.take(1))
            .map(df => (df.filter(resid).limit(0), report))
        else
          readPaths(target, kept.flatMap(_._2))
            .map(df => (df.filter(resid), report))
      }
    }
  }

  /** The latest retained version committed at or before `ms` (epoch
    * millis) — version names embed their commit wall-clock
    * (`v<millis>-<nanos>`), so TIMESTAMP AS OF resolves with a name
    * scan, no file reads. None when every retained version is newer
    * (or the instant predates a vacuumed history — time travel only
    * reaches retained manifests). */
  def versionAsOf(target: String, ms: Long): Option[String] =
    versions(target).takeWhile { v =>
      v.stripPrefix("v").takeWhile(_ != '-').toLong <= ms
    }.lastOption

  /** TIMESTAMP AS OF read — the Delta/Iceberg query shape. */
  def readAsOf(target: String, ms: Long): Option[DataFrame] =
    versionAsOf(target, ms).map(readVersion(target, _))

  /** Change data feed between two retained versions — what a Delta
    * `table_changes` / Iceberg changelog scan serves: every key whose
    * row differs between the snapshots, tagged `insert` /
    * `update_preimage` / `update_postimage` / `delete` in a
    * `_change_type` column (updates emit both images, the Delta CDF
    * shape downstream incremental consumers expect).
    *
    * Two serving paths, same result (ChangeFeedSpec pins equality):
    *
    *  1. RECORDED (primary — Delta's actual `_change_data` design):
    *     `applyChanges` writes each version's delta-sized change rows
    *     into `changes/<version>/` at merge time, when it already
    *     holds both images. Serving a span reads ONLY those files —
    *     O(Σ deltas) — and SQUASHES per key (first pre-state, last
    *     post-state) so a key inserted then deleted nets to nothing
    *     and an update chain nets to one pre/post pair. Span
    *     completeness is proven by the `_PARENT` chain each change
    *     dir carries — a broken walk (pre-feature store, missing
    *     dirs) drops to path 2.
    *  2. SNAPSHOT DIFF (fallback + the spec's independent verifier):
    *     diff the two manifests, read only buckets whose entries
    *     differ, full-outer-join on the PK. O(touched-bucket ROWS) —
    *     fine when deltas cluster, but a delta of k scattered keys
    *     touches min(k, nBuckets) buckets, so at small nBuckets this
    *     degenerates toward a full-table diff (measured in
    *     tools.IvmStress — the reason the recorded path exists).
    *     Requires BOTH endpoint manifests retained: a span crossing a
    *     VACUUMED version has neither its change dirs nor the old
    *     manifest, so this path fails fast with an actionable message
    *     — consumers standing on a vacuumed version must recompute
    *     from the current snapshot (IncrementalView.refreshToCurrent
    *     does so automatically).
    *
    * Columns align to the union of the involved schemas (missing side
    * reads null) — a column added between the versions surfaces as
    * updates, matching the store's nulls-widening evolution stance. */
  def changesBetween(target: String, pks: Seq[String],
      fromVersion: String, toVersion: String): DataFrame =
    recordedSpan(target, fromVersion, toVersion) match {
      case Some(span) if span.nonEmpty => squashRecorded(target, pks, span)
      case Some(_) => // from == to: empty feed, table-shaped
        readVersion(target, toVersion).filter(lit(false))
          .withColumn("_change_type", lit(""))
      case None => snapshotDiff(target, pks, fromVersion, toVersion)
    }

  private def changesDir(t: String, version: String) =
    new Path(new Path(dir(t), "changes"), version)

  /** The versions strictly after `from` up to `to`, oldest first,
    * IF every step has a recorded change dir and the `_PARENT` chain
    * walks back exactly to `from` (completeness proof). */
  private def recordedSpan(target: String, from: String,
      to: String): Option[Seq[String]] = {
    val acc = scala.collection.mutable.ListBuffer.empty[String]
    var v = to
    while (v != from) {
      val parentFile = new Path(changesDir(target, v), "_PARENT")
      val parentOpt = IndexFs.readText(spark, parentFile.toString)
      if (parentOpt.isEmpty) return None
      acc.prepend(v)
      val parent = parentOpt.get.trim
      if (parent.isEmpty && from.nonEmpty) return None // reached genesis
      v = parent
    }
    Some(acc.toSeq)
  }

  /** Net per-key change over recorded per-version feeds: first event
    * pins the pre-state at `from` (insert ⇒ absent), last event the
    * post-state at `to` (delete ⇒ absent); version names order
    * lexicographically == chronologically, pre-images before
    * post-images within a version. */
  private def squashRecorded(target: String, pks: Seq[String],
      span: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{max_by, min_by, struct, when}
    val evs = spark.read.option("mergeSchema", "true")
      .parquet(span.map(changesDir(target, _).toString): _*)
    val imgCols = evs.columns.toSeq
      .filterNot(c => c == "_change_type" || c == "_cdf_v")
    val rank = when(
      col("_change_type").isin("update_preimage", "delete"), 0).otherwise(1)
    val ev = struct(col("_change_type").as("t"),
      struct(imgCols.map(col): _*).as("img"))
    val ord = struct(col("_cdf_v"), rank.as("r"))
    evs.groupBy(pks.map(col): _*)
      .agg(min_by(ev, ord).as("_first"), max_by(ev, ord).as("_last"))
      .select(
        when(col("_first.t") =!= "insert", col("_first.img")).as("_pre"),
        when(col("_last.t") =!= "delete", col("_last.img")).as("_post"))
      .transform(emitChanges(_, imgCols.filterNot(pks.contains)))
  }

  private def snapshotDiff(target: String, pks: Seq[String],
      fromVersion: String, toVersion: String): DataFrame = {
    import org.apache.spark.sql.functions.struct
    Seq(fromVersion, toVersion).foreach(v =>
      require(IndexFs.exists(spark, new Path(dir(target), v).toString),
        s"version '$v' of '$target' is not retained (vacuumed?) and no " +
          s"recorded change span covers it — a consumer standing on a " +
          s"vacuumed version must recompute from the current snapshot " +
          s"(IncrementalView.refreshToCurrent does this automatically)"))
    val mFrom = manifest(target, fromVersion)
    val mTo = manifest(target, toVersion)
    val changed = (mFrom.keySet ++ mTo.keySet)
      .filter(b => mFrom.get(b) != mTo.get(b)).toSeq.sorted
    val before = readPaths(target, changed.flatMap(mFrom.get))
    val after = readPaths(target, changed.flatMap(mTo.get))
    if (before.isEmpty && after.isEmpty)
      // no bucket differs: an empty feed, shaped like the target table
      return readVersion(target, toVersion).filter(lit(false))
        .withColumn("_change_type", lit(""))

    val cols = (before.map(_.columns.toSeq).getOrElse(Seq.empty) ++
      after.map(_.columns.toSeq).getOrElse(Seq.empty)).distinct
    val base = alignTo(before.getOrElse(after.get), cols).filter(lit(false))
    val b = before.map(alignTo(_, cols)).getOrElse(base)
    val a = after.map(alignTo(_, cols)).getOrElse(base)
    val bj = b.select(pks.map(col) :+
      struct(cols.map(col): _*).as("_pre"): _*)
    val aj = a.select(pks.map(col) :+
      struct(cols.map(col): _*).as("_post"): _*)
    // the one deliberately sort-merge-shaped join in the store: both
    // sides are data-sized per-bucket contents
    bj.join(aj, pks, "full_outer")
      .transform(emitChanges(_, cols.filterNot(pks.contains)))
  }

  private def alignTo(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c =>
      if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)

  /** Record this version's change rows (see changesBetween path 1).
    * `cur` is the prior content of the touched buckets (None on the
    * first batch), CACHED by the caller and shared with the merge —
    * the touched buckets hit parquet once per applyChanges. The
    * classification joins run against the delta-sized `old` slice. A
    * same-value re-upsert records a pre/post pair; the read-side
    * squash drops it, keeping serve semantics identical to the
    * snapshot diff. */
  private def writeChangeFeed(target: String, version: String,
      parentVersion: Option[String], ups: DataFrame, dels: DataFrame,
      pks: Seq[String], cur: Option[DataFrame]): Unit = {
    import org.apache.spark.sql.functions.lit
    val outDir = changesDir(target, version)
    def persist(feed: DataFrame): Unit =
      feed.withColumn("_cdf_v", lit(version))
        .write.mode("overwrite").parquet(outDir.toString)
    cur match {
      case None =>
        persist(ups.withColumn("_change_type", lit("insert")))
      case Some(c) =>
        val cols = (c.columns.toSeq ++ ups.columns).distinct
        val cc = alignTo(c, cols)
        val uu = alignTo(ups, cols)
        val upsKeys = ups.select(pks.map(col): _*).distinct()
        val delKeys = dels.select(pks.map(col): _*).distinct()
        val old = cc.join(upsKeys.unionByName(delKeys).distinct(),
          pks, "left_semi").cache()
        try {
          val oldKeys = old.select(pks.map(col): _*)
          persist(old.join(upsKeys, pks, "left_semi")
            .withColumn("_change_type", lit("update_preimage"))
            .unionByName(old.join(upsKeys, pks, "left_anti")
              .withColumn("_change_type", lit("delete")))
            .unionByName(uu.join(oldKeys, pks, "left_semi")
              .withColumn("_change_type", lit("update_postimage")))
            .unionByName(uu.join(oldKeys, pks, "left_anti")
              .withColumn("_change_type", lit("insert"))))
        } finally old.unpersist()
    }
    // parent marker completes the span-walk proof; underscore prefix
    // keeps parquet reads from picking it up
    IndexFs.writeText(spark, new Path(outDir, "_PARENT").toString,
      parentVersion.getOrElse(""))
  }

  /** (_pre, _post) image pair → Delta-CDF rows. Null pre = absent at
    * `from`, null post = absent at `to`; both null (or per-field
    * null-safe-equal images) emit nothing. */
  private def emitChanges(keyed: DataFrame,
      dataCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{array, explode, struct, when}
    // per-field null-safe comparison, not struct equality — struct
    // ordering semantics around nulls are not the diff contract
    val same = dataCols.map(c => col(s"_pre.$c") <=> col(s"_post.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    keyed.select(
      when(col("_pre").isNull && col("_post").isNotNull, array(
        struct(col("_post").as("img"), lit("insert").as("t"))))
      .when(col("_post").isNull && col("_pre").isNotNull, array(
        struct(col("_pre").as("img"), lit("delete").as("t"))))
      .when(col("_pre").isNotNull && col("_post").isNotNull && !same, array(
        struct(col("_pre").as("img"), lit("update_preimage").as("t")),
        struct(col("_post").as("img"), lit("update_postimage").as("t"))))
      .as("_r"))
      // no-change keys fall through every branch to a NULL array, and
      // explode emits zero rows for null — the filter is implicit
      .select(explode(col("_r")).as("r"))
      .select(col("r.img.*"), col("r.t").as("_change_type"))
  }

  /** CDF from a retained version to the current one. */
  def changesSince(target: String, pks: Seq[String],
      fromVersion: String): DataFrame =
    changesBetween(target, pks, fromVersion,
      currentVersion(target).getOrElse(fromVersion))

  /** Drop all but the newest `keep` versions (never the current one),
    * then delete bucket data directories no retained manifest
    * references. Returns the deleted version names.
    *
    * RETENTION HORIZON (`minAgeMs`): nothing younger than this is ever
    * deleted — the Delta vacuum pattern. A merge stages its data dirs,
    * change feed and stats sidecar BEFORE its commit makes them
    * referenced, so a vacuum racing an in-flight merge would otherwise
    * collect exactly that staged state and leave the merge's committed
    * manifest pointing at missing paths. The horizon makes that
    * impossible as long as it exceeds the longest merge staging
    * duration (write start → commit); the 24 h default is conservative
    * for any realistic batch.
    *
    * API CONSTRAINT — single-writer vacuum: vacuum itself must not run
    * concurrently with ANOTHER vacuum of the same table, and
    * `minAgeMs = 0` additionally requires that no merge is in flight
    * (the pre-horizon stance, kept for tests and quiesced maintenance
    * windows). Concurrent MERGES are safe under a sufficient horizon:
    * their staged state is younger than it by construction. */
  val DefaultVacuumHorizonMs: Long = 24L * 3600 * 1000

  def vacuum(target: String, keep: Int = 2,
      minAgeMs: Long = DefaultVacuumHorizonMs): Seq[String] = {
    val cutoff = System.currentTimeMillis() - math.max(minAgeMs, 0L)
    // FAIL-SAFE age gate: the newest FILE mtime under the candidate
    // (Delta's per-file pattern — object-store connectors synthesize
    // DIRECTORY statuses with mtime 0, so a dir's own mtime would
    // declare an in-flight merge's freshly staged bucket/changes dirs
    // "aged" and collect them). Unknown or zero mtimes are NOT old
    // enough: when age cannot be established, nothing is deleted.
    def oldEnough(p: Path): Boolean =
      IndexFs.newestModifiedAt(spark, p.toString) match {
        case Some(ms) if ms > 0L => ms <= cutoff
        case _ => false
      }
    val vs = versions(target)
    val cur = currentVersion(target)
    val doomed = vs.dropRight(math.max(keep, 1))
      .filterNot(v => cur.contains(v))
      .filter(v => oldEnough(new Path(dir(target), v)))
    doomed.foreach { v =>
      IndexFs.delete(spark, new Path(dir(target), v).toString)
      // the version's recorded change feed goes with it — spans that
      // crossed it break their _PARENT walk and fall back to the
      // snapshot diff over the retained manifests
      IndexFs.deleteRecursive(spark, changesDir(target, v).toString)
      IndexFs.delete(spark, statsPath(target, v).toString)
    }
    // GC: orphan change dirs — a crash between writeChangeFeed and the
    // manifest write leaves a changes/<version>/ no _PARENT walk
    // reaches (correct for serving, invisible forever). Doomed
    // versions' dirs were removed above; anything left that names no
    // retained manifest and isn't the current version is such an
    // orphan. The retention horizon keeps an in-flight merge's
    // pre-commit change dir (younger than the horizon) out of reach.
    val retained = versions(target).toSet
    IndexFs.childDirs(spark, new Path(dir(target), "changes").toString)
      .filterNot(n => retained.contains(n) || cur.contains(n))
      .filter(n => oldEnough(changesDir(target, n)))
      .foreach(n => IndexFs.deleteRecursive(
        spark, changesDir(target, n).toString))
    // stats sidecars follow the same orphan rule (crash between the
    // sidecar write and the commit), keyed by version base name
    val retainedBases = retained.map(_.stripSuffix(".manifest")) ++
      cur.map(_.stripSuffix(".manifest"))
    IndexFs.listNames(spark, statsDir(target).toString)
      .filter(_.endsWith(".stats"))
      .filterNot(n => retainedBases.contains(n.stripSuffix(".stats")))
      .filter(n => oldEnough(new Path(statsDir(target), n)))
      .foreach(n => IndexFs.delete(
        spark, new Path(statsDir(target), n).toString))
    // GC: log entries that commit a version no longer retained (the
    // current one always is), and torn corpses below the current
    // commit — resolution only ever needs the newest well-formed entry
    currentCommit(target).foreach { case (curSeq, _) =>
      logEntries(target).foreach { case (seq, name) =>
        val p = new Path(logDir(target), name)
        val v = IndexFs.readText(spark, p.toString).flatMap(parseTerminated)
          .map(_.trim)
        val prune = v match {
          case Some(ver) => !retained.contains(ver) && !cur.contains(ver)
          case None => seq < curSeq // torn corpse beneath a real commit
        }
        if (prune && oldEnough(p)) IndexFs.delete(spark, p.toString)
      }
    }
    // GC: bucket dirs referenced by no surviving manifest. Bucket dirs
    // are `_b=N` under the rename-free layout, `bN` under the legacy
    // one — both shapes are swept. The horizon protects an in-flight
    // merge's freshly STAGED (not yet referenced) bucket dirs.
    val live = versions(target)
      .flatMap(v => manifest(target, v).values).map(norm).toSet
    val bucketName = "(_b=|b)\\d+"
    val dataRoot = new Path(dir(target), "data")
    IndexFs.childDirs(spark, dataRoot.toString).foreach { batch =>
      val batchDir = new Path(dataRoot, batch)
      IndexFs.listNames(spark, batchDir.toString)
        .filter(_.matches(bucketName))
        .filterNot(b => live.contains(norm(new Path(batchDir, b).toString)))
        .filter(b => oldEnough(new Path(batchDir, b)))
        .foreach(b => IndexFs.deleteRecursive(
          spark, new Path(batchDir, b).toString))
      // a batch dir whose buckets are all gone holds only write
      // markers (_SUCCESS) — drop it whole, or soaks accumulate one
      // empty dir per micro-batch forever (age-gated like its buckets:
      // a brand-new batch dir belongs to a merge that is still staging)
      if (!IndexFs.listNames(spark, batchDir.toString)
          .exists(_.matches(bucketName)) && oldEnough(batchDir))
        IndexFs.deleteRecursive(spark, batchDir.toString)
    }
    doomed
  }

  def applyChanges(target: String, pks: Seq[String],
      upserts: DataFrame, deleteKeys: DataFrame): Unit = {
    import spark.implicits._
    val bucketOf = pmod(xxhash64(pks.map(col): _*), lit(nBuckets)).cast("int")

    // parent resolved ONCE — its sequence is the optimistic-concurrency
    // token the commit below stands on
    val parentCommit: Option[(Long, String)] = currentCommit(target)
    val parentVersion: Option[String] = parentCommit.map(_._2)
    val prior: Map[Int, String] =
      parentVersion.map(v => manifest(target, v)).getOrElse(Map.empty)

    // Multiple actions read the inputs (bucket collect, the bucket
    // write, and the recorded change feed's write) — cache ups so the
    // upstream decode pipeline runs once. dels stays uncached on the
    // first batch (the feed's insert path never touches it there).
    val ups = upserts.cache()
    val dels = if (prior.nonEmpty) deleteKeys.cache() else deleteKeys
    var cur: Option[DataFrame] = None
    try {
      // The touched-bucket set is ≤ nBuckets scalars — driver-side by
      // construction, not a data collect.
      val changedBuckets: Set[Int] =
        if (prior.isEmpty) Set.empty
        else ups.select(bucketOf.as("_b"))
          .unionByName(dels.select(bucketOf.as("_b")))
          .distinct().as[Int].collect().toSet
      if (prior.nonEmpty && changedBuckets.isEmpty) return

      // Only the changed buckets' files are read and merged — the
      // manifest IS the bucket-level file pruning.
      val changedKeys = ups.select(pks.map(col): _*)
        .unionByName(dels.select(pks.map(col): _*)).distinct()
      // the prior content of the touched buckets serves BOTH the merge
      // and the change-feed classification — read once, cached
      // (touched-bucket-sized; MEMORY_AND_DISK spills rather than OOMs
      // when a batch touches many buckets)
      cur = readPaths(target, changedBuckets.toSeq.sorted.flatMap(prior.get))
      cur.foreach(_.cache())
      val next = cur match {
        // allowMissingColumns: schema evolution — a column added (or
        // dropped) by later source DDL widens the table with nulls
        // instead of failing the merge
        case Some(c) => c.join(changedKeys, pks, "left_anti")
          .unionByName(ups, allowMissingColumns = true)
        case None => ups
      }

      val batch = f"b${System.currentTimeMillis()}%d-${System.nanoTime() % 1000000}%06d"
      val batchDir = new Path(new Path(dir(target), "data"), batch)
      // bucket layout first, then any configured layout (e.g. by
      // tenant/date) nested inside each bucket for path-level pruning.
      // Layout columns are written as `_p_<col>` COPIES so the data
      // files keep the originals — reads stay plain recursive scans
      // with no partition-column reconstruction (see readPaths).
      // repartition by bucket: without it each task writes a file per
      // bucket it happens to hold (tasks × buckets small files); with
      // it each bucket is one task's single file.
      val layout = partitioning.getOrElse(target, Seq.empty)
      val parts = "_b" +: layout.map("_p_" + _)
      layout.foldLeft(next.withColumn("_b", bucketOf)) {
          (df, c) => df.withColumn("_p_" + c, col(c))
        }
        .repartition(col("_b"))
        .write.mode("overwrite").partitionBy(parts: _*)
        .parquet(batchDir.toString)

      // buckets that ended up empty (all keys deleted) write no dir
      // and drop out of the manifest. `_b=N` dirs are referenced AS
      // WRITTEN — no post-write rename (object stores only have
      // copy+delete); readers are recursive-lookup scans, so the
      // `key=value` names can't trip partition discovery, and Spark's
      // underscore filter exempts names containing '='.
      val written = IndexFs.listNames(spark, batchDir.toString)
        .filter(_.startsWith("_b="))
        .map(_.stripPrefix("_b=").toInt)
      val nextManifest = (prior -- changedBuckets) ++
        written.map(b => b -> new Path(batchDir, s"_b=$b").toString)

      // millis + padded nanos: two batches inside the same millisecond
      // still get distinct, lexicographically ordered version names
      val version = f"v${System.currentTimeMillis()}%d-${System.nanoTime() % 1000000}%06d.manifest"

      // Zone maps: one touched-bucket-sized aggregation when the table
      // is stats-tracked, with untouched buckets' entries carried
      // forward from the parent sidecar exactly like manifest paths.
      // Computed by READING BACK the just-written batch parquet (with
      // partition discovery, so `_b` comes from the dir names) rather
      // than re-running the merge plan: the scan is column-pruned to
      // the tracked columns and reads exactly what was committed —
      // cheaper than the anti-join recompute, and immune to any
      // nondeterminism between two evaluations of `next`. Staged
      // pre-commit (orphans on crash are vacuum-swept, same as the
      // change feed); a column newly added to tracking simply has no
      // entries for old buckets, which readRange treats as "keep".
      val trackCols = statsColumns.getOrElse(target, Seq.empty)
        .filter(next.columns.contains)
      if (trackCols.nonEmpty) {
        val fresh =
          if (written.isEmpty) Map.empty[Int, Map[String, ColStats]]
          else BucketStats.compute(
            spark.read.parquet(batchDir.toString), "_b", trackCols,
            bloomItems)
        val parentStats = parentVersion
          .flatMap(readStatsFile(target, _)).getOrElse(Map.empty)
        val full = ((parentStats -- changedBuckets) ++ fresh)
          .view.filterKeys(nextManifest.keySet).toMap
        IndexFs.writeText(spark, statsPath(target, version).toString,
          BucketStats.serialize(full) + s"\n$End\n")
      }

      // Recorded change data feed (the Delta `_change_data` move): the
      // merge holds both images RIGHT NOW, so the delta-sized feed
      // costs one extra delta-sized write — serving it later costs
      // O(delta) instead of the snapshot diff's O(touched-bucket
      // rows). Written before the commit: a crash here leaves an
      // orphan dir no `_PARENT` chain ever reaches (vacuum sweeps it).
      writeChangeFeed(target, version, parentVersion, ups, dels, pks, cur)

      // persisted relative to the table dir so the store is relocatable
      val body = nextManifest.toSeq.sorted
        .map { case (b, p) => s"$b\t${relativeToTable(target, p)}" }
        .mkString("\n")
      IndexFs.writeText(spark,
        new Path(dir(target), version).toString, body)
      // THE commit: exclusive create of the next log slot. Losing the
      // race means a concurrent writer advanced the table under this
      // merge — unstage everything (nothing references it) and
      // surface the clean loss.
      try commitVersion(target,
        parentCommit.map(_._1).getOrElse(0L) + 1L, version)
      catch {
        case e: ConcurrentWriteException =>
          IndexFs.delete(spark, new Path(dir(target), version).toString)
          IndexFs.delete(spark, statsPath(target, version).toString)
          IndexFs.deleteRecursive(spark, changesDir(target, version).toString)
          IndexFs.deleteRecursive(spark, batchDir.toString)
          throw e
      }
    } finally {
      ups.unpersist()
      dels.unpersist()
      cur.foreach(_.unpersist())
    }
  }
}
