package graft.cdc

import graft.TestSpark
import java.sql.{Connection, DriverManager, PreparedStatement}
import org.scalatest.funsuite.AnyFunSuite

/** Drives `JdbcUpsertSink`'s real foreachPartition write path two ways:
  *
  *  1. live, against embedded Derby (on the Spark classpath) with the
  *     portable delete+insert dialect — connections really open on
  *     executor threads, batches really execute, commits really land;
  *  2. against a recording fake Connection with the reference's
  *     Postgres dialect — asserts batching boundaries and the
  *     commit-per-partition protocol that no assertion on a real DB's
  *     final state can see.
  */
class JdbcSinkLiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftsink;create=true"

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def tableState(): Map[Int, (String, String)] = withConn { c =>
    val rs = c.createStatement()
      .executeQuery("SELECT id, first_name, email FROM customers")
    Iterator.continually(rs)
      .takeWhile(_.next()).map(r => r.getInt(1) -> (r.getString(2), r.getString(3)))
      .toMap
  }

  test("live Derby: upsert, idempotent replay, update and delete across partitions") {
    withConn(_.createStatement().execute(
      "CREATE TABLE customers (id INT PRIMARY KEY, first_name VARCHAR(64), email VARCHAR(64))"))
    val sink = new JdbcUpsertSink(DriverManagerFactory(url, "", ""),
      batchSize = 2, dialect = PortableUpsertDialect)
    val ups = Seq((1, "A", "a@x"), (2, "B", "b@x"), (3, "C", "c@x"),
      (4, "D", "d@x"), (5, "E", "e@x"))
      .toDF("id", "first_name", "email").repartition(2)
    val noDels = Seq.empty[Int].toDF("id")

    sink.applyChanges("customers", Seq("id"), ups, noDels)
    val first = tableState()
    assert(first.keySet == Set(1, 2, 3, 4, 5) && first(1) == ("A", "a@x"))

    // at-least-once replay of the same batch is a no-op
    sink.applyChanges("customers", Seq("id"), ups, noDels)
    assert(tableState() == first)

    // next batch: update key 1, delete key 2
    sink.applyChanges("customers", Seq("id"),
      Seq((1, "A2", "a2@x")).toDF("id", "first_name", "email"),
      Seq(2).toDF("id"))
    val after = tableState()
    assert(after(1) == ("A2", "a2@x") && !after.contains(2) && after.size == 4)
  }

  test("live Derby: batch-id ledger makes a replay wire-invisible") {
    withConn(_.createStatement().execute(
      "CREATE TABLE accounts (id INT PRIMARY KEY, val VARCHAR(64))"))
    val sink = new JdbcUpsertSink(DriverManagerFactory(url, "", ""),
      batchSize = 2, dialect = PortableUpsertDialect)
    def state(): Map[Int, String] = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT id, val FROM accounts")
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => r.getInt(1) -> r.getString(2)).toMap
    }
    val ups = Seq((1, "v1"), (2, "v2"), (3, "v3")).toDF("id", "val")
      .repartition(2)
    val noDels = Seq.empty[Int].toDF("id")

    sink.applyChangesIdempotent("accounts", Seq("id"), ups, noDels, batchId = 7L)
    assert(state() == Map(1 -> "v1", 2 -> "v2", 3 -> "v3"))

    // out-of-band sentinel: a plain idempotent replay would converge to
    // the same values and hide the rewrite; the sentinel only survives
    // if the replay truly sends ZERO statements
    withConn(_.createStatement()
      .executeUpdate("UPDATE accounts SET val = 'sentinel' WHERE id = 1"))
    sink.applyChangesIdempotent("accounts", Seq("id"), ups, noDels, batchId = 7L)
    assert(state()(1) == "sentinel", "replay re-wrote a ledgered partition")

    // a NEW batch id is not ledgered and writes normally
    sink.applyChangesIdempotent("accounts", Seq("id"),
      Seq((1, "v9")).toDF("id", "val"), noDels, batchId = 8L)
    assert(state()(1) == "v9")

    val ledgered = withConn { c =>
      val rs = c.createStatement().executeQuery(
        s"SELECT COUNT(*) FROM ${JdbcUpsertSink.LedgerTable} WHERE target = 'accounts'")
      rs.next(); rs.getInt(1)
    }
    assert(ledgered >= 3) // 2 upsert partitions from batch 7 + batch 8's
  }

  test("recording fake: ledgered replay sends zero data statements") {
    RecordingJdbc.log.clear(); RecordingJdbc.ledgerApplied = false
    val sink = new JdbcUpsertSink(RecordingJdbc.Factory(), batchSize = 2)
    val ups = Seq((1, "A"), (2, "B"), (3, "C"))
      .toDF("id", "first_name").coalesce(1)
    val noDels = Seq.empty[Int].toDF("id")
    import scala.jdk.CollectionConverters._

    sink.applyChangesIdempotent("customers", Seq("id"), ups, noDels, 3L)
    val first = RecordingJdbc.log.asScala.toSeq
    assert(first.exists(_.startsWith("exec(")), "first delivery must write")
    assert(first.exists(_.startsWith(
      s"update: INSERT INTO ${JdbcUpsertSink.LedgerTable}")),
      "ledger row must be inserted with the data")
    // 2 commits: ensureLedger's DDL transaction + the single data
    // partition's (ledger row + rows, atomically)
    assert(first.count(_ == "commit") == 2, "ledger + data in ONE transaction")

    RecordingJdbc.log.clear(); RecordingJdbc.ledgerApplied = true
    sink.applyChangesIdempotent("customers", Seq("id"), ups, noDels, 3L)
    val replay = RecordingJdbc.log.asScala.toSeq
    assert(replay.exists(_.startsWith("query(")), "replay consults the ledger")
    assert(!replay.exists(_.startsWith("exec(")), "replay must not write data")
    assert(!replay.exists(_.startsWith("update:")), "replay must not re-ledger")
    // only ensureLedger's DDL transaction commits — zero data commits
    assert(replay.count(_ == "commit") == 1, "replay must not commit data")
  }

  test("recording fake: batch boundaries at batchSize and one commit per partition") {
    RecordingJdbc.log.clear()
    val sink = new JdbcUpsertSink(RecordingJdbc.Factory(), batchSize = 2)
    val ups = Seq((1, "A"), (2, "B"), (3, "C"), (4, "D"), (5, "E"))
      .toDF("id", "first_name").coalesce(1)
    sink.applyChanges("customers", Seq("id"), ups, Seq.empty[Int].toDF("id"))

    import scala.jdk.CollectionConverters._
    val events = RecordingJdbc.log.asScala.toSeq
    val upsertEvents = events.filter(_.contains("ON CONFLICT"))
    // 5 rows at batchSize 2 → executed batches of 2, 2, 1, all on the
    // reference's ON CONFLICT statement
    val sql = "INSERT INTO customers (id, first_name) VALUES (?, ?) " +
      "ON CONFLICT (id) DO UPDATE SET first_name = EXCLUDED.first_name"
    assert(upsertEvents == Seq(s"exec(2): $sql", s"exec(2): $sql", s"exec(1): $sql"))
    // exactly one commit for the single upsert partition; the empty
    // delete DF has no partitions, so no connection ever opens for it
    assert(events.count(_ == "commit") == 1)
    // autocommit off before any statement, connection closed after commit
    assert(events.indexOf("autocommit(false)") < events.indexWhere(_.startsWith("exec")))
    assert(events.lastIndexOf("close") > events.lastIndexOf("commit"))
  }
}

/** Minimal reflective fakes: a Connection/PreparedStatement pair that
  * records the wire protocol into a shared, thread-safe log. */
object RecordingJdbc {
  import java.lang.reflect.{InvocationHandler, Method, Proxy}
  import scala.jdk.CollectionConverters._

  val log: java.util.List[String] =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())

  /** What the fake ledger answers to `batchApplied` probes. */
  @volatile var ledgerApplied = false

  private def resultSet(firstNext: Boolean): java.sql.ResultSet = {
    var consumed = false
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.ResultSet]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "next" =>
            val r = !consumed && firstNext; consumed = true
            java.lang.Boolean.valueOf(r)
          case _ => defaultFor(m.getReturnType)
        }
      }).asInstanceOf[java.sql.ResultSet]
  }

  private def plainStatement(): java.sql.Statement =
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Statement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "execute" => log.add(s"ddl: ${args(0)}"); java.lang.Boolean.FALSE
          case "executeQuery" => resultSet(firstNext = true)
          case _ => defaultFor(m.getReturnType)
        }
      }).asInstanceOf[java.sql.Statement]

  private def defaultFor(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case java.lang.Void.TYPE => null
    case _ => null
  }

  private def statement(sql: String): PreparedStatement = {
    var pending = 0
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[PreparedStatement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "addBatch" => pending += 1; null
          case "executeBatch" =>
            if (pending > 0) log.add(s"exec($pending): $sql")
            val r = Array.fill(pending)(1); pending = 0; r
          case "executeQuery" =>
            log.add(s"query($sql)"); resultSet(ledgerApplied)
          case "executeUpdate" =>
            log.add(s"update: $sql"); Integer.valueOf(1)
          case "close" => null
          case other => defaultFor(m.getReturnType)
        }
      }).asInstanceOf[PreparedStatement]
  }

  case class Factory() extends ConnectionFactory {
    def connect(): Connection =
      Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
        new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
            case "setAutoCommit" => log.add(s"autocommit(${args(0)})"); null
            case "createStatement" => plainStatement()
            case "prepareStatement" => statement(args(0).toString)
            case "commit" => log.add("commit"); null
            case "close" => log.add("close"); null
            case _ => defaultFor(m.getReturnType)
          }
        }).asInstanceOf[Connection]
  }
}
