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
            case "prepareStatement" => statement(args(0).toString)
            case "commit" => log.add("commit"); null
            case "close" => log.add("close"); null
            case _ => defaultFor(m.getReturnType)
          }
        }).asInstanceOf[Connection]
  }
}
