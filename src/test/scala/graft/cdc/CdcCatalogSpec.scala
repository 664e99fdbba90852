package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

class CdcCatalogSpec extends AnyFunSuite {

  val cat: CdcCatalog = CdcCatalog.fromPropertiesString(
    """pk.customers=id
      |pk.orders=id
      |pk.app.special=tenant_id, seq
      |pk.special=wrong
      |map.customers=customers
      |map.app.orders=orders_mirror
      |map.orders=orders
      |other.key=ignored
      |""".stripMargin)

  test("pk: table-level lookup") {
    assert(cat.pkFor("app", "customers") == Seq("id"))
  }

  test("pk: db.table overrides table") {
    assert(cat.pkFor("app", "special") == Seq("tenant_id", "seq"))
    assert(cat.pkFor("otherdb", "special") == Seq("wrong"))
  }

  test("pk: default is id") {
    assert(cat.pkFor("app", "unknown_table") == Seq("id"))
  }

  test("pk: multi-column comma split trims whitespace") {
    assert(cat.pkFor("app", "special") == Seq("tenant_id", "seq"))
  }

  test("map: db.table overrides table; default lowercases source") {
    assert(cat.targetFor("app", "orders") == "orders_mirror")
    assert(cat.targetFor("otherdb", "orders") == "orders")
    assert(cat.targetFor("app", "UnMapped") == "unmapped")
  }

  test("case-insensitive lookups") {
    assert(cat.pkFor("APP", "Special") == Seq("tenant_id", "seq"))
  }

  test("non-pk/map keys ignored") {
    assert(!cat.pk.contains("other.key") && !cat.rename.contains("other.key"))
  }

  test("topics.regex parsed; sensible default otherwise") {
    val withRegex = CdcCatalog.fromPropertiesString(
      """topics.regex=^[^.]+\.[^.]+\.(customers|orders)$""" + "\n")
    // java.util.Properties consumes the backslash escapes — the same
    // thing happens in the reference consumer, and the resulting
    // pattern still matches the topics (an unescaped dot matches '.').
    assert(withRegex.subscribePattern == """^[^.]+.[^.]+.(customers|orders)$""")
    assert("mysql.app.customers".matches(withRegex.subscribePattern))
    assert(cat.subscribePattern.nonEmpty) // default for configs without it
  }
}

class UpsertSqlSpec extends AnyFunSuite {

  test("upsert SQL: EXCLUDED set-clause for non-PK columns, lowercase") {
    val sql = JdbcUpsertSink.upsertSql("Customers",
      Seq("ID", "first_name", "email"), Seq("id"))
    assert(sql == "INSERT INTO customers (id, first_name, email) VALUES (?, ?, ?) " +
      "ON CONFLICT (id) DO UPDATE SET first_name = EXCLUDED.first_name, " +
      "email = EXCLUDED.email")
  }

  test("upsert SQL: all-PK degenerate case self-assigns") {
    val sql = JdbcUpsertSink.upsertSql("m", Seq("a", "b"), Seq("a", "b"))
    assert(sql.endsWith("DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b"))
  }

  test("delete SQL: conjunction over PKs") {
    assert(JdbcUpsertSink.deleteSql("T", Seq("a", "B")) ==
      "DELETE FROM t WHERE a = ? AND b = ?")
  }

  test("identifiers from untrusted envelope keys are validated, not interpolated") {
    // with inferUnknown=true, column names come from CDC JSON keys — a
    // crafted key must throw, never reach the sink DB as SQL
    intercept[IllegalArgumentException] {
      JdbcUpsertSink.upsertSql("t", Seq("id", "x; DROP TABLE t; --"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      JdbcUpsertSink.upsertSql("t\" (x) VALUES (1); --", Seq("id"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      JdbcUpsertSink.deleteSql("t", Seq("id = 1 OR 1=1; --"))
    }
  }
}
