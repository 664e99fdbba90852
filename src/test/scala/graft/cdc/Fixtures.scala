package graft.cdc

/** Debezium envelope fixtures per /root/repo/FIXTURES.md (wire format of
  * the reference: schemas disabled → envelope at JSON root; engine must
  * also accept a payload wrapper). */
object Fixtures {

  def customer(op: String, id: Int, first: String, last: String,
      email: String, before: Option[(Int, String, String, String)] = None,
      tsMs: Long = 1769558400001L): String = {
    val after =
      if (op == "d") "null"
      else s"""{"id": $id, "first_name": "$first", "last_name": "$last",
               |"email": "$email", "created_at": "2026-01-28T00:00:00Z"}""".stripMargin.replaceAll("\n", " ")
    val beforeJson = before match {
      case Some((bid, bf, bl, be)) =>
        s"""{"id": $bid, "first_name": "$bf", "last_name": "$bl",
           |"email": "$be", "created_at": "2026-01-28T00:00:00Z"}""".stripMargin.replaceAll("\n", " ")
      case None => if (op == "u" || op == "d") s"""{"id": $id, "first_name": "old", "last_name": "old", "email": "old@x", "created_at": "2026-01-28T00:00:00Z"}""" else "null"
    }
    s"""{"before": $beforeJson, "after": $after,
       |"source": {"db": "app", "table": "customers", "ts_ms": ${tsMs - 1}},
       |"op": "$op", "ts_ms": $tsMs}""".stripMargin.replaceAll("\n", " ")
  }

  /** Same envelope nested under payload (schemas-enabled wire format). */
  def wrapped(envelope: String): String = s"""{"payload": $envelope}"""

  /** A raw record row as (topic, key, value, partition, offset). */
  def raw(value: String, offset: Long, topic: String = "mysql.app.customers",
      key: String = """{"id": 1}""", partition: Int = 0):
      (String, String, String, Int, Long) =
    (topic, key, value, partition, offset)

  /** The golden scenario of FIXTURES.md §1: r(1), r(2), c(3), u(3),
    * d(2), tombstone(2), c(3 replay) → final state {1, 3-updated}. */
  def goldenSequence: Seq[(String, String, String, Int, Long)] = Seq(
    raw(customer("r", 1, "Sally", "Thomas", "sally.thomas@acme.com"), 0),
    raw(customer("r", 2, "George", "Bailey", "gbailey@foobar.com"), 1),
    raw(customer("c", 3, "Edward", "Walker", "ed@walker.com"), 2),
    raw(customer("u", 3, "Edward", "Walker", "ed.walker@walker.com"), 3),
    raw(customer("d", 2, "George", "Bailey", "gbailey@foobar.com",
      before = Some((2, "George", "Bailey", "gbailey@foobar.com"))), 4),
    (		"mysql.app.customers", """{"id": 2}""", null, 0, 5L), // tombstone
    raw(customer("c", 3, "Edward", "Walker", "ed.walker@walker.com"), 6))
}
