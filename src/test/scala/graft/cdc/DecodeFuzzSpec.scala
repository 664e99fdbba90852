package graft.cdc

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz the decoder: arbitrary mutations of envelope text must never
  * fail the batch — every non-tombstone input ends up either decoded or
  * in rejects, nothing is lost and nothing throws (E1). */
class DecodeFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mutated envelopes: decode + rejects partition the input exactly") {
    val rnd = new scala.util.Random(7)
    val base = Fixtures.customer("c", 1, "A", "B", "a@b")
    val mutants: Seq[String] = (0 until 300).map { i =>
      rnd.nextInt(6) match {
        case 0 => base.take(rnd.nextInt(base.length)) // truncation
        case 1 => // byte flip
          val pos = rnd.nextInt(base.length)
          base.updated(pos, (rnd.nextInt(94) + 33).toChar)
        case 2 => rnd.nextString(rnd.nextInt(40)) // garbage
        case 3 => base.replace("\"c\"", s""""${rnd.nextPrintableChar()}"""") // op fuzz
        case 4 => "{}" // empty object
        case _ => base // valid
      }
    }.filter(_.trim.nonEmpty)
    val raw = mutants.zipWithIndex.map { case (v, i) =>
      ("mysql.app.customers", "{}", v, 0, i.toLong)
    }.toDF("topic", "key", "value", "partition", "offset")

    val decoded = Decode.decode(raw, Envelope.customersRow).count()
    val rejected = Decode.rejects(raw, Envelope.customersRow).count()
    assert(decoded + rejected == mutants.size,
      s"decoded=$decoded rejected=$rejected of ${mutants.size}")
    assert(decoded > 0 && rejected > 0) // both paths actually exercised
  }

  test("fuzzed batch through full materialization never fails the stream") {
    val rnd = new scala.util.Random(11)
    val base = Fixtures.customer("c", 2, "X", "Y", "x@y")
    val rows = (0 until 100).map { i =>
      val v = if (rnd.nextBoolean()) base
        else base.take(rnd.nextInt(base.length))
      ("mysql.app.customers", "{}", v, 0, i.toLong)
    }.toDF("topic", "key", "value", "partition", "offset")
    val sink = new InMemorySink
    Materializer.applyBatch(rows,
      CdcCatalog.fromPropertiesString("pk.customers=id\n"),
      Envelope.defaultRegistry, sink)
    assert(sink.state("customers").contains(Seq(2)))
  }
}
