package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based hardening of the opt-in widening policy: for an
  * ARBITRARY interleaving of clean-drift (stable or flipping type),
  * dirty, and no-drift batches, the registry must widen exactly when a
  * straightforward reference fold of the contract says it should —
  * after `confirmBatches` CONSECUTIVE clean sightings of a STABLE
  * inferred type, with dirty batches, gaps, and type flips resetting —
  * and must adopt exactly the confirmed type. The scenario spec
  * (SchemaEvolutionSpec) pins each rule once; this drives the rules'
  * INTERACTIONS, which is where a counter-reset bug would hide.
  */
object SchemaEvolutionProps extends Properties("schema_evolution") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  sealed trait Ev
  case object DriftLong extends Ev
  case object DriftStr extends Ev
  case object Dirty extends Ev
  case object NoDrift extends Ev

  private val evsGen: Gen[List[Ev]] = for {
    n <- Gen.choose(2, 6)
    evs <- Gen.listOfN(n, Gen.oneOf(DriftLong, DriftStr, Dirty, NoDrift))
  } yield evs

  /** Reference fold of the documented contract. */
  private def model(evs: List[Ev], confirm: Int): Option[DataType] = {
    var cur: Option[DataType] = None
    var cnt = 0
    evs.foreach { e =>
      val t = e match {
        case DriftLong => Some(LongType)
        case DriftStr => Some(StringType)
        case _ => None
      }
      t match {
        case Some(dt) if cur.contains(dt) => cnt += 1
        case Some(dt) => cur = Some(dt); cnt = 1
        case None => cur = None; cnt = 0
      }
      if (cnt >= confirm && cur.isDefined) return cur
    }
    None
  }

  private def toDf(rows: Seq[(String, String, String, Int, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("topic", "key", "value", "partition", "offset")
  }

  private def envelope(id: Int, tier: Option[String]): String = {
    val extra = tier.map(t => s""", "loyalty_tier": $t""").getOrElse("")
    s"""{"before": null, "after": {"id": $id, "first_name": "N",
       |"last_name": "C", "email": "e$id@x",
       |"created_at": "2026-01-28T00:00:00Z"$extra},
       |"source": {"db": "app", "table": "customers", "ts_ms": 1769558400000},
       |"op": "c", "ts_ms": 1769558400001}""".stripMargin.replaceAll("\n", " ")
  }

  private def batch(ev: Ev, i: Int): DataFrame = ev match {
    case DriftLong => toDf(Seq(Fixtures.raw(envelope(i, Some((i * 10L).toString)), i.toLong)))
    case DriftStr => toDf(Seq(Fixtures.raw(envelope(i, Some("\"gold\"")), i.toLong)))
    case Dirty => toDf(Seq(
      Fixtures.raw(envelope(i, Some((i * 10L).toString)), i.toLong),
      Fixtures.raw("{not json", i.toLong + 1)))
    case NoDrift => toDf(Seq(Fixtures.raw(envelope(i, None), i.toLong)))
  }

  property("widening == reference fold over arbitrary batch sequences") =
    Prop.forAll(evsGen) { evs =>
      val confirm = 2
      val ev = new SchemaEvolution(Envelope.defaultRegistry, confirm)
      evs.zipWithIndex.foreach { case (e, i) =>
        ev.observe(spark, "customers", batch(e, i + 1))
      }
      val got = ev.schemaFor("customers").get.fields
        .find(_.name == "loyalty_tier").map(_.dataType)
      val expect = model(evs, confirm)
      if (got != expect)
        println(s"seq=$evs got=$got expect=$expect")
      got == expect
    }
}
