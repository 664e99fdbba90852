package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property-based hardening of OrderedPrefix: for ARBITRARY order keys
  * — heavy duplicate mass, negatives, constant runs, tiny domains that
  * collapse most width_bucket classes — the two-phase rank and running
  * sum must equal the sequential fold exactly. Spark jobs per case are
  * expensive, so cases are few and rows small; the adversarial shapes
  * come from the generator, not the count.
  */
object OrderedPrefixProps extends Properties("ordered_prefix") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark

  // orders drawn from a TINY value set → massive ties + bucket collapse
  private val rowsGen: Gen[List[(Double, Long)]] = for {
    n <- Gen.choose(1, 120)
    domain <- Gen.oneOf(Seq(-1.5, 0.0, 2.25), Seq(7.0),
      Seq(-3.0, -2.9, 4.0, 4.1, 1e6))
    xs <- Gen.listOfN(n, Gen.zip(Gen.oneOf(domain), Gen.choose(1L, 50L)))
  } yield xs

  private def asDf(xs: List[(Double, Long)]) = {
    import spark.implicits._
    xs.zipWithIndex.map { case ((ord, v), i) => (i.toLong, ord, v) }
      .toDF("id", "ord", "v")
  }

  property("rankSum == sequential fold on tied/collapsed orders") =
    Prop.forAll(rowsGen) { xs =>
      import spark.implicits._
      val got = OrderedPrefix.rankSum(asDf(xs), Nil, col("ord"), col("id"),
          col("v").cast("decimal(38,10)"), "rk", "cum")
        .select(col("id"), col("rk"), col("cum").cast("long"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      var acc = 0L
      val expect = xs.zipWithIndex
        .map { case ((ord, v), i) => (i.toLong, ord, v) }
        .sortBy { case (id, ord, _) => (ord, id) }
        .zipWithIndex.map { case ((id, _, v), i) =>
          acc += v; id -> ((i + 1).toLong, acc)
        }.toMap
      got == expect
    }

  property("exclusive runningMax == sequential fold on the same shapes") =
    Prop.forAll(rowsGen) { xs =>
      import spark.implicits._
      val got = OrderedPrefix.runningMax(asDf(xs), Nil, col("ord"), col("id"),
          col("v"), "m", inclusive = false)
        .select(col("id"), col("m"))
        .as[(Long, Option[Long])].collect().toMap
      var mx = Option.empty[Long]
      val expect = xs.zipWithIndex
        .map { case ((ord, v), i) => (i.toLong, ord, v) }
        .sortBy { case (id, ord, _) => (ord, id) }
        .map { case (id, _, v) =>
          val r = id -> mx; mx = Some(mx.fold(v)(math.max(_, v))); r
        }.toMap
      got == expect
    }

  // STRING tiebreakers drive CompositeLowerBound's type-generic compare
  // (ctx.genComp / getInterpretedOrdering on UTF8String) — the path the
  // long-tie properties above never touch. Same contract: rank equals
  // the sequential fold sorted by (ord, tieString).
  property("rank with STRING ties == sequential fold (genComp path)") =
    Prop.forAll(rowsGen) { xs =>
      import spark.implicits._
      val df = xs.zipWithIndex
        .map { case ((ord, v), i) =>
          (i.toLong, s"t${(v * 7919 + i) % 97}%02d-$i", ord) }
        .toDF("id", "tie", "ord")
      val got = OrderedPrefix.rank(df, Nil, col("ord"), col("tie"), "rk")
        .select(col("id"), col("rk"))
        .as[(Long, Long)].collect().toMap
      val expect = xs.zipWithIndex
        .map { case ((ord, v), i) =>
          (i.toLong, s"t${(v * 7919 + i) % 97}%02d-$i", ord) }
        .sortBy { case (_, tie, ord) => (ord, tie) }
        .zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1).toLong }
        .toMap
      got == expect
    }
}
