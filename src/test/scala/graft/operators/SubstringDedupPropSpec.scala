package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property-based hardening of the substring-dedup core: corpora drawn
  * from a 2–3 word vocabulary make nearly EVERY sliding gram collide
  * (constant runs, self-overlapping repeats, whole-corpus duplicates,
  * docs straddling the K boundary) — the distributed report must equal
  * the sequential gram-index fold on all of them. Spark jobs per case
  * are expensive, so cases are few and rows small; the adversarial
  * shapes come from the generator, not the count.
  */
object SubstringDedupProps extends Properties("substring_dedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark
  private val K = SubstringDedup.K

  private val corpusGen: Gen[List[String]] = for {
    nDocs <- Gen.choose(1, 12)
    vocab <- Gen.oneOf(Seq("a"), Seq("a", "b"), Seq("a", "b", "c"))
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(0, 24) // straddles the K=8 gram boundary
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs

  private def brute(docs: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split(" ").toSeq }
    val occ = scala.collection.mutable.Map.empty[Seq[String], List[(Long, Int)]]
    for ((id, w) <- toks; i <- 0 to w.length - K)
      occ(w.slice(i, i + K)) = (id, i) :: occ.getOrElse(w.slice(i, i + K), Nil)
    val dup = occ.values.filter(_.size >= 2).flatMap { os =>
      os.filter(_ != os.minBy(identity))
    }.toSeq.groupBy(_._1)
    toks.map { case (id, w) =>
      val iv = dup.getOrElse(id, Nil).map(o => (o._2, o._2 + K - 1)).sortBy(_._1)
      val merged = iv.foldLeft(List.empty[(Int, Int)]) {
        case (Nil, x) => List(x)
        case ((s, e) :: rest, (s2, e2)) =>
          if (s2 <= e) (s, math.max(e, e2)) :: rest else (s2, e2) :: (s, e) :: rest
      }
      val dupToks = merged.map { case (s, e) => e - s + 1 }.sum.toLong
      (id, w.length.toLong, merged.size.toLong, dupToks,
        BigDecimal(dupToks.toDouble / w.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
  }

  property("report == sequential gram-index fold on collision-heavy corpora") =
    Prop.forAll(corpusGen) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = SubstringDedup.report(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      val expect = brute(docs)
      (got == expect) :| s"got=${got.toSeq.sortBy(_._1).take(4)} expect=${
        expect.toSeq.sortBy(_._1).take(4)}"
    }
}
