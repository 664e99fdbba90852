package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_images — dHash + Hamming banding over really-decoded BMPs.
  * Pins (1) the decode round-trip (decoded pixels == the synthesis
  * formula, catching orientation/padding/channel bugs), (2) the
  * banding recall guarantee (threshold 3 < 4 bands ⇒ the banded join
  * equals the all-pairs scan exactly), (3) the planted near-dups
  * (every group's brightness-shifted v3 at hamming 0; each v1 bump
  * within 2 bits of its base), and (4) the malformed-input guard. */
class ImageDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  private def imageIds: Seq[Long] =
    graft.table(spark, sfDir, "documents").select("doc_id").as[Long]
      .collect().filter(_ % 3 == 0).sorted.toSeq

  private def refHash(id: Long): Long = {
    var h = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (Multimodal.ImageDupSynth.gray(id, r, c + 1) >
          Multimodal.ImageDupSynth.gray(id, r, c))
        h |= 1L << (r * 8 + c)
    h
  }

  test("the real BMP decode round-trips the synthesis pixels exactly") {
    imageIds.take(8).foreach { id =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.ImageDupSynth.bmp(id)))
      assert(img != null && img.getWidth == 9 && img.getHeight == 8)
      for (r <- 0 until 8; c <- 0 until 9) {
        val p = img.getRGB(c, r)
        val expected = Multimodal.ImageDupSynth.gray(id, r, c)
        assert((p & 0xff) == expected &&
          ((p >> 8) & 0xff) == expected && ((p >> 16) & 0xff) == expected,
          s"id=$id r=$r c=$c decoded=${p & 0xff} expected=$expected")
      }
    }
  }

  test("banded pairs == brute-force all-pairs at threshold 3 (the " +
      "pigeonhole recall guarantee), planted dups recalled") {
    val ids = imageIds
    val hashes = ids.map(id => id -> refHash(id)).toMap
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      d = java.lang.Long.bitCount(hashes(ids(i)) ^ hashes(ids(j)))
      if d <= 3
    } yield (ids(i), ids(j), d.toLong)).toSet

    val got = SparkEntry.queries("q_dedup_images")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute,
      s"banding diverged from all-pairs: extra=${got -- brute} " +
        s"missing=${brute -- got}")

    // planted recall: every complete group's (v0, v3) pair at hamming 0
    val groups = ids.groupBy(_ / 12).filter(_._2.size == 4)
    assert(groups.nonEmpty)
    groups.foreach { case (_, g) =>
      val v0 = g.find(id => (id / 3) % 4 == 0).get
      val v3 = g.find(id => (id / 3) % 4 == 3).get
      assert(got.contains((v0, v3, 0L)),
        s"brightness-shifted dup ($v0, $v3) not recalled at hamming 0")
      val v1 = g.find(id => (id / 3) % 4 == 1).get
      val d01 = java.lang.Long.bitCount(hashes(v0) ^ hashes(v1))
      assert(d01 <= 2, s"single-pixel bump moved $d01 bits")
      assert(got.contains((v0, v1, d01.toLong)))
    }
  }

  test("dhash64 guards malformed input with null, not a job failure") {
    graft.functions.ImageHashExpressions.register(spark)
    val out = Seq(
      (1L, Seq.fill(72)(7)), // well-formed (constant: hash 0)
      (2L, Seq.fill(71)(7)), // wrong length
      (3L, Seq.empty[Int])
    ).toDF("id", "px")
      .selectExpr("id", "dhash64(px) AS h")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(0L) && out(2L).isEmpty && out(3L).isEmpty, out)
  }
}
