package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_video — temporal dHash + Hamming banding over
  * really-decoded AVI frames. Pins (1) the decode round-trip (every
  * decoded frame's mean brightness == the synthesis formula through
  * the real RIFF walk + JDK BMP reader), (2) the banding recall
  * guarantee (threshold 3 < 4 bands ⇒ the banded join equals the
  * all-pairs scan exactly), (3) the planted invariances — the 2×
  * SPEED-UP copy (65 frames vs 129) and the +25 brightness-shifted
  * copy both land at hamming 0; the single-frame bump within 2 bits —
  * and (4) the corrupt-container guard. */
class VideoDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"
  private val S = Multimodal.VideoDupSynth

  private def videoIds: Seq[Long] =
    graft.table(spark, sfDir, "documents").select("doc_id").as[Long]
      .collect().filter(_ % 3 == 2).sorted.toSeq

  /** Closed-form reference fingerprint: sampled base frame is 2i for
    * every variant (v=1's variant frame i IS base frame 2i). */
  private def refHash(id: Long): Long = {
    def b(i: Int): Int = S.brightness(id, 2 * i)
    var h = 0L
    for (i <- 0 until 64) if (b(i + 1) > b(i)) h |= 1L << i
    h
  }

  test("the real AVI decode round-trips the synthesis brightness exactly, " +
      "frame counts included") {
    videoIds.take(8).foreach { id =>
      val br = S.decodeBrightness(S.avi(id), id)
      assert(br.length == S.nFrames(id),
        s"id=$id decoded ${br.length} frames, expected ${S.nFrames(id)}")
      val skip = if ((id / 3) % 4 == 1) 2 else 1
      br.zipWithIndex.foreach { case (got, fi) =>
        val expected = S.brightness(id, fi * skip)
        assert(got == expected,
          s"id=$id frame=$fi decoded=$got expected=$expected")
      }
    }
  }

  test("banded pairs == brute-force all-pairs at threshold 3; speed-up " +
      "and brightness-shift copies recalled at hamming 0") {
    val ids = videoIds
    val hashes = ids.map(id => id -> refHash(id)).toMap
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      d = java.lang.Long.bitCount(hashes(ids(i)) ^ hashes(ids(j)))
      if d <= 3
    } yield (ids(i), ids(j), d.toLong)).toSet

    val got = SparkEntry.queries("q_dedup_video")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute,
      s"banding diverged from all-pairs: extra=${got -- brute} " +
        s"missing=${brute -- got}")

    val groups = ids.groupBy(_ / 12).filter(_._2.size == 4)
    assert(groups.nonEmpty)
    groups.foreach { case (_, g) =>
      val v0 = g.find(id => (id / 3) % 4 == 0).get
      val v1 = g.find(id => (id / 3) % 4 == 1).get
      val v2 = g.find(id => (id / 3) % 4 == 2).get
      val v3 = g.find(id => (id / 3) % 4 == 3).get
      // the speed-up copy's CONTAINER halves (65 frames) yet the
      // time-fraction sampling reads the same envelope
      assert(S.nFrames(v1) == 65 && S.nFrames(v0) == 129)
      assert(got.contains((v0, v1, 0L)),
        s"speed-up dup ($v0, $v1) not recalled at hamming 0")
      assert(got.contains((v0, v2, 0L)),
        s"brightness-shifted dup ($v0, $v2) not recalled at hamming 0")
      val d03 = java.lang.Long.bitCount(hashes(v0) ^ hashes(v3))
      assert(d03 <= 2, s"single-frame bump moved $d03 bits")
      assert(got.contains((v0, v3, d03.toLong)))
    }
  }

  test("sample-then-decode equals decode-everything: fingerprintSampled " +
      "is bit-identical to fingerprint(decodeBrightness) on every doc") {
    videoIds.foreach { id =>
      val avi = S.avi(id)
      val full = S.fingerprint(S.decodeBrightness(avi, id))
      val sampled = S.fingerprintSampled(avi, id)
      assert(sampled == full, s"id=$id sampled=$sampled full=$full")
    }
  }

  test("survivors keep the full-rate master: a 65-frame speed-up copy " +
      "never outlives its 129-frame original") {
    val rows = SparkEntry.queries("q_dedup_video_survivors")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (canonical, keepId, nFrames, nDocs) =>
      assert(nDocs >= 2, s"cluster $canonical has $nDocs members")
      // every cluster contains at least one full-rate member (three of
      // each planted group of four), so the argmax must pick 129 frames
      assert(nFrames == 129L,
        s"cluster $canonical kept the reduced-rate copy $keepId")
      assert((keepId / 3) % 4 != 1, s"speed-up copy $keepId survived")
    }
  }

  test("the fingerprints come from genuinely different byte streams " +
      "(invariance is perceptual, not checksum)") {
    val g = videoIds.groupBy(_ / 12).filter(_._2.size == 4).head._2
    val v0 = g.find(id => (id / 3) % 4 == 0).get
    val v2 = g.find(id => (id / 3) % 4 == 2).get
    val (a0, a2) = (S.avi(v0), S.avi(v2))
    assert(a0.length == a2.length && !java.util.Arrays.equals(a0, a2))
    assert(S.fingerprint(S.decodeBrightness(a0, v0)) ==
      S.fingerprint(S.decodeBrightness(a2, v2)))
  }

  test("a corrupt container fails loudly with the media-tagged error, " +
      "not a hang or a wrong fingerprint") {
    val good = S.avi(videoIds.head)
    val truncated = java.util.Arrays.copyOf(good, good.length / 2)
    val e = intercept[Exception] {
      S.decodeBrightness(truncated, videoIds.head)
    }
    assert(e.getMessage.contains("corrupt") ||
      e.getMessage.contains("media"), e.getMessage)
  }
}
