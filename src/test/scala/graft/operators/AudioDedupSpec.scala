package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_audio — energy-envelope dHash + Hamming banding over
  * really-decoded WAVs, the audio dual of ImageDedupSpec. Pins
  * (1) the decode round-trip (decoded frame energies == the synthesis
  * formula, catching byte-order/signedness/frame-boundary bugs),
  * (2) the banding recall guarantee (threshold 3 < 4 bands ⇒ banded
  * join == all-pairs exactly), (3) the planted near-dups (every
  * group's ×1.5-volume v3 at hamming 0 — the perceptual invariance;
  * each v1 single-frame bump within 2 bits of its base), and (4) the
  * malformed-input guard. */
class AudioDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"
  private val S = Multimodal.AudioDupSynth

  private def audioIds: Seq[Long] =
    graft.table(spark, sfDir, "documents").select("doc_id").as[Long]
      .collect().filter(_ % 3 == 1).sorted.toSeq

  private def refFp(id: Long): Long = {
    var h = 0L
    for (i <- 0 until 64)
      if (S.energy(id, i + 1) > S.energy(id, i)) h |= 1L << i
    h
  }

  test("the real WAV decode round-trips the synthesis energies exactly") {
    audioIds.take(8).foreach { id =>
      val en = S.decodeEnergies(S.wav(id), id)
      assert(en.length == S.Frames)
      (0 until S.Frames).foreach { f =>
        assert(en(f) == S.energy(id, f),
          s"id=$id frame=$f decoded=${en(f)} expected=${S.energy(id, f)}")
      }
      assert(S.fingerprint(en) == refFp(id))
    }
  }

  test("banded pairs == brute-force all-pairs at threshold 3, planted " +
      "dups recalled") {
    val ids = audioIds
    val fps = ids.map(id => id -> refFp(id)).toMap
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      d = java.lang.Long.bitCount(fps(ids(i)) ^ fps(ids(j)))
      if d <= 3
    } yield (ids(i), ids(j), d.toLong)).toSet

    val got = SparkEntry.queries("q_dedup_audio")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute,
      s"banding diverged from all-pairs: extra=${got -- brute} " +
        s"missing=${brute -- got}")

    // planted recall: the louder copy is a fingerprint-exact dup, the
    // one-frame bump stays within threshold, the five-frame bump's
    // distance is visibly larger than the one-frame bump's
    val groups = ids.groupBy(_ / 12).filter(_._2.size == 4)
    assert(groups.nonEmpty)
    groups.foreach { case (_, g) =>
      def of(v: Long) = g.find(id => (id / 3) % 4 == v).get
      val (v0, v1, v2, v3) = (of(0), of(1), of(2), of(3))
      assert(got.contains((v0, v3, 0L)),
        s"volume-scaled dup ($v0, $v3) not recalled at hamming 0")
      val d01 = java.lang.Long.bitCount(fps(v0) ^ fps(v1))
      assert(d01 <= 2, s"single-frame bump moved $d01 bits")
      val d02 = java.lang.Long.bitCount(fps(v0) ^ fps(v2))
      assert(d02 >= d01, s"five-frame bump ($d02) below one-frame ($d01)")
    }
  }

  test("volume scaling changes every PCM byte but zero fingerprint bits") {
    val g = audioIds.groupBy(_ / 12).filter(_._2.size == 4).head._2
    val v0 = g.find(id => (id / 3) % 4 == 0).get
    val v3 = g.find(id => (id / 3) % 4 == 3).get
    val (w0, w3) = (S.wav(v0), S.wav(v3))
    val differing = w0.length min w3.length
    assert((44 until differing).count(i => w0(i) != w3(i)) > differing / 2,
      "scaled copy should differ in most PCM bytes")
    assert(refFp(v0) == refFp(v3))
  }

  test("malformed WAV bytes fail loudly with the media id, never a " +
      "silent wrong fingerprint") {
    val garbage = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    intercept[Exception](S.decodeEnergies(garbage, 42L))
    // truncated PCM payload: real header, wrong length
    val whole = S.wav(audioIds.head)
    val truncated = whole.take(whole.length - 64)
    val e2 = intercept[Exception](
      S.decodeEnergies(truncated, audioIds.head))
    assert(e2.isInstanceOf[IllegalArgumentException] ||
      e2.isInstanceOf[javax.sound.sampled.UnsupportedAudioFileException] ||
      e2.isInstanceOf[java.io.IOException], e2.toString)
  }
}
