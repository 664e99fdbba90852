package graft.operators

import graft.TestSpark
import graft.operators.Multimodal.{MediaRecord, Mp4Decoder, Mp4Synth}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the ISO-BMFF box walk: exact metadata against the synthesis
  * closed form (the q_media_mp4 oracle arithmetic), recursion into
  * moov/trak/mdia only, and the corrupt-container guards — every
  * mutation fails with the media-tagged error, never a wild or
  * non-terminating walk.
  */
class Mp4DecoderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("meta matches the synthesis closed form across parameter space") {
    (0L until 220L).foreach { id =>
      val (ts, duration, nTracks, mdatLen) = Mp4Synth.params(id)
      val me = Mp4Decoder.meta(MediaRecord(id, "video", Mp4Synth.mp4(id)))
      assert(me.timescale == ts, s"id=$id")
      assert(me.duration == duration)
      assert(me.duration_ms == duration * 1000L / ts)
      assert(me.n_tracks == nTracks)
      assert(me.video_tracks == 1)
      assert(me.audio_tracks == nTracks - 1)
      assert(me.mdat_bytes == mdatLen.toLong)
    }
  }

  test("corrupt containers fail with the media-tagged error") {
    val good = Mp4Synth.mp4(8L)
    def expectFail(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Mp4Decoder.meta(MediaRecord(8L, "video", mutate(good.clone())))
      }
      assert(e.getMessage.contains("media 8"), s"$what: ${e.getMessage}")
    }
    // truncated mid-box
    expectFail(b => java.util.Arrays.copyOfRange(b, 0, b.length - 4), "truncate")
    // declared box size of 0 (to-EOF form unsupported → clean error)
    expectFail({ b => b(0) = 0; b(1) = 0; b(2) = 0; b(3) = 0; b }, "size 0")
    // declared size overrunning the buffer
    expectFail({ b => b(0) = 0x7f; b }, "overrun")
    // no moov: rewrite the moov type so it is skipped as unknown
    expectFail({ b =>
      val i = indexOfType(b, "moov"); b(i) = 'x'.toByte; b
    }, "missing moov")
    // headerless tail garbage after the last box
    expectFail(b => b ++ Array[Byte](1, 2, 3), "tail garbage")
  }

  private def indexOfType(b: Array[Byte], t: String): Int = {
    val needle = t.getBytes("US-ASCII")
    (0 to b.length - 4).find(i => needle.indices.forall(j => b(i + j) == needle(j)))
      .getOrElse(fail(s"type $t not found"))
  }

  test("distributed walk over a generated corpus") {
    import spark.implicits._
    val metas = spark.range(0, 50).as[Long]
      .mapPartitions(_.map(id =>
        Mp4Decoder.meta(MediaRecord(id, "video", Mp4Synth.mp4(id)))))
      .collect()
    assert(metas.length == 50)
    assert(metas.forall(m => m.duration_ms >= 5000 && m.video_tracks == 1))
  }
}
