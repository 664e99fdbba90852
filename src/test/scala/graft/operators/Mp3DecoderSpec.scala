package graft.operators

import graft.TestSpark
import graft.operators.Multimodal.{AudioRecord, Mp3Decoder, Mp3Synth}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the MP3 frame-header walk: exact metadata against the
  * synthesis parameters' closed form (the q_media_mp3 oracle
  * arithmetic), ID3v2 syncsafe skip, and the malformed-input guards —
  * every corruption must fail with the media-tagged error, never a
  * wild or non-terminating walk (the AviDecoder round-7 lesson).
  */
class Mp3DecoderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Rates = Array(44100, 48000, 32000)

  test("meta matches the synthesis closed form across parameter space") {
    (0L until 220L).foreach { id =>
      val (bidx, sridx, frames) = Mp3Synth.params(id)
      val me = Mp3Decoder.meta(AudioRecord(id, Mp3Synth.cbrMp3(id)))
      val kbps = Bitrates(bidx); val sr = Rates(sridx)
      assert(me.frames == frames, s"id=$id")
      assert(me.bitrate_kbps == kbps && me.sample_rate == sr && me.channels == 1)
      assert(me.n_samples == frames.toLong * 1152)
      assert(me.duration_ms == frames.toLong * 1152000L / sr)
      assert(me.audio_bytes ==
        frames.toLong * (144000 * kbps / sr) + frames / 2)
    }
  }

  test("ID3v2 tag is skipped via its syncsafe length") {
    // ids 0..4 cover tag content sizes 0,7,14,21,28
    (0L until 5L).foreach { id =>
      val bytes = Mp3Synth.cbrMp3(id)
      assert(bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3')
      val me = Mp3Decoder.meta(AudioRecord(id, bytes))
      assert(me.frames == Mp3Synth.params(id)._3)
    }
  }

  test("malformed input fails with the media-tagged error, never a wild walk") {
    val good = Mp3Synth.cbrMp3(9L)
    def expectFail(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Mp3Decoder.meta(AudioRecord(9L, mutate(good.clone())))
      }
      assert(e.getMessage.contains("media 9"), s"$what: ${e.getMessage}")
    }
    // truncated final frame
    expectFail(b => java.util.Arrays.copyOfRange(b, 0, b.length - 3), "truncate")
    // lost sync: corrupt the first frame header byte (after the 10+28?
    // tag — find it via the tag's syncsafe size)
    expectFail({ b =>
      val tag = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      b(10 + tag) = 0x00; b
    }, "sync")
    // reserved bitrate index (0xF)
    expectFail({ b =>
      val tag = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      b(10 + tag + 2) = 0xf0.toByte; b
    }, "bitrate index")
    // ID3 size overrunning the buffer
    expectFail({ b => b(9) = 0x7f; b(8) = 0x7f; b }, "id3 overrun")
    // empty after tag → no frames
    val e = intercept[IllegalArgumentException] {
      val onlyTag = java.util.Arrays.copyOfRange(Mp3Synth.cbrMp3(0L), 0, 10)
      Mp3Decoder.meta(AudioRecord(7L, onlyTag))
    }
    assert(e.getMessage.contains("media 7"))
  }

  test("distributed walk over a generated corpus") {
    import spark.implicits._
    val metas = spark.range(0, 50)
      .as[Long]
      .mapPartitions(_.map(id =>
        Mp3Decoder.meta(AudioRecord(id, Mp3Synth.cbrMp3(id)))))
      .collect()
    assert(metas.length == 50)
    assert(metas.forall(m => m.frames >= 20 && m.duration_ms > 0))
  }
}
