package graft.operators

import graft.operators.Multimodal.{AudioRecord, FlacDecoder, FlacSynth}
import org.scalatest.funsuite.AnyFunSuite

/** FLAC walk: synthesized-container round trip against the closed form
  * plus the malformed-input guards (the Mp3/Mp4/Adts spec discipline —
  * a real parser must fail loudly, not mis-parse). */
class FlacDecoderSpec extends AnyFunSuite {

  test("synth round trip matches the closed form across parameter space") {
    (0L until 60L).foreach { id =>
      val m = FlacDecoder.meta(AudioRecord(id, FlacSynth.flac(id)))
      val sr = Array(44100, 48000, 96000, 88200, 32000)((id % 5).toInt)
      val total = sr.toLong * (1 + id % 20) + id % 1000
      assert(m.sample_rate == sr, s"id=$id")
      assert(m.channels == 1 + (id % 4).toInt)
      assert(m.bits_per_sample == 8 * (1 + (id % 4).toInt))
      assert(m.total_samples == total)
      assert(m.duration_ms == total * 1000 / sr)
      assert(m.n_blocks == (if (id % 3 != 0) 2 else 1))
      val expectBytes = 42L + (if (id % 3 != 0) 4 + (id % 6) * 5 else 0)
      assert(m.flac_bytes == expectBytes)
    }
  }

  test("a 36-bit total_samples value survives the unpack") {
    // hand-pack a STREAMINFO carrying total = 2^35 + 5 — past any int
    val b = FlacSynth.flac(0L).clone()
    // bytes 8..41 are STREAMINFO; total occupies the low nibble of
    // byte 8+10+3 and the following 4 bytes
    val s0 = 8 + 10
    b(s0 + 3) = ((b(s0 + 3) & 0xf0) | 0x8).toByte
    b(s0 + 4) = 0; b(s0 + 5) = 0; b(s0 + 6) = 0; b(s0 + 7) = 5
    val m = FlacDecoder.meta(AudioRecord(0L, b))
    assert(m.total_samples == (1L << 35) + 5)
  }

  test("malformed inputs fail with the media-tagged error") {
    def bad(bytes: Array[Byte], frag: String) = {
      val e = intercept[IllegalArgumentException] {
        FlacDecoder.meta(AudioRecord(7L, bytes))
      }
      assert(e.getMessage.contains("media 7") && e.getMessage.contains(frag),
        e.getMessage)
    }
    bad("flaC....".getBytes, "magic")
    bad(Array[Byte]('f', 'L', 'a', 'C', 0x00), "truncated block header")
    val good = FlacSynth.flac(1L)
    bad(good.take(20), "truncated block body")
    // first block not STREAMINFO: flip the type bits to PADDING
    val wrongType = good.clone(); wrongType(4) = 0x01
    bad(wrongType, "STREAMINFO")
  }
}
