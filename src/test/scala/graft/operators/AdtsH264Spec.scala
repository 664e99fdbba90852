package graft.operators

import graft.operators.Multimodal._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the AAC-ADTS frame walk and the H.264 Annex-B NAL scan against
  * their synthesis closed forms (the q_media_aac / q_media_h264 oracle
  * arithmetic) plus the corrupt-input guards — media-tagged errors,
  * never a wild walk.
  */
class AdtsH264Spec extends AnyFunSuite {

  private val Rates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  test("ADTS meta matches the synthesis closed form") {
    (0L until 220L).foreach { id =>
      val (sfi, channels, frames, flen) = AdtsSynth.params(id)
      val me = AdtsDecoder.meta(AudioRecord(id, AdtsSynth.adts(id)))
      assert(me.frames == frames, s"id=$id")
      assert(me.sample_rate == Rates(sfi))
      assert(me.channels == channels && me.profile == 2)
      assert(me.n_samples == frames.toLong * 1024)
      assert(me.duration_ms == frames.toLong * 1024000L / Rates(sfi))
      assert(me.aac_bytes == frames.toLong * flen)
    }
  }

  test("corrupt ADTS fails with the media-tagged error") {
    val good = AdtsSynth.adts(4L)
    def expectFail(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        AdtsDecoder.meta(AudioRecord(4L, mutate(good.clone())))
      }
      assert(e.getMessage.contains("media 4"), s"$what: ${e.getMessage}")
    }
    expectFail(b => java.util.Arrays.copyOfRange(b, 0, b.length - 3), "truncate")
    expectFail({ b => b(0) = 0x12; b }, "sync")
    // reserved sampling index (0xF) in the first header
    expectFail({ b => b(2) = (b(2) | 0x3c).toByte; b }, "sampling index")
    // mid-stream parameter flip: change the second frame's channel bits
    expectFail({ b =>
      val flen = ((b(3) & 0x03) << 11) | ((b(4) & 0xff) << 3) | ((b(5) & 0xe0) >>> 5)
      b(flen + 3) = (b(flen + 3) ^ 0x40).toByte; b
    }, "parameter flip")
  }

  test("NAL stats match the synthesis closed form") {
    (0L until 220L).foreach { id =>
      val (gops, perGop, payload) = H264Synth.params(id)
      val st = H264NalScanner.stats(
        MediaRecord(id, "video", H264Synth.annexB(id)))
      assert(st.nals == 2 + gops * perGop, s"id=$id")
      assert(st.sps == 1 && st.pps == 1)
      assert(st.idr == gops)
      assert(st.non_idr == gops * (perGop - 1))
      assert(st.stream_bytes == (2L + gops * perGop) * (5 + payload))
    }
  }

  test("corrupt Annex-B fails with the media-tagged error") {
    val good = H264Synth.annexB(6L)
    def expectFail(mutate: Array[Byte] => Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        H264NalScanner.stats(MediaRecord(6L, "video", mutate(good.clone())))
      }
      assert(e.getMessage.contains("media 6"), s"$what: ${e.getMessage}")
    }
    // forbidden_zero_bit set on the first NAL header
    expectFail({ b => b(4) = (b(4) | 0x80).toByte; b }, "forbidden bit")
    // no start code at stream begin
    expectFail({ b => b(3) = 0x55; b }, "no leading start code")
    // no start codes at all
    expectFail(_ => Array.fill[Byte](16)(0xaa.toByte), "no start codes")
  }
}
