package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ExifDecoder — the APP1-wrapped TIFF walk. Round-trips the
  * synthesized corpus (both byte orders), skips non-Exif segments
  * honestly, and fails LOUDLY (never silently-wrong metadata) on the
  * malformed shapes a trusted-offset walk must guard. */
class ExifDecoderSpec extends AnyFunSuite {
  import Multimodal.{ExifDecoder, ExifSynth}

  test("round-trip: decoded metadata equals the synthesis parameters, " +
      "both byte orders") {
    (0L to 33L).foreach { id =>
      val (le, orient, w, h, fillers) = ExifSynth.params(id)
      val me = ExifDecoder.meta(id, ExifSynth.jpeg(id))
      assert(me.byte_order == (if (le) "II" else "MM"))
      assert(me.orientation == orient && me.exif_w == w && me.exif_h == h)
      assert(me.app1_len == 76)
      assert(me.n_segments == 1 + fillers)
    }
  }

  test("malformed guards: truncation, lost sync, bad lengths, missing " +
      "or non-Exif APP1, bad IFD offsets all fail loudly") {
    val good = ExifSynth.jpeg(4L)

    def fails(b: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](ExifDecoder.meta(99L, b))
      assert(e.getMessage.contains("media 99"), s"$what: ${e.getMessage}")
    }

    fails(Array[Byte](), "empty")
    fails(good.take(3), "truncated header")
    fails(Array[Byte](0, 0, 0, 0), "no SOI")
    fails(good.dropRight(2), "no EOI terminator") // runs off the stream
    // segment length escaping the container
    val badLen = good.clone()
    badLen(4) = 0x7f; fails(badLen, "APP1 length escapes")
    // APP1 carrying a non-Exif identifier: segment is SKIPPED, and the
    // decoder then reports the missing Exif block
    val notExif = good.clone()
    notExif(6) = 'J'.toByte
    val e2 = intercept[IllegalArgumentException](ExifDecoder.meta(99L, notExif))
    assert(e2.getMessage.contains("no Exif APP1"), e2.getMessage)
    // corrupt the TIFF byte-order mark inside the APP1 payload
    val badBom = good.clone()
    badBom(12) = 'X'.toByte; fails(badBom, "bad byte order")
    // IFD offset pointing outside the block
    val badIfd = good.clone()
    // id=4 is little-endian: IFD0 offset lives at TIFF+4 (= file 16)
    badIfd(16) = 0x70; fails(badIfd, "IFD offset out of bounds")
  }

  test("a JPEG whose APP1 sits after other segments still resolves") {
    // splice a COM segment BEFORE the APP1 of a synthesized file
    val g = ExifSynth.jpeg(11L)
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0, 4, 1, 2)
    val moved = g.take(2) ++ com ++ g.drop(2)
    val me = ExifDecoder.meta(11L, moved)
    assert(me.orientation == ExifSynth.params(11L)._2)
    assert(me.n_segments == ExifDecoder.meta(11L, g).n_segments + 1)
  }
}
