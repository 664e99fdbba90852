package graft.operators

import graft.operators.Multimodal.{TiffDecoder, TiffSynth}
import org.scalatest.funsuite.AnyFunSuite

/** TIFF IFD-chain walk: synthesized-container round trip against the
  * closed form — both byte orders, every page count — plus the
  * malformed-input guards (the Flac/Mp3/Mp4 spec discipline: a linked
  * directory structure must validate every offset before following
  * it, not mis-parse). */
class TiffDecoderSpec extends AnyFunSuite {

  test("synth round trip matches the closed form across parameter space") {
    (0L until 60L).foreach { id =>
      val m = TiffDecoder.meta(id, TiffSynth.tiff(id))
      val pages = (1 + id % 3).toInt
      val w = (8 + id % 32).toInt
      val h = (8 + (id * 3) % 32).toInt
      val bps = (8 * (1 + id % 2)).toInt
      assert(m.byte_order == (if (id % 2 == 0) "II" else "MM"), s"id=$id")
      assert(m.n_pages == pages)
      assert(m.width == w && m.height == h && m.bits_per_sample == bps)
      val strips = (0 until pages)
        .map(p => (w + p).toLong * (h + p) * bps / 8).sum
      assert(m.strip_bytes == strips)
      assert(m.tiff_bytes == 8 + pages * 102 + strips)
    }
  }

  test("big-endian values decode identically to little-endian") {
    // ids 2 and 3 share no parameters, so compare one of each order
    // against its own closed form rather than each other — plus a
    // direct check that an MM container's multi-byte fields are read
    // big-endian (width survives the swap)
    val mm = TiffDecoder.meta(3L, TiffSynth.tiff(3L))
    assert(mm.byte_order == "MM" && mm.width == (8 + 3 % 32))
  }

  test("malformed inputs fail with the media-tagged error") {
    def bad(bytes: Array[Byte], frag: String) = {
      val e = intercept[IllegalArgumentException] {
        TiffDecoder.meta(7L, bytes)
      }
      assert(e.getMessage.contains("media 7") && e.getMessage.contains(frag),
        e.getMessage)
    }
    bad(Array[Byte]('I', 'I'), "truncated TIFF header")
    bad("XXzzzzzz".getBytes, "byte-order mark")
    bad(Array[Byte]('I', 'I', 43, 0, 8, 0, 0, 0), "bad TIFF magic")

    val good = TiffSynth.tiff(2L) // II, 3 pages
    // IFD0 offset pointing past the container
    val oob = good.clone()
    oob(4) = -1; oob(5) = -1; oob(6) = 0; oob(7) = 0
    bad(oob, "out of bounds")
    // truncate inside IFD0's entry table
    bad(good.take(20), "truncated IFD")
    // corrupt StripByteCounts of the FIRST page so the strip escapes:
    // entry 279 is the 8th entry (index 7) of IFD0 at offset 8
    val esc = good.clone()
    val e279 = 8 + 2 + 12 * 7 + 8
    esc(e279 + 2) = 0x7f // strip length gains 2^23 bytes
    bad(esc, "escapes the container")
  }
}
