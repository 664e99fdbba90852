package graft.operators

import graft.operators.Multimodal.{AviDecoder, AviSynth, MediaRecord, VideoDupSynth}
import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-in-AVI: genuine compressed video decode through the JDK's
  * own JPEG reader (no codec jars). Pins (1) the container round-trip
  * — handler dispatch, '00dc' chunk walk, per-frame JPEG decode; (2)
  * the error margin q_media_video_mjpeg's bucket oracle stands on;
  * (3) the cross-codec near-dup contract: an MJPEG re-encode of a
  * clip fingerprints within the q_dedup_video hamming threshold of
  * its DIB original. */
class MjpegDecodeSpec extends AnyFunSuite {

  test("MJPEG AVI round-trip: metadata from avih, every frame decodes " +
      "via the JPEG reader, and decoded solid colors sit well inside " +
      "the ±8 bucket margin") {
    (0L until 40L).foreach { id =>
      val rec = MediaRecord(id, "video", AviSynth.solidMjpegAvi(id))
      val me = AviDecoder.meta(rec)
      val (w, h, nf, usf) = AviSynth.params(id)
      assert((me.width, me.height, me.n_frames, me.us_per_frame) ==
        ((w, h, nf, usf)))
      val frames = AviDecoder.frames(rec).toVector
      assert(frames.size == nf)
      frames.zipWithIndex.foreach { case (img, i) =>
        assert(img.getWidth == w && img.getHeight == h)
        val (er, eg, eb) = AviSynth.frameColorQ(id, i)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val np = w.toLong * h
        // the margin the oracle's bucket arithmetic stands on: mean
        // channel error strictly under half the ±8 bucket slack
        Seq((sr, er, "r"), ((sg, eg, "g")), ((sb, eb, "b"))).foreach {
          case (s, e, c) =>
            val err = math.abs(s.toDouble / np - e)
            assert(err < 4.0,
              s"id $id frame $i channel $c: |decoded mean - $e| = $err")
        }
        // and therefore the bucket index recovers exactly
        assert(sr / np / 16 == er / 16 && sg / np / 16 == eg / 16 &&
          sb / np / 16 == eb / 16)
      }
    }
  }

  test("framesAt on MJPEG skips unwanted frames at the chunk walk and " +
      "decodes the same images as the full walk") {
    val id = 13L
    val rec = MediaRecord(id, "video", AviSynth.solidMjpegAvi(id))
    val all = AviDecoder.frames(rec).toVector
    val wanted = Set(0, all.size - 1)
    val some = AviDecoder.framesAt(rec, wanted)
    assert(some.keySet == wanted)
    wanted.foreach { fi =>
      assert(some(fi).getRGB(1, 1) == all(fi).getRGB(1, 1))
    }
  }

  test("cross-codec near-dup: the MJPEG re-encode of every clip " +
      "fingerprints within the 3-bit q_dedup_video hamming threshold " +
      "of its DIB original") {
    (0L until 24L).foreach { id =>
      val dib = VideoDupSynth.fingerprintSampled(VideoDupSynth.avi(id), id)
      val mjpeg = VideoDupSynth.fingerprintSampled(
        VideoDupSynth.mjpegAvi(id), id, exact = false)
      val hamming = java.lang.Long.bitCount(dib ^ mjpeg)
      assert(hamming <= 3,
        s"id $id: DIB vs MJPEG re-encode hamming $hamming > 3")
    }
  }

  test("a DIB clip still decodes through the refactored handler " +
      "dispatch bit-exactly (frameColor closed form)") {
    val id = 7L
    val rec = MediaRecord(id, "video", AviSynth.solidAvi(id))
    AviDecoder.frames(rec).zipWithIndex.foreach { case (img, i) =>
      val (r, g, b) = AviSynth.frameColor(id, i)
      val p = img.getRGB(0, 0)
      assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) == ((r, g, b)))
    }
  }
}
