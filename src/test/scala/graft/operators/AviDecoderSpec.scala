package graft.operators

import graft.TestSpark
import graft.operators.Multimodal.{AviDecoder, AviSynth, MediaRecord}
import org.scalatest.funsuite.AnyFunSuite

/** Real AVI container parsing + real JDK BMP frame decode: fixtures are
  * genuine RIFF/AVI bytes from AviSynth (the same in-memory-fixture
  * pattern as MediaDecoderSpec/WavDecoderSpec). Pixel-level assertions
  * pin the whole chain — chunk alignment, avih offsets, DIB
  * bottom-up/BGR handling, BITMAPFILEHEADER wrapping — not just the
  * header walk. */
class AviDecoderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("meta reads true avih width/height/frames/usPerFrame") {
    for (id <- Seq(0L, 3L, 11L, 38L)) {
      val (w, h, nf, usf) = AviSynth.params(id)
      val m = AviDecoder.meta(MediaRecord(id, "video", AviSynth.solidAvi(id)))
      assert((m.width, m.height, m.n_frames, m.us_per_frame) == (w, h, nf, usf))
    }
  }

  test("every frame decodes through ImageIO with the exact solid color") {
    val id = 5L
    val (w, h, nf, _) = AviSynth.params(id)
    val imgs = AviDecoder
      .frames(MediaRecord(id, "video", AviSynth.solidAvi(id))).toSeq
    assert(imgs.size == nf)
    imgs.zipWithIndex.foreach { case (img, i) =>
      assert(img.getWidth == w && img.getHeight == h)
      val (r, g, b) = AviSynth.frameColor(id, i)
      // corners + center: a row-padding or bottom-up bug shows here
      for ((x, y) <- Seq((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1),
          (w / 2, h / 2))) {
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) == (r, g, b),
          s"frame $i pixel ($x,$y)")
      }
    }
  }

  test("frameChannelSums are exact w*h multiples of the solid color") {
    val id = 9L
    val (w, h, nf, _) = AviSynth.params(id)
    val sums = AviDecoder
      .frameChannelSums(MediaRecord(id, "video", AviSynth.solidAvi(id))).toSeq
    assert(sums.size == nf)
    sums.foreach { case (i, sr, sg, sb, np) =>
      val (r, g, b) = AviSynth.frameColor(id, i)
      assert(np == w.toLong * h)
      assert((sr, sg, sb) == (r * np, g * np, b * np))
    }
  }

  test("decodes distributed via mapPartitions (one decoder per partition)") {
    import spark.implicits._
    val metas = spark.range(40).repartition(7).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val m = AviDecoder.meta(
            MediaRecord(id, "video", AviSynth.solidAvi(id)))
          (m.media_id, m.width, m.height, m.n_frames)
        }
      }.collect().toSet
    val expect = (0L until 40L).map { id =>
      val (w, h, nf, _) = AviSynth.params(id)
      (id, w, h, nf)
    }.toSet
    assert(metas == expect)
  }

  test("non-AVI bytes are rejected, not misparsed") {
    val junk = MediaRecord(1L, "video", Array.fill[Byte](64)(42))
    intercept[IllegalArgumentException] { AviDecoder.meta(junk) }
  }
}
