package graft.operators

import graft.TestSpark
import graft.operators.Multimodal.{ImageIoDecoder, MediaRecord}
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real-pixel decode through the JDK ImageIO codecs: fixtures are
  * generated in memory (PNG/BMP/animated GIF), so the test needs no
  * binary files in the repo and no external libraries. */
class MediaDecoderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def img(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val b = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) b.setRGB(x, y, rgb)
    b
  }

  private def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img(w, h, 0xFF0000), fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def animatedGif(frames: Seq[(Int, Int)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    frames.foreach { case (iw, ih) =>
      w.writeToSequence(new javax.imageio.IIOImage(img(iw, ih, 0x00FF00), null, null), null)
    }
    w.endWriteSequence()
    w.dispose(); ios.close()
    bos.toByteArray
  }

  test("meta decodes true dimensions from real PNG and BMP bytes") {
    val png = MediaRecord(1L, "image", encode(17, 9, "png"))
    val mp = ImageIoDecoder.meta(png)
    assert((mp.width, mp.height, mp.n_frames) === ((17, 9, 1)))
    assert(mp.n_bytes === png.content.length.toLong)

    val bmp = MediaRecord(2L, "image", encode(23, 11, "bmp"))
    val mb = ImageIoDecoder.meta(bmp)
    assert((mb.width, mb.height, mb.n_frames) === ((23, 11, 1)))
  }

  test("resize produces a decodable image at the target size") {
    val m = MediaRecord(3L, "image", encode(64, 48, "png"))
    val t = ImageIoDecoder.resize(m, 32, 32)
    assert((t.out_w, t.out_h) === ((32, 32)))
    val bytes = ImageIoDecoder.resizeBytes(m, 32, 32)
    assert(t.thumb_bytes === bytes.length.toLong)
    val back = ImageIO.read(new ByteArrayInputStream(bytes))
    assert((back.getWidth, back.getHeight) === ((32, 32)))
    // solid-red source stays red through the rescale
    assert((back.getRGB(16, 16) & 0xFFFFFF) === 0xFF0000)
  }

  test("animated GIF reports every frame with pixel counts") {
    val m = MediaRecord(4L, "video", animatedGif(Seq((8, 6), (8, 6), (8, 6))))
    assert(ImageIoDecoder.meta(m).n_frames === 3)
    val fs = ImageIoDecoder.frames(m).toSeq
    assert(fs.map(_.frame_idx) === Seq(0, 1, 2))
    assert(fs.forall(_.frame_len === 48L))
    assert(fs.map(_.frame_off) === Seq(0L, 48L, 96L))
  }

  test("decoder runs distributed through mapPartitions on real bytes") {
    import spark.implicits._
    val recs = Seq(
      MediaRecord(10L, "image", encode(5, 7, "png")),
      MediaRecord(11L, "image", encode(12, 3, "bmp")),
      MediaRecord(12L, "video", animatedGif(Seq((4, 4), (4, 4)))))
    val got = spark.createDataset(recs).repartition(3)
      .mapPartitions { it =>
        val dec = ImageIoDecoder // one decoder per partition
        it.map(dec.meta)
      }.collect().map(m => m.media_id -> ((m.width, m.height, m.n_frames))).toMap
    assert(got === Map(
      10L -> ((5, 7, 1)), 11L -> ((12, 3, 1)), 12L -> ((4, 4, 2))))
  }
}
