package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Multimodal columns (training-data extension surface, SURVEY.md §2-B
  * adjacency): image/audio/video as opaque BINARY columns with
  * typed metadata, processed by a pluggable decoder over
  * `Dataset.mapPartitions` (the Scala analogue of `mapInPandas`: one
  * decoder instance per partition, streaming batches of rows, never a
  * driver-side loop).
  *
  * STUB NOTICE: no image/audio codecs exist in this environment, so
  * `StubDecoder` derives deterministic metadata/derivatives from the
  * bytes themselves. The Spark-side plumbing — binary schema, partition
  * batching, decoder lifecycle, frame explosion — is real and tested;
  * swapping `StubDecoder` for a JNI/javacv-backed implementation is a
  * one-class change behind the `MediaDecoder` trait.
  *
  * The test corpus has no media table, so the media "bytes" are the
  * UTF-8 bytes of `documents.text` — which also makes the stubbed
  * pipeline oracle-checkable end-to-end (metadata is a pure function of
  * byte length, expressible in SQL on octet_length).
  */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)
  case class Thumb(media_id: Long, out_w: Int, out_h: Int, thumb_bytes: Long)
  case class Frame(media_id: Long, frame_idx: Int, frame_off: Long, frame_len: Long)

  /** Decoder boundary: a real implementation wraps an image/video
    * library; one instance is created per partition. */
  trait MediaDecoder extends Serializable {
    def meta(m: MediaRecord): MediaMeta
    def resize(m: MediaRecord, w: Int, h: Int): Thumb
    def frames(m: MediaRecord): Iterator[Frame]
  }

  /** Deterministic fake: metadata from byte length, "resize" returns a
    * proportional byte budget, "frames" are fixed-size byte windows. */
  object StubDecoder extends MediaDecoder {
    val FrameBytes = 4096L
    def meta(m: MediaRecord): MediaMeta = {
      val n = m.content.length.toLong
      MediaMeta(m.media_id, m.kind, n,
        width = (n % 640).toInt + 16, height = (n % 480).toInt + 16,
        n_frames = (((n + FrameBytes - 1) / FrameBytes)).toInt)
    }
    def resize(m: MediaRecord, w: Int, h: Int): Thumb =
      Thumb(m.media_id, w, h, math.min(m.content.length.toLong, (w * h).toLong))
    def frames(m: MediaRecord): Iterator[Frame] = {
      val n = m.content.length.toLong
      (0L until (n + FrameBytes - 1) / FrameBytes).iterator.map { i =>
        Frame(m.media_id, i.toInt, i * FrameBytes, math.min(FrameBytes, n - i * FrameBytes))
      }
    }
  }

  /** REAL decoder over the JDK's built-in `javax.imageio` codecs
    * (PNG/BMP/GIF/JPEG — no external jars). Decodes actual pixels:
    * `meta` reads true width/height and the frame count from the
    * stream (animated GIFs report >1), `resize` rescales through a
    * `Graphics2D` draw and re-encodes to PNG, `frames` yields one row
    * per embedded image with `frame_len` = its pixel count (offsets
    * within compressed containers aren't meaningful, so `frame_off`
    * is the running pixel offset).
    *
    * The oracle-backed q_media_* queries stay on `StubDecoder` because
    * the test corpus's "media bytes" are document text, not images —
    * but the decoder boundary is exercised end-to-end with real PNG/
    * BMP/GIF bytes in MediaDecoderSpec, including through
    * `mapPartitions` on executors.
    */
  object ImageIoDecoder extends MediaDecoder {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    private def withReader[A](m: MediaRecord)(
        f: javax.imageio.ImageReader => A): A = {
      // no disk-backed stream cache on executors
      ImageIO.setUseCache(false)
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(m.content))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no ImageIO codec for media ${m.media_id}")
        val r = readers.next()
        r.setInput(iis)
        try f(r) finally r.dispose()
      } finally iis.close()
    }

    def meta(m: MediaRecord): MediaMeta = withReader(m) { r =>
      MediaMeta(m.media_id, m.kind, m.content.length.toLong,
        r.getWidth(0), r.getHeight(0), r.getNumImages(true))
    }

    /** The resized image itself, re-encoded as PNG. */
    def resizeBytes(m: MediaRecord, w: Int, h: Int): Array[Byte] = {
      ImageIO.setUseCache(false)
      val img = ImageIO.read(new ByteArrayInputStream(m.content))
      require(img != null, s"undecodable media ${m.media_id}")
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

    def resize(m: MediaRecord, w: Int, h: Int): Thumb =
      Thumb(m.media_id, w, h, resizeBytes(m, w, h).length.toLong)

    def frames(m: MediaRecord): Iterator[Frame] = withReader(m) { r =>
      val n = r.getNumImages(true)
      var off = 0L
      (0 until n).map { i =>
        val px = r.getWidth(i).toLong * r.getHeight(i)
        val fr = Frame(m.media_id, i, off, px)
        off += px
        fr
      }.iterator // materialized inside withReader: the reader closes on return
    }
  }

  /** documents.text → a media table (binary content + kind). */
  private def mediaTable(s: org.apache.spark.sql.SparkSession, dir: String) =
    table(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      col("text").cast("binary").as("content"))

  val defs: Seq[QDef] = Seq(

    // Decode/feature-extract: one decoder per partition via mapPartitions.
    QDef("q_media_meta",
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 480 + 16 AS INTEGER) AS height,
        |  CAST(ceil(octet_length(encode(text)) / 4096.0) AS INTEGER) AS n_frames
        |FROM documents
        |""".stripMargin) { (s, dir) =>
      import s.implicits._
      mediaTable(s, dir).as[MediaRecord]
        .mapPartitions { it =>
          val dec = StubDecoder // real impl: construct decoder here, once per partition
          it.map(dec.meta)
        }.toDF()
    },

    // Resize plumbing: fixed target, per-partition decoder.
    QDef("q_media_resize",
      """SELECT doc_id AS media_id, 32 AS out_w, 32 AS out_h,
        |  CAST(least(octet_length(encode(text)), 1024) AS BIGINT) AS thumb_bytes
        |FROM documents
        |""".stripMargin) { (s, dir) =>
      import s.implicits._
      mediaTable(s, dir).as[MediaRecord]
        .mapPartitions { it =>
          val dec = StubDecoder
          it.map(m => dec.resize(m, 32, 32))
        }.toDF()
    },

    // Frame sampling: 1 media row → N frame rows (flatMap explosion).
    QDef("q_media_frames",
      """WITH m AS (SELECT doc_id AS media_id,
        |             CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |f AS (SELECT media_id, n, unnest(range(0, CAST(ceil(n / 4096.0) AS BIGINT))) AS i FROM m)
        |SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
        |  i * 4096 AS frame_off,
        |  least(4096, n - i * 4096) AS frame_len
        |FROM f
        |""".stripMargin) { (s, dir) =>
      import s.implicits._
      mediaTable(s, dir).as[MediaRecord]
        .mapPartitions { it =>
          val dec = StubDecoder
          it.flatMap(dec.frames)
        }.toDF()
    },
  )
}
