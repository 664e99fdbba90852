package graft.operators

import graft.TestSpark
import graft.operators.Multimodal.{AudioRecord, WavDecoder}
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real WAV decode through the JDK's javax.sound.sampled: fixtures are
  * sine waves rendered to PCM16 and wrapped in a RIFF container by
  * `AudioSystem.write`, so the test needs no binary files and no
  * external libraries — the same in-memory-fixture pattern as
  * MediaDecoderSpec. A 1.0-amplitude sine has RMS 1/√2 ≈ 0.7071 and
  * peak ≈ amp, which pins the sample decode (byte order, signedness,
  * normalization), not just the header parse. */
class WavDecoderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** `seconds` of `freq`-Hz sine at `amp`, PCM16 little-endian. */
  private def sineWav(rate: Float, channels: Int, seconds: Double,
      freq: Double, amp: Double): Array[Byte] = {
    val nFrames = (rate * seconds).toInt
    val data = new Array[Byte](nFrames * channels * 2)
    var i = 0
    while (i < nFrames) {
      val s = (amp * math.sin(2 * math.Pi * freq * i / rate) * 32767).toInt
      var c = 0
      while (c < channels) {
        val off = (i * channels + c) * 2
        data(off) = (s & 0xff).toByte
        data(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nFrames)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("meta reads true rate/channels/bits/frames from the RIFF header") {
    val m = WavDecoder.meta(AudioRecord(1L, sineWav(16000f, 1, 0.5, 440, 0.8)))
    assert((m.sample_rate, m.channels, m.bits) === ((16000, 1, 16)))
    assert(m.n_samples === 8000L)
    assert(m.duration_ms === 500L)

    val st = WavDecoder.meta(AudioRecord(2L, sineWav(44100f, 2, 0.25, 1000, 0.5)))
    assert((st.sample_rate, st.channels) === ((44100, 2)))
    assert(st.n_samples === 11025L)
  }

  test("features decode actual samples: sine RMS = amp/sqrt(2), peak = amp") {
    val f = WavDecoder.features(AudioRecord(3L, sineWav(16000f, 1, 1.0, 440, 0.8)))
    assert(math.abs(f.rms - 0.8 / math.sqrt(2)) < 1e-3, s"rms ${f.rms}")
    assert(math.abs(f.peak - 0.8) < 1e-3, s"peak ${f.peak}")
    // silence stays silent
    val z = WavDecoder.features(AudioRecord(4L, sineWav(16000f, 1, 0.1, 440, 0.0)))
    assert(z.rms === 0.0 && z.peak === 0.0)
  }

  test("clips window the stream like the image frame sampler") {
    val cs = WavDecoder.clips(
      AudioRecord(5L, sineWav(16000f, 1, 0.5, 440, 0.5)), clipMs = 200).toSeq
    // 8000 frames, 3200 per 200ms clip → 3 clips, last partial
    assert(cs.map(_.n_samples) === Seq(3200L, 3200L, 1600L))
    assert(cs.map(_.start_ms) === Seq(0L, 200L, 400L))
  }

  test("decodes distributed through mapPartitions on executors") {
    import spark.implicits._
    val recs = (0 until 12).map { i =>
      AudioRecord(i.toLong, sineWav(8000f, 1 + i % 2, 0.1 + 0.05 * i, 330, 0.6))
    }
    val metas = spark.createDataset(recs).repartition(4)
      .mapPartitions(it => it.map(WavDecoder.meta))
      .collect().sortBy(_.media_id)
    assert(metas.length === 12)
    recs.zip(metas).foreach { case (r, m) =>
      assert(m.media_id === r.media_id)
      assert(m.sample_rate === 8000)
      assert(m.channels === 1 + (r.media_id % 2).toInt)
      assert(m.n_samples === (8000 * (0.1 + 0.05 * r.media_id)).toInt.toLong)
    }
    val feats = spark.createDataset(recs).repartition(3)
      .mapPartitions(it => it.map(WavDecoder.features))
      .collect()
    feats.foreach(f => assert(math.abs(f.rms - 0.6 / math.sqrt(2)) < 1e-2))
  }

  test("q_media_clips == closed-form clip geometry from synthesis params") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val expect = graft.table(spark, sfDir, "documents")
      .select("doc_id").as[Long].collect().filter(_ % 7 == 3).flatMap { id =>
        val n = (8 + 2 * (id % 5)) * (50 + id % 50)
        val nClips = ((n + 399) / 400).toInt
        (0 until nClips).map(i =>
          (id, i, i * 50L, math.min(400L, n - i * 400L)))
      }.toSet
    val got = graft.SparkEntry.queries("q_media_clips")(spark, sfDir)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
