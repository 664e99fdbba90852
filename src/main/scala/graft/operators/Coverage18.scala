package graft.operators

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 extension batch: the video leg of the perceptual near-dup
  * family (the last unbridged modality) and the round's pipeline
  * additions.
  *
  * Reference scope: SURVEY.md §2-B LLM-pipeline operator family
  * (near-duplicate detection over multimodal columns).
  */
object Coverage18 {

  /** The shared 4×16 banding → equi-join → hamming verify used by the
    * image/audio/video fingerprint dedups: threshold 3 < 4 bands ⇒
    * pigeonhole leaves ≥ 1 band intact, so the blocked join provably
    * equals the all-pairs scan (each modality's spec pins it). */
  private[operators] def bandedPairs(sig: DataFrame): DataFrame = {
    val banded = sig.select(col("doc_id"), col("h"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          expr(s"shiftright(h, ${b * 16}) & 65535").as("bucket"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("h"), col("bb.band"), col("bb.bucket"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("b.doc_id") > col("a.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.h").bitwiseXOR(col("b.h")))
          .cast("bigint").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  val defs: Seq[QDef] = Seq(

    // ---- video near-dup dedup: temporal dHash + banding -----------------
    // The video bridge of the near-dup family, the AVI leg of
    // q_dedup_images / q_dedup_audio: synthesize a real RIFF/AVI per
    // video doc (deterministic solid-gray frames + planted variants —
    // Multimodal.VideoDupSynth), decode every frame through the
    // genuine AviDecoder → JDK BMP path, fingerprint the per-frame
    // brightness envelope sampled at 65 TIME FRACTIONS (bit i =
    // b(s(i+1)) > b(s(i)), s(i) = i·(nf−1)/64) — invariant under both
    // a 2× SPEED-UP (every-2nd-frame copy reads the same sampled
    // sequence: hamming 0 though the container halves) and a global
    // brightness shift (gradient signs survive: hamming 0 though
    // every pixel byte differs) — and band the 64-bit hash through
    // the shared 4 × 16-bit machinery (threshold 3 < 4 bands ⇒
    // banding provably equals all-pairs; VideoDedupSpec pins it).
    // The oracle recomputes every sampled brightness in closed
    // integer form (sampled base frame is always 2i); a chunk-walk,
    // frame-decode or sampling bug breaks every row.
    QDef("q_dedup_video",
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
        |br AS (
        |  SELECT doc_id, i,
        |    (((((doc_id // 12) * 5171 + (i * 2) * 97) % 8887)
        |      * (((doc_id // 12) * 5171 + (i * 2) * 97) % 8887)) % 151) + 40
        |    + CASE WHEN (doc_id // 3) % 4 = 2 THEN 25
        |           WHEN (doc_id // 3) % 4 = 3 AND i = 32 THEN 60
        |           ELSE 0 END AS b
        |  FROM ids CROSS JOIN (SELECT unnest(range(0, 65)) AS i)),
        |bits AS (
        |  SELECT a.doc_id, a.i AS idx,
        |         CASE WHEN b.b > a.b THEN 1 ELSE 0 END AS bit
        |  FROM br a JOIN br b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  WHERE a.i < 64),
        |bands AS (
        |  SELECT doc_id, idx // 16 AS band,
        |         CAST(sum(bit << (idx % 16)) AS BIGINT) AS bucket
        |  FROM bits GROUP BY doc_id, band),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM bands a JOIN bands b ON a.band = b.band
        |    AND a.bucket = b.bucket AND b.doc_id > a.doc_id),
        |ham AS (
        |  SELECT c.d1, c.d2,
        |    CAST(sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS BIGINT)
        |      AS hamming
        |  FROM cand c
        |  JOIN bits x ON x.doc_id = c.d1
        |  JOIN bits y ON y.doc_id = c.d2 AND y.idx = x.idx
        |  GROUP BY c.d1, c.d2)
        |SELECT d1, d2, hamming FROM ham WHERE hamming <= 3
        |""".stripMargin) { (s, dir) =>
      import s.implicits._
      val sig = table(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") % 3 === 2).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            // SAMPLE-THEN-DECODE: only the 65 sampled frames touch the
            // BMP reader (decode cost ∝ samples, not clip length);
            // bit-identical to the decode-everything path by
            // construction, pinned in VideoDedupSpec
            val avi = Multimodal.VideoDupSynth.avi(id)
            (id, Multimodal.VideoDupSynth.fingerprintSampled(avi, id))
          }
        }.toDF("doc_id", "h")
      bandedPairs(sig)
    }
  )
}
