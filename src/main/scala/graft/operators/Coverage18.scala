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

  /** The video fingerprint/band/hamming oracle CTE body, shared by
    * q_dedup_video and q_dedup_video_survivors (one definition so the
    * pair set cannot drift between the report and its consumer). */
  private val videoPairCtes: String =
    """ids AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
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
      |  GROUP BY c.d1, c.d2)""".stripMargin

  /** The Spark-side video fingerprint table (doc_id, h, n_frames) —
    * sample-then-decode through the real AVI walk, frame count from
    * the real `avih` header. */
  private def videoSigs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") % 3 === 2).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val avi = Multimodal.VideoDupSynth.avi(id)
          val m = Multimodal.MediaRecord(id, "video", avi)
          (id, Multimodal.VideoDupSynth.fingerprintSampled(avi, id),
            Multimodal.AviDecoder.meta(m).n_frames.toLong)
        }
      }.toDF("doc_id", "h", "n_frames")
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
      s"""WITH $videoPairCtes
         |SELECT d1, d2, hamming FROM ham WHERE hamming <= 3
         |""".stripMargin) { (s, dir) =>
      // SAMPLE-THEN-DECODE: only the 65 sampled frames touch the BMP
      // reader (decode cost ∝ samples, not clip length); bit-identical
      // to the decode-everything path, pinned in VideoDedupSpec
      bandedPairs(videoSigs(s, dir).select("doc_id", "h"))
    },

    // ---- video dedup survivors: keep the full-rate copy ------------------
    // The APPLY half of the video family: connected components over
    // the verified pair set (the shared pointer-doubling CC), survivor
    // per cluster = MOST FRAMES, lowest id on ties — so a 2× speed-up
    // copy (65 frames) never survives its 129-frame original: the
    // curation rule "keep the full-rate master" stated as an argmax.
    // Frame counts come from the REAL avih header, not the synth
    // formula. Oracle: the same pair CTEs + a reachability recursion +
    // one window rank (the q_dedup_survivors pattern).
    QDef("q_dedup_video_survivors",
      s"""WITH RECURSIVE $videoPairCtes,
         |dup AS (SELECT d1, d2 FROM ham WHERE hamming <= 3),
         |edges AS (SELECT d1 AS a, d2 AS b FROM dup
         |          UNION SELECT d2, d1 FROM dup),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.id),
         |cc AS (SELECT id AS doc_id, min(r) AS canonical FROM reach
         |       GROUP BY id),
         |nf AS (SELECT doc_id,
         |         CAST(CASE WHEN (doc_id // 3) % 4 = 1 THEN 65 ELSE 129 END
         |           AS BIGINT) AS n_frames
         |       FROM ids),
         |j AS (SELECT cc.doc_id, cc.canonical, nf.n_frames
         |      FROM cc JOIN nf USING (doc_id)),
         |rk AS (SELECT canonical, doc_id, n_frames,
         |         row_number() OVER (PARTITION BY canonical
         |           ORDER BY n_frames DESC, doc_id) AS rk,
         |         CAST(count(*) OVER (PARTITION BY canonical) AS BIGINT)
         |           AS n_docs
         |       FROM j)
         |SELECT canonical, doc_id AS keep_id, n_frames, n_docs
         |FROM rk WHERE rk = 1
         |""".stripMargin) { (s, dir) =>
      graft.functions.TopKBy.register(s)
      val sigs = videoSigs(s, dir).cache()
      val pairs = bandedPairs(sigs.select("doc_id", "h"))
      val cc = DedupOps.connectedComponents(pairs.select("d1", "d2"))
      cc.join(sigs.select("doc_id", "n_frames"), "doc_id")
        .groupBy("canonical")
        .agg(expr("argmax_by(struct(doc_id, n_frames), " +
          "CAST(n_frames AS DOUBLE), doc_id)").as("best"),
          count(lit(1)).as("n_docs"))
        .select(col("canonical"), col("best.doc_id").as("keep_id"),
          col("best.n_frames").as("n_frames"), col("n_docs"))
    },

    // ---- byte-fallback tokenization accounting ---------------------------
    // What a production tokenizer bills for the words the trained
    // vocab does NOT cover: numbers, punctuation-bearing tokens and
    // any word outside the merge table fall back to BYTE tokens (one
    // per character — the GPT-2 byte-level floor). Same plan shape as
    // q_bpe_tokenize with the inner join turned LEFT: the broadcast
    // map answers trainable words, coalesce(length) answers the rest,
    // and the per-doc split (BPE vs byte mass) is the vocab-coverage
    // cost signal a tokenizer rollout reads. One explode + broadcast
    // join + per-doc hash agg — corpus touched once.
    QDef("q_bpe_tokenize_bytes", {
      import Coverage17.{trainCte, BpeN}
      s"""WITH $trainCte,
         |bmap AS (
         |  SELECT replace(replace(w, '(', ''), ')', '') AS word,
         |    CAST(len(string_split(substr(w, 2, length(w) - 2), ')(')) AS BIGINT)
         |      AS n_toks
         |  FROM v$BpeN),
         |ww AS (
         |  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS word
         |  FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(CASE WHEN m.n_toks IS NOT NULL THEN m.n_toks
         |                ELSE 0 END) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(CASE WHEN m.n_toks IS NULL THEN length(word)
         |                ELSE 0 END) AS BIGINT) AS n_byte_tokens,
         |  CAST(sum(coalesce(m.n_toks, length(word))) AS BIGINT) AS n_tokens
         |FROM ww LEFT JOIN bmap m USING (word)
         |GROUP BY doc_id ORDER BY doc_id
         |""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      val (_, vocab) = Coverage17.trainBpe(s, dir)
      val bmap = vocab.select(
        regexp_replace(col("w"), "[()]", "").as("word"),
        expr("size(split(substring(w, 2, length(w) - 2), '\\\\)\\\\('))")
          .cast("long").as("n_toks"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), " ")).as("word"))
        .join(broadcast(bmap), Seq("word"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_words"),
          sum(coalesce(col("n_toks"), lit(0L))).cast("long")
            .as("n_bpe_tokens"),
          sum(when(col("n_toks").isNull, length(col("word")).cast("long"))
            .otherwise(0L)).cast("long").as("n_byte_tokens"),
          sum(coalesce(col("n_toks"), length(col("word")).cast("long")))
            .cast("long").as("n_tokens"))
        .orderBy("doc_id")
    },

    // ---- per-source distribution drift: Kolmogorov–Smirnov ---------------
    // The curation drift alarm in distribution form: for each source,
    // the KS distance between ITS doc-length distribution and the
    // corpus's — sup over the (bounded, ≤ distinct-lengths) evaluation
    // grid of |F_src − F_corpus|. A source whose scraper broke or whose
    // content shifted shows up as a D spike long before means move.
    // Plan shape: one (source, len) histogram agg, cumulative sums
    // over the BOUNDED length grid (the engine's bounded-domain-window
    // posture — the window is over distinct lengths × sources, never
    // docs), one broadcast of the ≤grid-sized corpus CDF, one max agg
    // per source. Scale-free in the corpus: everything after the
    // histogram is grid-sized.
    QDef("q_ks_drift",
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS len
        |  FROM documents),
        |h AS (SELECT source, len, CAST(count(*) AS BIGINT) AS c
        |      FROM d GROUP BY source, len),
        |grid AS (SELECT DISTINCT len FROM h),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h
        |       GROUP BY source),
        |ntot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        |fsrc AS (
        |  SELECT s.source, g.len,
        |    CAST(coalesce(sum(h.c) OVER (PARTITION BY s.source
        |      ORDER BY g.len
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
        |      AS BIGINT) AS cum
        |  FROM (SELECT source FROM ns) s
        |  CROSS JOIN grid g
        |  LEFT JOIN h ON h.source = s.source AND h.len = g.len),
        |fall AS (
        |  SELECT len,
        |    CAST(sum(sum(c)) OVER (ORDER BY len
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM h GROUP BY len)
        |SELECT f.source,
        |  round(max(abs(CAST(f.cum AS DOUBLE) / ns.n
        |    - CAST(a.cum AS DOUBLE) / ntot.n)), 6) + 0.0 AS ks
        |FROM fsrc f
        |JOIN ns ON ns.source = f.source
        |JOIN fall a ON a.len = f.len
        |CROSS JOIN ntot
        |GROUP BY f.source, ns.n, ntot.n
        |ORDER BY f.source
        |""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // ONE corpus-sized exchange (the histogram agg); every support
      // table below derives from bounded h, so their exchanges carry
      // grid-sized rows
      val d = table(s, dir, "documents").select(col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("len"))
      val h = d.groupBy("source", "len")
        .agg(count(lit(1)).cast("long").as("c"))
      val grid = h.select("len").distinct()
      val ns = h.groupBy("source").agg(sum(col("c")).cast("long").as("n"))
      val nTot = h.agg(sum(col("c")).cast("long").as("ntot"))
      val srcs = ns.select("source")
      // per-source CDF over the bounded grid (window over ≤ |grid|
      // rows per source — never doc-sized)
      val wCum = Window.partitionBy("source").orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fsrc = srcs.crossJoin(grid)
        .join(h, Seq("source", "len"), "left")
        .select(col("source"), col("len"),
          coalesce(sum(col("c")).over(wCum), lit(0L)).cast("long").as("cum"))
      val wAll = Window.orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fall = h.groupBy("len").agg(sum(col("c")).as("lc"))
        .select(col("len"),
          sum(col("lc")).over(wAll).cast("long").as("cum_all"))
      fsrc.join(broadcast(ns), "source")
        .join(broadcast(fall), "len")
        .crossJoin(broadcast(nTot))
        .groupBy("source")
        .agg((round(max(abs(col("cum").cast("double") / col("n")
          - col("cum_all").cast("double") / col("ntot"))), 6) + lit(0.0))
          .as("ks"))
        .orderBy("source")
    }
  )
}
