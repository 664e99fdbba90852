package graft.operators

import graft._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 extension wave: corpus-hygiene operators that finish the
  * document-dedup story — exact repeated-SUBSTRING detection (the
  * suffix-array-style step that document- and passage-level dedup both
  * miss) and weighted deterministic sampling.
  *
  * Reference scope: the reference has no analytics surface beyond mirror
  * SELECTs (/root/reference/README.md:85-134); these are LLM-pipeline
  * extensions over the driver corpus, per the §2-B extension rows.
  */
/** The substring-dedup building blocks, shared by the two batch queries
  * (q_dedup_substring report, q_dedup_substring_clean) and the
  * stream-maintained variant
  * ([[graft.streaming.IncrementalSubstringDedup]]) — one definition of
  * "gram", "first occurrence", and "span report", so the three surfaces
  * cannot drift.
  */
object SubstringDedup {
  /** Window length in tokens: a repeat shorter than K is not a dup. */
  val K = 8

  /** (doc_id, w): whitespace-tokenized documents. */
  def tokenize(raw: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    raw.select(col("doc_id"), split(trim(col("text")), " ").as("w"))

  /** (doc_id, pos, g, enc): sliding K-grams with the encoded occurrence.
    * The occurrence is ONE long (doc_id·2²⁴ + pos) instead of a struct:
    * Spark's HashAggregate only takes mutable primitive buffers, so a
    * struct min silently degrades to SortAggregate — an external sort
    * of the full gram table, the dominant intermediate at corpus scale
    * (PlanAuditSpec gates the regression). The encoding is
    * order-faithful for pos < 2²⁴ (a 16M-token document) and
    * 0 ≤ doc_id < 2³⁹; both bounds sit far above any real corpus row —
    * and are ENFORCED per doc below, because a violated bound would
    * corrupt keep-first ordering silently (wrong dedup, no error) at
    * exactly the scales this targets. One `when` per document (not per
    * gram): the guarded `w` feeds the explode, so pruning can't drop it.
    */
  def gramsEnc(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.filter(size(col("w")) >= K)
      .select(col("doc_id"),
        when(col("doc_id").between(0L, (1L << 39) - 1) &&
            size(col("w")).cast("long") - K < (1L << 24), col("w"))
          .otherwise(raise_error(concat(
            lit("SubstringDedup.gramsEnc: occurrence-encoding bound violated "),
            lit("(need 0 <= doc_id < 2^39 and < 16M tokens): doc_id="),
            col("doc_id").cast("string"), lit(" n_tokens="),
            size(col("w")).cast("string")))).as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(w) - $K)," +
          s" i -> array_join(slice(w, i + 1, $K), ' '))"))
        .as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), col("g"),
        (col("doc_id") * lit(1L << 24) + col("pos")).as("enc"))

  /** Duplicate-gram occurrences → the per-doc span report
    * (doc_id, n_tokens, n_spans, dup_tokens, dup_ratio). Gaps-and-islands
    * merge of overlapping [s, e] into maximal spans; windows partition
    * by doc_id over DUP rows only (≤ doc length, never corpus-sized).
    */
  def spanReport(docs: org.apache.spark.sql.DataFrame,
      dups: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wPrev = Window.partitionBy("doc_id").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, 0)
    val spans = dups
      .withColumn("pm", max(col("e")).over(wPrev))
      .withColumn("nw",
        when(col("pm").isNull || col("s") > col("pm"), 1L).otherwise(0L))
      .withColumn("isl", sum(col("nw")).over(wRun))
      .groupBy("doc_id", "isl")
      .agg(min(col("s")).as("ss"), max(col("e")).as("ee"))
    val agg = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("ee") - col("ss") + 1).cast("long").as("dup_tokens"))
    docs.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) /
          col("n_tokens").cast("double"), 6).as("dup_ratio"))
  }

  /** Global duplicate-gram intervals: every occurrence that is not the
    * corpus-wide (doc_id, pos)-lexicographic first of its gram. The
    * HAVING count >= 2 shrinks the join-back side to actually-duplicated
    * grams. */
  def dupIntervals(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val withEnc = gramsEnc(docs)
    val firsts = withEnc.groupBy("g")
      .agg(min(col("enc")).as("fe"), count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("g", "fe")
    withEnc.join(firsts, "g")
      .filter(col("enc") =!= col("fe"))
      .select(col("doc_id"), col("pos").as("s"), (col("pos") + K - 1).as("e"))
  }

  /** The one-call batch report over raw (doc_id, text) rows. */
  def report(raw: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val docs = tokenize(raw)
    spanReport(docs, dupIntervals(docs))
  }

  /** MAXIMAL duplicated intervals with their TRUE lengths — the
    * Lee-et-al. "duplicate substrings ≥ L tokens" contract
    * (suffix-array semantics under the standard every-K-window
    * relaxation): a substring is duplicated iff EVERY length-K window
    * of it is a duplicated gram, so maximal duplicated substrings are
    * maximal runs of CONSECUTIVE duplicated gram starts, token length
    * = run + K − 1. This differs from [[spanReport]]'s islands, which
    * merge merely-OVERLAPPING grams and so measure covered tokens,
    * not substring length: starts {p, p+3} are one 11-token island
    * but two 8-token maximal substrings (position p+1's window is NOT
    * duplicated, so no 9-token substring through it repeats).
    * Emits (doc_id, span_start, span_len); windows partition by
    * doc_id over DUP rows only — ≤ doc length, never corpus-sized. */
  def maximalRuns(dups: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("s")
    dups
      // consecutive starts share (s − row_number): the classic
      // gaps-and-islands key for stride-1 runs
      .withColumn("grp", col("s") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min(col("s")).cast("long").as("span_start"),
        (count(lit(1)) + (K - 1)).cast("long").as("span_len"))
      .select("doc_id", "span_start", "span_len")
  }
}

object Coverage15 {

  private def subDocs(s: org.apache.spark.sql.SparkSession, dir: String) =
    SubstringDedup.tokenize(table(s, dir, "documents"))

  /** The shared oracle prefix (docs → grams → firsts → dups). */
  private val subDupsSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      |grams AS (
      |  SELECT doc_id, i AS pos, array_to_string(w[(i+1):(i+8)], ' ') AS g
      |  FROM docs, unnest(range(len(w) - 7)) AS t(i)
      |  WHERE len(w) >= 8),
      |firsts AS (
      |  SELECT g, min(ROW(doc_id, pos)) AS f
      |  FROM grams GROUP BY g HAVING count(*) >= 2),
      |dups AS (
      |  SELECT gr.doc_id, gr.pos AS s, gr.pos + 7 AS e
      |  FROM grams gr JOIN firsts f USING (g)
      |  WHERE ROW(gr.doc_id, gr.pos) <> f.f),
      |""".stripMargin

  val defs: Seq[QDef] = Seq(

    // ---- exact substring dedup (sliding 8-gram spans, keep-first) ------
    // The dedup layer BETWEEN exact-document and fixed-passage dedup:
    // find every maximal token span whose 8-gram content occurred
    // earlier in the corpus (global (doc_id, pos) order) and measure
    // what a keep-first-occurrence substring dedup would remove per
    // document. Unlike q_dedup_passages (fixed 8-word segmentation,
    // removes ALL occurrences of frequent segments), this slides the
    // window by 1 token — so repeats are caught at ANY alignment — and
    // keeps the first occurrence, the suffix-array dedup contract
    // (Lee et al. 2022's ExactSubstr, re-expressed relationally: a
    // suffix array is infeasible to build distributed-shared, but
    // "some ≥8-token repeat covers this position" is equivalent to
    // "some duplicated 8-gram covers it", and 8-grams are a keyed
    // aggregation).
    //
    // Scale shape: one shuffle on the gram string (exact — a 64-bit
    // hash key collides inside 100 TB's ~2^40 distinct grams; cf.
    // q_decontaminate's note), where min(struct(doc_id, pos)) and
    // count partial-aggregate map-side; only grams with count ≥ 2
    // (heavy-tailed minority) join back. Span assembly is per-doc
    // windows over DUPLICATE grams only — bounded by doc length, never
    // corpus-sized. Output is a per-doc report (counts + ratio);
    // reassembling cleaned text is q_dedup_passages' demonstrated move.
    QDef("q_dedup_substring",
      subDupsSql +
      """ord1 AS (
        |  SELECT doc_id, s, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY s
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM dups),
        |isl AS (
        |  SELECT doc_id, s, e,
        |    sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY s) AS isl
        |  FROM ord1),
        |spans AS (
        |  SELECT doc_id, isl, min(s) AS ss, max(e) AS ee
        |  FROM isl GROUP BY doc_id, isl),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(sum(ee - ss + 1) AS BIGINT) AS dup_tokens
        |  FROM spans GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
        |  coalesce(a.n_spans, 0) AS n_spans,
        |  coalesce(a.dup_tokens, 0) AS dup_tokens,
        |  round(coalesce(a.dup_tokens, 0) / CAST(len(d.w) AS DOUBLE), 6) AS dup_ratio
        |FROM docs d LEFT JOIN agg a USING (doc_id)
        |""".stripMargin) { (s, dir) =>
      val docs = subDocs(s, dir)
      SubstringDedup.spanReport(docs, SubstringDedup.dupIntervals(docs))
    },

    // ---- substring dedup, MAXIMAL intervals (suffix-array semantics) ---
    // q_dedup_substring's islands measure covered tokens; this emits
    // the maximal duplicated SUBSTRINGS themselves with true lengths —
    // maximal runs of consecutive duplicated gram starts, len = run+7
    // (SubstringDedup.maximalRuns scaladoc derives why that is the
    // every-K-window relaxation of the Lee-et-al. >=50-token contract;
    // MaximalSubstringSpec pins it against brute-force all-substrings
    // enumeration on a planted corpus). The sf corpus contains spans
    // up to ~90 tokens, so the >=50 class is genuinely exercised.
    QDef("q_dedup_substring_maximal",
      subDupsSql +
      """runs AS (
        |  SELECT doc_id, s,
        |    s - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) AS grp
        |  FROM dups)
        |SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
        |  CAST(count(*) + 7 AS BIGINT) AS span_len
        |FROM runs GROUP BY doc_id, grp
        |""".stripMargin) { (s, dir) =>
      SubstringDedup.maximalRuns(
        SubstringDedup.dupIntervals(subDocs(s, dir)))
    },

    // ---- substring dedup, applied (cleaned corpus) ---------------------
    // The END PRODUCT of q_dedup_substring's report: every token covered
    // by a duplicated-gram interval is dropped (the first occurrence,
    // never charged, survives verbatim elsewhere), survivors reassemble
    // in order — what a keep-first exact-substring dedup actually ships
    // to training. Scale shape: the token table is corpus-sized but the
    // anti join probes the SMALL duplicate-interval side (hashed on
    // doc_id, range predicate inside the build), and reassembly sorts
    // each doc's own surviving tokens (array_sort over one row's list),
    // never a data-sized window.
    QDef("q_dedup_substring_clean",
      subDupsSql +
      """toks AS (
        |  SELECT doc_id, i - 1 AS idx, w[i] AS tok
        |  FROM docs, unnest(generate_series(1, len(w))) AS t(i)),
        |kept AS (
        |  SELECT t.doc_id, t.idx, t.tok
        |  FROM toks t
        |  WHERE NOT EXISTS (SELECT 1 FROM dups d
        |                    WHERE d.doc_id = t.doc_id
        |                      AND t.idx BETWEEN d.s AND d.e)),
        |clean AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text,
        |    CAST(count(*) AS BIGINT) AS kept_tokens
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(c.clean_text, '') AS clean_text,
        |  coalesce(c.kept_tokens, 0) AS kept_tokens
        |FROM docs d LEFT JOIN clean c USING (doc_id)
        |""".stripMargin) { (s, dir) =>
      val docs = subDocs(s, dir)
      val dups = SubstringDedup.dupIntervals(docs)
      val toks = docs.select(col("doc_id"),
        posexplode(col("w")).as(Seq("idx", "tok")))
      val kept = toks.join(dups,
        toks("doc_id") === dups("doc_id") &&
          col("idx").between(col("s"), col("e")), "left_anti")
      val clean = kept.groupBy("doc_id")
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(idx, tok))), x -> x.tok)"),
          " ").as("clean_text"),
          count(lit(1)).as("kept_tokens"))
      docs.select("doc_id").join(clean, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
    },

    // ---- weighted deterministic sample (Efraimidis–Spirakis top-k) -----
    // Weighted sampling WITHOUT replacement as one top-k: each doc gets
    // key ln(u)/w (order-equivalent to the A-ES u^(1/w)) with u drawn
    // NOT from a seeded RNG but from the doc's own md5 — the
    // q_sample_stratified_det lesson taken to weighted sampling: per-row
    // randoms shift with partitioning, a key-hash is the same on any
    // cluster and any engine, which is what makes a SAMPLING operator
    // oracle-checkable at all. Weight = n_chars: longer docs
    // proportionally likelier, the mixture-building knob.
    //
    // Scale shape: the keying is a stateless per-row projection; the
    // top-100 is TakeOrderedAndProject (per-partition heaps + a k-row
    // driver merge) — a weighted sample of ANY corpus costs one scan
    // and no shuffle, where the textbook sequential reservoir is
    // unparallelizable. u is exact integer arithmetic ((h+1)/2^24 from
    // a fixed-width hex prefix), so both engines feed libm's ln the
    // SAME double; keys are ~2^-24 apart, far beyond the 1-ulp libm
    // wobble the repo's round-to-6 convention already absorbs.
    QDef("q_sample_weighted_det",
      """WITH keyed AS (
        |  SELECT doc_id, n_chars,
        |    ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) + 1)
        |       / 16777217.0)
        |      / CAST(greatest(n_chars, 1) AS DOUBLE) AS k
        |  FROM documents)
        |SELECT doc_id, n_chars, round(k, 9) AS priority,
        |  CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS BIGINT) AS pick_rank
        |FROM keyed ORDER BY k DESC, doc_id LIMIT 100
        |""".stripMargin) { (s, dir) =>
      val keyed = table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          (log((conv(substring(md5(col("doc_id").cast("string").cast("binary")),
            1, 6), 16, 10).cast("long") + 1) / 16777217.0)
            / greatest(col("n_chars"), lit(1)).cast("double")).as("k"))
      keyed.orderBy(col("k").desc, col("doc_id")).limit(100)
        .withColumn("pick_rank",
          row_number().over(Window.orderBy(col("k").desc, col("doc_id")))
            .cast("long"))
        .select(col("doc_id"), col("n_chars"),
          round(col("k"), 9).as("priority"), col("pick_rank"))
    },

    // ---- BM25 ranked retrieval ----------------------------------------
    // Keyword search over the corpus — the retrieval dual of the
    // similarity family: Okapi BM25 (k1 = 1.2, b = 0.75) for a fixed
    // 3-term query, top-20 by score. Every BM25 ingredient maps to a
    // bounded relational artifact: corpus stats (N, avgdl) are a 1-row
    // broadcast, per-term document frequencies a ≤|Q|-row broadcast,
    // term frequencies only exist for docs CONTAINING a query term —
    // the explode is filtered to the query vocabulary before any
    // shuffle, so the data-sized intermediate is |matching postings|,
    // the inverted-index working set, not the corpus. Top-20 is
    // TakeOrderedAndProject. Score parity: each term's contribution is
    // deterministic double arithmetic (identical operand order both
    // engines); the per-doc SUM is decimal-cast so addition is
    // order-independent, and the RANKING uses the exact decimal —
    // cross-engine-identical — not the rounded display value.
    QDef("q_bm25",
      """WITH q(term) AS (VALUES ('hash'), ('join'), ('filter')),
        |docs AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |dl AS (SELECT doc_id, len(w) AS dl FROM docs),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |tok AS (SELECT doc_id, unnest(w) AS term FROM docs),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok JOIN q USING (term) GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |score AS (
        |  SELECT tf.doc_id,
        |    sum(CAST(
        |      ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
        |        * tf.tf * (1.2 + 1)
        |        / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
        |      AS DECIMAL(38,10))) AS sc
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
        |  GROUP BY tf.doc_id)
        |SELECT doc_id, round(CAST(CAST(sc AS STRING) AS DOUBLE), 6) AS bm25,
        |  CAST(row_number() OVER (ORDER BY sc DESC, doc_id) AS BIGINT) AS rnk
        |FROM score ORDER BY sc DESC, doc_id LIMIT 20
        |""".stripMargin) { (s, dir) =>
      val terms = Seq("hash", "join", "filter")
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      val dl = docs.select(col("doc_id"), size(col("w")).as("dl"))
      val stats = dl.agg(count(lit(1)).cast("long").as("n"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val postings = docs
        .select(col("doc_id"), explode(col("w")).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .join(dl, "doc_id")
      Bm25.rank(postings, stats, 20)
    },

    // ---- temperature-rebalanced language sampling (p^α, α = 0.3) -------
    // Multilingual mixture rebalancing: where q_sample_mixture applies
    // FIXED per-language rates, this derives them from the data — the
    // UNIMAX/mT5 move: sample language l with probability ∝ p_l^0.3
    // (temperature flattening, so head languages shrink and tail
    // languages keep their data), targeting a 20% overall draw,
    // acceptance capped at 1. Selection is the engine's deterministic
    // coin: a doc's md5-derived 24-bit integer against its language's
    // threshold — reproducible on any partitioning, any engine.
    //
    // Scale shape: rates derive from a per-language count (one
    // partial-agg over ≤ dozens of groups) and broadcast back; the
    // sample itself is one codegen'd scan-side filter — no data-sized
    // shuffle at any corpus size. Parity: the ≤|langs|-term weight
    // normalizer sums DECIMAL (order-independent); thresholds are then
    // identical doubles, and a coin flip only disagrees if pow() lands
    // within one ulp of an exact integer threshold — far below the
    // corpus's 2⁻²⁴ coin quantum.
    QDef("q_sample_temperature",
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cl FROM documents
        |           WHERE lang IS NOT NULL GROUP BY lang),
        |tot AS (SELECT CAST(sum(cl) AS BIGINT) AS n FROM c),
        |wts AS (SELECT lang, cl, n, pow(cl / CAST(n AS DOUBLE), 0.3) AS w
        |        FROM c CROSS JOIN tot),
        |sw AS (SELECT CAST(CAST(sum(CAST(w AS DECIMAL(38,10))) AS STRING) AS DOUBLE)
        |         AS sumw FROM wts),
        |rates AS (
        |  SELECT lang, least(1.0, 0.2 * n * (w / sumw) / cl) * 16777216.0 AS t
        |  FROM wts CROSS JOIN sw)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN rates r USING (lang)
        |WHERE d.lang IS NOT NULL
        |  AND CAST(('0x' || substring(md5('temp:' || d.lang || ':'
        |        || CAST(d.doc_id AS VARCHAR)), 1, 6)) AS BIGINT) < r.t
        |""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val c = docs.filter(col("lang").isNotNull)
        .groupBy("lang").agg(count(lit(1)).as("cl"))
      val tot = c.agg(sum(col("cl")).cast("long").as("n"))
      val wts = c.crossJoin(broadcast(tot))
        .withColumn("w", pow(col("cl") / col("n").cast("double"), 0.3))
      val sw = wts.agg(sumExact(col("w")).as("sumw"))
      val rates = wts.crossJoin(broadcast(sw))
        .select(col("lang"),
          (least(lit(1.0), lit(0.2) * col("n") * (col("w") / col("sumw"))
            / col("cl")) * 16777216.0).as("t"))
      docs.filter(col("lang").isNotNull)
        .join(broadcast(rates), "lang")
        .filter(conv(substring(md5(concat_ws(":", lit("temp"), col("lang"),
          col("doc_id").cast("string")).cast("binary")), 1, 6), 16, 10)
          .cast("long") < col("t"))
        .select("doc_id", "lang")
    },

    // ---- exact-phrase search ------------------------------------------
    // The retrieval feature BM25 alone lacks: docs ranked by exact
    // occurrences of the token phrase "hash join" (adjacent, in order).
    // This scan form is the ORACLE twin of the positional-index form
    // ([[graft.streaming.IncrementalPostings.phraseSearch]] — per-doc
    // intersections of shifted position lists, spec-pinned equal): one
    // per-row expression over the token array (no explode, no shuffle),
    // then a TakeOrderedAndProject top-20. The per-row pass is the
    // compiled `phrase_count` expression — the HOF filter-over-sequence
    // form interpreted its lambda per POSITION and cost 6.5× at sf0.1
    // (the simhash/rollhash lesson; PhraseCountSpec pins equality).
    QDef("q_phrase_search",
      """WITH docs AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |hits AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS occurrences
        |  FROM docs, unnest(range(len(w) - 1)) AS t(i)
        |  WHERE w[i+1] = 'hash' AND w[i+2] = 'join'
        |  GROUP BY doc_id)
        |SELECT doc_id, occurrences,
        |  CAST(row_number() OVER (ORDER BY occurrences DESC, doc_id) AS BIGINT) AS rnk
        |FROM hits ORDER BY occurrences DESC, doc_id LIMIT 20
        |""".stripMargin) { (s, dir) =>
      graft.functions.PhraseExpressions.register(s)
      SubstringDedup.tokenize(table(s, dir, "documents"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"),
          expr("phrase_count(w, 'hash join')").as("occurrences"))
        .filter(col("occurrences") > 0)
        .orderBy(col("occurrences").desc, col("doc_id")).limit(20)
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("occurrences").desc, col("doc_id"))).cast("long"))
    },

    // ---- last-touch attribution ---------------------------------------
    // The conversion-analytics staple the funnel/transition family
    // doesn't cover: each purchase is credited to the user's most
    // recent PRECEDING non-purchase event (last-touch), with purchases
    // preceded by nothing crediting "(none)". The carry is
    // last(...IGNORE NULLS) over a per-user frame ending at -1 — the
    // q_locf forward-fill move with a conditional payload — so the
    // window is bounded by one user's events, never corpus-wide;
    // revenue accumulates in exact decimal (order-independent).
    QDef("q_attribution",
      """WITH ordered AS (
        |  SELECT user_id, event_id, event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, '(none)') AS touch,
        |  CAST(count(*) AS BIGINT) AS purchases,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(38,10))) AS STRING) AS DOUBLE)
        |    AS revenue
        |FROM ordered WHERE event_type = 'purchase'
        |GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      table(s, dir, "events")
        .select(col("event_type"), col("value"),
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w).as("touch"))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("(none)")).as("touch"))
        .agg(count(lit(1)).as("purchases"), sumExact(col("value")).as("revenue"))
    })
}
