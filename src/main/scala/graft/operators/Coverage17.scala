package graft.operators

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 extension batch 1: the full BPE tokenizer-training loop —
  * `q_bpe_merge` (Coverage7) computes ONE merge step; a real pipeline
  * trains N merges iteratively and then APPLIES the learned table.
  * The loop rides the k-core fixpoint discipline (Coverage16:
  * localCheckpoint per round, released in-loop, bounded rounds).
  *
  * Reference scope: SURVEY.md §2-B LLM-pipeline operator family
  * (tokenization / text analysis).
  */
object Coverage17 {

  /** Number of trained merges. Small enough for the unrolled DuckDB
    * CTE oracle (the q_pagerank move: the oracle recomputes the exact
    * loop at fixed N), large enough that later rounds merge MERGED
    * symbols (step 6 on the gate corpus merges 'm'+'er'). */
  val BpeN = 8

  /** BPE state is a string per word: every symbol wrapped as
    * `(sym)`, e.g. "hello" → "(h)(e)(l)(l)(o)". The wrapping makes
    * one literal `replace(w, '(a)(b)', '(ab)')` per merge step apply
    * the merge GREEDILY LEFT-TO-RIGHT over non-overlapping
    * occurrences — the BPE application rule — with identical
    * semantics in Spark and DuckDB (both `replace`s scan leftmost and
    * continue after the replacement), and no false boundary matches:
    * a pattern `(e)(l)` cannot match inside "(e)(ll)" because every
    * symbol carries its own closing paren. Symbols stay in [a-z]+ by
    * the word filter, so the delimiters never collide with content. */
  private def wrapped(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), " ")).as("w0"))
      .filter(col("w0").rlike("^[a-z]{2,}$"))
      .groupBy("w0").agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("w0"), "(.)", "($1)").as("w"), col("freq"))

  private def symsCol: org.apache.spark.sql.Column =
    split(expr("substring(w, 2, length(w) - 2)"), "\\)\\(")

  /** Train BpeN merges over the word-frequency table (NOT the corpus:
    * the vocabulary is Heaps-law bounded regardless of corpus size, so
    * each round's pair count and merge rewrite are vocab-sized — the
    * property that makes corpus-scale BPE training feasible; the
    * corpus is touched exactly once, for the frequency aggregation).
    * Per round: one vocab-sized pair explode + hash agg + top-1
    * collect (the fixpoint-control pattern — ONE row to the driver per
    * round), then a literal-replace projection re-checkpointed via
    * loopInput with the superseded round released in-loop (the k-core
    * discipline, Coverage16.scala). Returns the merge table and the
    * final tokenized vocabulary. */
  private[operators] def trainBpe(s: SparkSession,
      dir: String): (Seq[(Long, String, String, Long)], DataFrame) =
    BpeMemo.get(s, dir) {
      import s.implicits._
      // Round-14 (guide §1.2): the corpus is touched exactly once (the
      // word-frequency aggregation); the vocabulary it produces is
      // Heaps-law bounded regardless of corpus size — the property
      // that already justified broadcasting it to the apply/tokenize
      // stages — so the BpeN-round merge loop runs DRIVER-SIDE on the
      // collected vocab instead of paying ~2 Spark jobs per round
      // (pair agg + top-1 collect + rewrite checkpoint; ~32 jobs at
      // BpeN = 15) over a vocab-sized frame. Arithmetic is identical:
      // adjacent-pair counts are exact Long sums of word freqs, the
      // per-round winner orders by (cnt DESC, p ASC) — binary string
      // order, the symbols are pure ASCII — and the rewrite replaces
      // every occurrence left to right, as `replace` did.
      var vocab: Array[(String, Long)] = wrapped(s, dir)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val merges =
        scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
      (1 to BpeN).foreach { step =>
        val cnt = scala.collection.mutable.HashMap.empty[String, Long]
        vocab.foreach { case (w, freq) =>
          val syms = w.substring(1, w.length - 1).split("\\)\\(")
          var i = 0
          while (i < syms.length - 1) {
            val p = syms(i) + "|" + syms(i + 1)
            cnt.update(p, cnt.getOrElse(p, 0L) + freq)
            i += 1
          }
        }
        if (cnt.nonEmpty) {
          val (p, c) = cnt.minBy { case (k, v) => (-v, k) }
          val Array(a, b) = p.split("\\|", 2)
          merges += ((step.toLong, a, b, c))
          vocab = vocab.map { case (w, freq) =>
            (w.replace(s"($a)($b)", s"($a$b)"), freq)
          }
        }
      }
      (merges.toSeq, vocab.toSeq.toDF("w", "freq"))
    }

  // ---- shared DuckDB oracle: the unrolled training CTE ----------------
  // One CTE pair (best-pair, merged-vocab) per round — the oracle IS
  // the loop at fixed N, independently recomputed (the q_pagerank
  // move). Pair keys travel as 'a|b' strings so the per-round top-1
  // tiebreak (cnt DESC, p) is one binary string compare in both
  // engines.
  private def pairsOf(v: String): String =
    s"""(SELECT freq, unnest(list_transform(range(1, len(syms)),
       |    i -> syms[i] || '|' || syms[i+1])) AS p
       |  FROM (SELECT freq, string_split(substr(w, 2, length(w) - 2), ')(') AS syms
       |        FROM $v))""".stripMargin

  private[operators] val trainCte: String = {
    val head =
      """words AS (
        |  SELECT w0, count(*) AS freq FROM (
        |    SELECT unnest(string_split(lower(trim(text)), ' ')) AS w0
        |    FROM documents)
        |  WHERE regexp_matches(w0, '^[a-z]{2,}$') GROUP BY w0),
        |v0 AS (SELECT regexp_replace(w0, '(.)', '(\1)', 'g') AS w, freq
        |       FROM words)""".stripMargin
    // v_r LEFT-joins its (0-or-1-row) best-pair so a round with NO
    // mergeable pair left (b_r empty — a tiny corpus exhausting merges
    // before BpeN) is a NO-OP round carrying v_{r-1} forward, exactly
    // like the Spark loop's `if (top.nonEmpty)` guard; a cross join
    // would collapse v_r (and every later round) to zero rows.
    val rounds = (1 to BpeN).map { r =>
      s"""b$r AS (
         |  SELECT p, CAST(sum(freq) AS BIGINT) AS cnt FROM ${pairsOf(s"v${r - 1}")}
         |  GROUP BY p ORDER BY cnt DESC, p LIMIT 1),
         |v$r AS (
         |  SELECT CASE WHEN b.p IS NULL THEN v.w ELSE replace(v.w,
         |      '(' || split_part(b.p, '|', 1) || ')(' || split_part(b.p, '|', 2) || ')',
         |      '(' || replace(b.p, '|', '') || ')') END AS w, v.freq
         |  FROM v${r - 1} v LEFT JOIN b$r b ON TRUE)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** Oracle CTE body (no WITH) shared by q_corpus_prep_redacted /
    * _packed / _tokenized — enrich → redact → alpha-quality quartile →
    * exact dedup → md5-ordered per-source token cumsum (`c`). ONE
    * definition so the flagship forms cannot drift. Assembled by
    * concatenation, not interpolation into a stripMargin template (the
    * round-10 `||` margin-eating gotcha). */
  private lazy val prepBody: String =
    s"enriched AS ($enrichSql),\n" +
    s"red AS (SELECT doc_id, source, text FROM ($redactSql) rr),\n" +
    """m AS (SELECT doc_id, source, text,
      |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
      |      / length(text) AS alpha
      |  FROM red),
      |q AS (SELECT doc_id, source, text FROM m
      |      WHERE alpha > (SELECT quantile_cont(alpha, 0.25) FROM m)),
      |k AS (SELECT min(doc_id) AS doc_id FROM q
      |      GROUP BY md5(lower(trim(text)))),
      |d AS (SELECT q.doc_id, q.source,
      |        CAST(len(string_split_regex(trim(q.text), '\s+')) AS BIGINT)
      |          AS toks,
      |        md5(CAST(q.doc_id AS VARCHAR)) AS ord
      |      FROM q JOIN k USING (doc_id)),
      |c AS (SELECT doc_id, source, toks,
      |        sum(toks) OVER (PARTITION BY source ORDER BY ord, doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM d)""".stripMargin

  private lazy val prepCtes: String = "WITH " + prepBody

  /** Spark side of the prep chain through quality + exact dedup — the
    * deduped survivors WITH their (redacted) text, the splice point
    * every downstream accounting stage (whitespace budget, BPE
    * tokenize) hangs off. */
  private def dedupedPrep(s: SparkSession, dir: String): DataFrame = {
    // round-14 (guide §1.2/§2.4): `m` is localCheckpointed so the
    // enrich + 3-regex redact + alpha-regex chain — the dominant
    // per-row cost — runs ONCE; before, the quantile cut, the
    // dedup-key aggregate, and the survivor probe each re-evaluated
    // the whole subtree (the _redacted plan carried 16 document scans
    // and 60 regexp_replace nodes; now 2 scans / 12).
    val m = redacted(s, dir).select(
      col("doc_id"), col("source"), col("text"),
      (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
        / length(col("text"))).as("alpha"))
      .localCheckpoint()
    val cut = m.agg(expr("percentile(alpha, 0.25)").as("cut"))
    val q = m.crossJoin(broadcast(cut)).filter(col("alpha") > col("cut"))
      .select("doc_id", "source", "text")
    // smallest doc_id per normalized-text group via ONE keyed window
    // (hash keys spread uniformly; group sizes are dup counts) instead
    // of groupBy + semi join-back — same survivor set, one exchange,
    // no second evaluation of q (guide §2.4)
    q.withColumn("_keep_id", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(
          md5(lower(trim(col("text"))).cast("binary")))))
      .filter(col("doc_id") === col("_keep_id"))
      .select("doc_id", "source", "text")
  }

  /** [[dedupedPrep]] through the whitespace-token budget, `cum`
    * carried (the per-source contiguous position of each doc). */
  private def budgetedPrep(s: SparkSession, dir: String): DataFrame = {
    // narrow (3-column, text dropped) checkpoint: PrefixSum's
    // two-phase shape consumes its input twice (bucket totals + probe)
    val d = dedupedPrep(s, dir).select(
      col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      .localCheckpoint()
    graft.plans.PrefixSum.perKey(d, "source",
        md5(col("doc_id").cast("string").cast("binary")), "doc_id",
        col("toks"), "cum")
      .filter(col("cum") - col("toks") < 600)
  }

  /** Unrolled 10-iteration personalized-PageRank oracle — the
    * q_pagerank move with teleport mass confined to the seed node. */
  private lazy val pprOracle: String = {
    val steps = (1 to 10).map { i =>
      s""", p$i AS (
         |  SELECT n.node,
         |    CASE WHEN n.node = s.seed THEN CAST(0.15 AS DOUBLE)
         |         ELSE CAST(0 AS DOUBLE) END
         |      + CAST(0.85 AS DOUBLE)
         |        * coalesce(sum(p.r * w.w), CAST(0 AS DOUBLE)) AS r
         |  FROM nodes n CROSS JOIN seed s
         |  LEFT JOIN w ON w.dst = n.node
         |  LEFT JOIN p${i - 1} p ON p.node = w.src
         |  GROUP BY n.node, s.seed)""".stripMargin
    }.mkString
    s"""WITH nx AS (
       |  SELECT event_type AS src,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
       |  FROM events),
       |edges AS (
       |  SELECT src, dst, count(*) AS c FROM nx WHERE dst IS NOT NULL
       |  GROUP BY src, dst),
       |outd AS (SELECT src, sum(c) AS tot FROM edges GROUP BY src),
       |w AS (SELECT e.src, e.dst, e.c / o.tot AS w
       |      FROM edges e JOIN outd o USING (src)),
       |nodes AS (SELECT DISTINCT event_type AS node FROM events),
       |seed AS (SELECT min(node) AS seed FROM nodes),
       |p0 AS (SELECT node,
       |  CASE WHEN node = s.seed THEN CAST(1.0 AS DOUBLE)
       |       ELSE CAST(0 AS DOUBLE) END AS r
       |  FROM nodes, seed s)$steps
       |SELECT node, round(r, 6) + 0.0 AS ppr FROM p10""".stripMargin
  }

  // ---- PII enrichment + redaction (shared by the two queries below) ----
  // The same deterministic doc_id-keyed enrichment q_pii_flags scans
  // (Coverage16 — the find half); these queries are the APPLY half.
  private val piiEmail = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val piiPhone = "[0-9]{3}-[0-9]{4}-[0-9]{4}"
  private val piiIp = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  private val enrichSql =
    """SELECT doc_id, source,
      |    text ||
      |    CASE WHEN doc_id % 5 = 0
      |      THEN ' contact user' || doc_id || '@example.com now' ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 0
      |      THEN ' call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
      |        || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0
      |      THEN ' host 10.' || doc_id % 256 || '.' || (doc_id * 7) % 256
      |        || '.' || (doc_id * 13) % 256 ELSE '' END AS text
      |  FROM documents""".stripMargin

  private val redactSql =
    s"""SELECT doc_id, source,
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(text,
       |          '$piiEmail', '[EMAIL]', 'g'),
       |        '$piiPhone', '[PHONE]', 'g'),
       |      '$piiIp', '[IP]', 'g') AS text, text AS orig
       |  FROM enriched""".stripMargin

  private def enriched(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"), col("source"),
      concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" call 555-01"),
            lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" host 10."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") * 7) % 256).cast("string"),
            lit("."), ((col("doc_id") * 13) % 256).cast("string")))
          .otherwise(lit(""))).as("text"))

  /** In-place masking: email → phone → IP, in that order (the
    * placeholders carry no digits or '@', so no pass can re-match
    * another's output; identical leftmost-all semantics both engines —
    * the same RE2-compatible subset as the scan). */
  private[graft] def redacted(s: SparkSession, dir: String): DataFrame =
    enriched(s, dir).select(col("doc_id"), col("source"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), piiEmail, "[EMAIL]"),
          piiPhone, "[PHONE]"),
        piiIp, "[IP]").as("text"), col("text").as("orig"))

  val defs: Seq[QDef] = Seq(

    // ---- PII redaction: the APPLY half of the compliance story ----------
    // q_pii_flags finds, takedowns remove whole docs; this masks
    // in place and proves the result clean — per-source mask counts,
    // how many docs changed, and a residual re-scan that must come
    // back ZERO (the find → redact → re-scan-zero loop, pinned
    // end-to-end with the takedown machinery in CompliancePipelineSpec).
    QDef("q_pii_redact",
      // assembled by concatenation, NOT margin interpolation: the
      // enrich/redact sub-SQL contains `||` at line starts, which an
      // outer stripMargin would eat one bar of
      s"WITH enriched AS ($enrichSql),\nr AS ($redactSql)\n" +
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(regexp_extract_all(text, '\\[EMAIL\\]'))) AS BIGINT)
         |    AS masked_emails,
         |  CAST(sum(len(regexp_extract_all(text, '\\[PHONE\\]'))) AS BIGINT)
         |    AS masked_phones,
         |  CAST(sum(len(regexp_extract_all(text, '\\[IP\\]'))) AS BIGINT)
         |    AS masked_ips,
         |  CAST(sum(CASE WHEN text <> orig THEN 1 ELSE 0 END) AS BIGINT)
         |    AS redacted_docs,
         |  CAST(sum(len(regexp_extract_all(text, '$piiEmail'))
         |    + len(regexp_extract_all(text, '$piiPhone'))
         |    + len(regexp_extract_all(text, '$piiIp'))) AS BIGINT)
         |    AS residual_pii,
         |  CAST(sum(length(text)) AS BIGINT) AS redacted_chars
         |FROM r GROUP BY source
         |""".stripMargin) { (s, dir) =>
      redacted(s, dir).groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(regexp_count(col("text"), lit("\\[EMAIL\\]"))).as("masked_emails"),
        sum(regexp_count(col("text"), lit("\\[PHONE\\]"))).as("masked_phones"),
        sum(regexp_count(col("text"), lit("\\[IP\\]"))).as("masked_ips"),
        sum(when(col("text") =!= col("orig"), 1L).otherwise(0L))
          .as("redacted_docs"),
        sum(regexp_count(col("text"), lit(piiEmail)) +
          regexp_count(col("text"), lit(piiPhone)) +
          regexp_count(col("text"), lit(piiIp))).as("residual_pii"),
        sum(length(col("text")).cast("long")).as("redacted_chars"))
    },

    // ---- corpus prep WITH redaction composed in --------------------------
    // q_corpus_prep's quality → exact-dedup → token-budget pipeline
    // with the redaction stage spliced in FRONT — still one declarative
    // plan (Catalyst sees scan → regexp projections → filter → semi-join
    // → PrefixSum at once), which is the point: masking adds zero
    // materialization boundaries and zero extra shuffles to the
    // flagship. Quality and dedup run over the REDACTED text (a doc
    // whose only difference was its PII dedups away; placeholders count
    // as tokens exactly once, both engines).
    QDef("q_corpus_prep_redacted",
      prepCtes +
      "\nSELECT doc_id, source, toks, CAST(cum AS BIGINT) AS cum_tokens" +
      "\nFROM c WHERE cum - toks < 600\n") { (s, dir) =>
      budgetedPrep(s, dir)
        .select(col("doc_id"), col("source"), col("toks"),
          col("cum").as("cum_tokens"))
    },

    // ---- corpus prep packed: the full pipeline into training shape -------
    // The last mile: quality → dedup → redaction → per-source token
    // budget → SEQUENCE PACKING, still ONE declarative plan. The
    // budget keeps each source's md5-ordered PREFIX, so the budget
    // cumsum is already the contiguous lay-end-to-end position of
    // every surviving doc — the pack cut (capacity 128) is pure
    // arithmetic on it, no second prefix pass. Output is the
    // per-(source, pack) ledger a trainer consumes: docs started,
    // token mass, straddle count.
    QDef("q_corpus_prep_packed",
      prepCtes + """,
        |b AS (SELECT source, toks, cum FROM c WHERE cum - toks < 600),
        |p AS (SELECT source, (cum - toks) // 128 AS pack_id, toks,
        |        CASE WHEN (cum - 1) // 128 > (cum - toks) // 128
        |             THEN 1 ELSE 0 END AS straddle
        |      FROM b)
        |SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS toks_sum,
        |  CAST(sum(straddle) AS BIGINT) AS n_straddle
        |FROM p GROUP BY source, pack_id
        |ORDER BY source, pack_id
        |""".stripMargin) { (s, dir) =>
      budgetedPrep(s, dir)
        .select(col("source"),
          expr("(cum - toks) div 128").as("pack_id"), col("toks"),
          when(expr("(cum - 1) div 128") > expr("(cum - toks) div 128"),
            1L).otherwise(0L).as("straddle"))
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("toks")).cast("bigint").as("toks_sum"),
          sum(col("straddle")).cast("bigint").as("n_straddle"))
        .orderBy("source", "pack_id")
    },

    // ---- corpus prep TOKENIZED: the tokenizer spliced into the flagship --
    // The splice PLANS.md's attribution table pre-registered: the
    // budget/pack accounting now runs on TRAINED-BPE token counts of
    // the redacted survivors instead of whitespace tokens — what a
    // real trainer's packing actually bills. The tokenize stage is the
    // q_bpe_tokenize shape hung off the dedup survivors: word explode
    // → BROADCAST join against the Heaps-bounded word→tokenization map
    // → ONE per-(doc, source) hash agg (+1 exchange, the stated
    // delta; the corpus side never shuffles and no join-back is needed
    // because the agg carries source through). Docs with zero
    // trainable words after redaction drop (nothing to bill — the
    // inner-join semantics both engines share); budget 900 BPE tokens
    // per source, packs of 128.
    QDef("q_corpus_prep_tokenized",
      s"WITH $trainCte,\n" + prepBody + """,
        |bmap AS (
        |  SELECT replace(replace(w, '(', ''), ')', '') AS word,
        |    CAST(len(string_split(substr(w, 2, length(w) - 2), ')(')) AS BIGINT)
        |      AS n_toks
        |  FROM v""".stripMargin + BpeN + """),
        |sw AS (
        |  SELECT q.doc_id, q.source,
        |    unnest(string_split(lower(trim(q.text)), ' ')) AS word
        |  FROM q JOIN k USING (doc_id)),
        |btok AS (
        |  SELECT doc_id, source, CAST(sum(bm.n_toks) AS BIGINT) AS btoks
        |  FROM (SELECT doc_id, source, word FROM sw
        |        WHERE regexp_matches(word, '^[a-z]{2,}$')) f
        |  JOIN bmap bm USING (word)
        |  GROUP BY doc_id, source),
        |btc AS (
        |  SELECT doc_id, source, btoks,
        |    CAST(sum(btoks) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM btok),
        |btb AS (SELECT source, btoks, cum FROM btc WHERE cum - btoks < 900),
        |btp AS (
        |  SELECT source, (cum - btoks) // 128 AS pack_id, btoks,
        |    CASE WHEN (cum - 1) // 128 > (cum - btoks) // 128
        |         THEN 1 ELSE 0 END AS straddle
        |  FROM btb)
        |SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(btoks) AS BIGINT) AS toks_sum,
        |  CAST(sum(straddle) AS BIGINT) AS n_straddle
        |FROM btp GROUP BY source, pack_id
        |ORDER BY source, pack_id
        |""".stripMargin) { (s, dir) =>
      val cap = 128L
      val (_, vocab) = trainBpe(s, dir)
      val bmap = vocab.select(
        regexp_replace(col("w"), "[()]", "").as("word"),
        size(symsCol).cast("long").as("n_toks"))
      val btok = dedupedPrep(s, dir)
        .select(col("doc_id"), col("source"),
          explode(split(lower(trim(col("text"))), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]{2,}$"))
        .join(broadcast(bmap), "word")
        .groupBy("doc_id", "source")
        .agg(sum(col("n_toks")).cast("long").as("btoks"))
        // narrow checkpoint: PrefixSum consumes its input twice —
        // without it the explode + vocab join re-runs per phase
        .localCheckpoint()
      graft.plans.PrefixSum.perKey(btok, "source",
          md5(col("doc_id").cast("string").cast("binary")), "doc_id",
          col("btoks"), "cum")
        .filter(col("cum") - col("btoks") < 900)
        .select(col("source"),
          expr(s"(cum - btoks) div $cap").as("pack_id"),
          col("btoks"),
          when(expr(s"(cum - 1) div $cap") > expr(s"(cum - btoks) div $cap"),
            1L).otherwise(0L).as("straddle"))
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("btoks")).cast("bigint").as("toks_sum"),
          sum(col("straddle")).cast("bigint").as("n_straddle"))
        .orderBy("source", "pack_id")
    },

    // ---- BPE tokenizer training: the full N-merge loop ------------------
    QDef("q_bpe_train", {
      val sel = (1 to BpeN).map(r =>
        s"SELECT CAST($r AS BIGINT) AS step, split_part(p, '|', 1) AS lhs, " +
          s"split_part(p, '|', 2) AS rhs, cnt FROM b$r")
        .mkString(" UNION ALL ")
      s"WITH $trainCte\nSELECT * FROM ($sel) ORDER BY step"
    }) { (s, dir) =>
      import s.implicits._
      val (merges, _) = trainBpe(s, dir)
      merges.toDF("step", "lhs", "rhs", "cnt").orderBy("step")
    },

    // ---- image near-dup dedup: dHash + Hamming banding ------------------
    // The image bridge of the near-dup family: synthesize a real 24-bit
    // BMP per image doc (deterministic gradient + planted variants —
    // Multimodal.ImageDupSynth), decode it through the genuine JDK BMP
    // reader, dHash the decoded pixels with the codegen'd `dhash64`
    // expression, and band the 64-bit hash through the exact SimHash
    // machinery (4 × 16-bit bands → equi-join candidates → hamming ≤ 3
    // verify). Threshold 3 < 4 bands ⇒ banding provably equals the
    // all-pairs scan (pigeonhole: ≤3 differing bits leave ≥1 band
    // intact), so the blocked join is lossless — the 100 TB shape with
    // a small-corpus exactness proof (ImageDedupSpec pins it). The
    // v=3 brightness-shifted variants land at hamming 0 even though
    // every pixel byte differs — the perceptual (not checksum) signal.
    // The oracle recomputes pixels in closed integer form and mirrors
    // the banding; a decode/orientation/channel bug breaks every row.
    QDef("q_dedup_images",
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
        |px AS (
        |  SELECT doc_id, r, c,
        |    (((doc_id // 12) * 73 + r * 29 + c * 13) * 17) % 200
        |    + CASE WHEN (doc_id // 3) % 4 = 1 AND r = 2 AND c = 3 THEN 40
        |           WHEN (doc_id // 3) % 4 = 2 AND c = 0 AND r < 4 THEN 40
        |           WHEN (doc_id // 3) % 4 = 3 THEN 25 ELSE 0 END AS p
        |  FROM ids CROSS JOIN (SELECT unnest(range(0, 8)) AS r)
        |           CROSS JOIN (SELECT unnest(range(0, 9)) AS c)),
        |bits AS (
        |  SELECT a.doc_id, a.r * 8 + a.c AS idx,
        |         CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.r = b.r
        |    AND b.c = a.c + 1
        |  WHERE a.c < 8),
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
      graft.functions.ImageHashExpressions.register(s)
      val px = table(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") % 3 === 0).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(Multimodal.ImageDupSynth.bmp(id)))
            require(img != null, s"doc $id: BMP decode failed")
            val out = new Array[Int](72)
            var r = 0
            while (r < 8) {
              var c = 0
              while (c < 9) {
                out(r * 9 + c) = img.getRGB(c, r) & 0xff // gray: B == G == R
                c += 1
              }
              r += 1
            }
            (id, out.toSeq)
          }
        }.toDF("doc_id", "px")
      // the shared 4×16 banding → equi-join → hamming verify
      // (Coverage18.bandedPairs — ONE definition for image/audio/video)
      Coverage18.bandedPairs(px.select(col("doc_id"),
        call_function("dhash64", col("px")).as("h")))
    },

    // ---- audio near-dup dedup: energy-envelope dHash + banding ----------
    // The audio bridge of the near-dup family, the WAV dual of
    // q_dedup_images: synthesize a real RIFF/WAV per audio doc
    // (deterministic frame energies + planted variants —
    // Multimodal.AudioDupSynth), decode it through the genuine
    // javax.sound path, fingerprint the FRAME-ENERGY ENVELOPE (bit i =
    // e(i+1) > e(i) — invariant under any positive volume scaling, the
    // perceptual signal: v=3's ×1.5 louder copies land at hamming 0
    // though every PCM byte differs), and band the 64-bit hash through
    // the same 4 × 16-bit machinery (threshold 3 < 4 bands ⇒ banding
    // provably equals all-pairs; AudioDedupSpec pins it). The oracle
    // recomputes every energy in closed integer form and mirrors the
    // banding; a byte-order or signedness bug in decode breaks every
    // row (the decoder additionally asserts frame sums are exact).
    QDef("q_dedup_audio",
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
        |en AS (
        |  SELECT doc_id, f,
        |    (((((doc_id // 12) * 7349 + f * 131) % 9973)
        |      * (((doc_id // 12) * 7349 + f * 131) % 9973)) % 9601) * 2 + 300
        |      AS e0
        |  FROM ids CROSS JOIN (SELECT unnest(range(0, 65)) AS f)),
        |ev AS (
        |  SELECT doc_id, f,
        |    CASE WHEN (doc_id // 3) % 4 = 1 AND f = 7 THEN e0 + 8000
        |         WHEN (doc_id // 3) % 4 = 2 AND f IN (10,20,30,40,50)
        |           THEN e0 + 8000
        |         WHEN (doc_id // 3) % 4 = 3 THEN e0 * 3 // 2
        |         ELSE e0 END AS e
        |  FROM en),
        |bits AS (
        |  SELECT a.doc_id, a.f AS idx,
        |         CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
        |  FROM ev a JOIN ev b ON a.doc_id = b.doc_id AND b.f = a.f + 1
        |  WHERE a.f < 64),
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
        .filter(col("doc_id") % 3 === 1).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val wav = Multimodal.AudioDupSynth.wav(id)
            val en = Multimodal.AudioDupSynth.decodeEnergies(wav, id)
            (id, Multimodal.AudioDupSynth.fingerprint(en))
          }
        }.toDF("doc_id", "h")
      Coverage18.bandedPairs(sig)
    },

    // ---- TPC-H Q12: shipping modes and order priority -------------------
    // The last two classic topologies (Q12 here, Q20 below) close the
    // 22/22 set. The corpus lacks shipmode/commitdate/receiptdate
    // entirely, so both engines derive them deterministically from
    // existing keys (the q_pii_flags enrichment move — identical
    // integer expressions both sides; receipt 1–30 days after ship,
    // commit ±30 days around it, mode a 7-way key hash). Plan shape:
    // the mode/date filter cuts lineitem BEFORE the one orderkey
    // shuffle join; priority classification is a hash agg over the
    // survivors. No sort anywhere but the 2-row output.
    QDef("q_tpch_q12",
      """WITH l AS (
        |  SELECT l_orderkey,
        |    (['MAIL','SHIP','AIR','RAIL','TRUCK','FOB','REG AIR'])
        |      [CAST((l_orderkey * 3 + l_linenumber) % 7 AS INTEGER) + 1]
        |      AS l_shipmode,
        |    CAST(l_shipdate AS DATE) AS sd,
        |    CAST(l_shipdate AS DATE)
        |      + CAST((l_orderkey * 5 + l_linenumber * 11) % 61 - 30 AS INTEGER)
        |      AS cd,
        |    CAST(l_shipdate AS DATE)
        |      + CAST((l_orderkey * 13 + l_linenumber * 7) % 30 + 1 AS INTEGER)
        |      AS rd
        |  FROM lineitem)
        |SELECT l_shipmode,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN l ON o_orderkey = l_orderkey
        |WHERE l_shipmode IN ('MAIL', 'SHIP')
        |  AND cd < rd AND sd < cd
        |  AND rd >= DATE '1996-01-01' AND rd < DATE '1997-01-01'
        |GROUP BY l_shipmode ORDER BY l_shipmode
        |""".stripMargin) { (s, dir) =>
      val modes = array(Seq("MAIL", "SHIP", "AIR", "RAIL", "TRUCK", "FOB",
        "REG AIR").map(lit): _*)
      val sd = to_date(col("l_shipdate"))
      val l = table(s, dir, "lineitem").select(col("l_orderkey"),
          element_at(modes,
            (((col("l_orderkey") * 3 + col("l_linenumber")) % 7) + 1)
              .cast("int")).as("l_shipmode"),
          sd.as("sd"),
          date_add(sd, ((col("l_orderkey") * 5 + col("l_linenumber") * 11)
            % 61 - 30).cast("int")).as("cd"),
          date_add(sd, ((col("l_orderkey") * 13 + col("l_linenumber") * 7)
            % 30 + 1).cast("int")).as("rd"))
        .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
          col("cd") < col("rd") && col("sd") < col("cd") &&
          col("rd") >= to_date(lit("1996-01-01")) &&
          col("rd") < to_date(lit("1997-01-01")))
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      table(s, dir, "orders")
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_shipmode")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_shipmode")
    },

    // ---- TPC-H Q20: potential part promotion ----------------------------
    // partsupp doesn't exist in the corpus — it derives as the DISTINCT
    // (partkey, suppkey) pairs lineitem actually exercised, with
    // ps_availqty a key hash in 1..12 (selective against half-year
    // demand: ~1 in 5 suppliers qualify, so the predicate genuinely
    // discriminates). Topology preserved from the classic: part-name
    // prefix IN-subquery (broadcast semi), the correlated availqty >
    // half-of-year-demand agg (keyed join against the year's per-pair
    // sums), supplier IN-subquery (semi), nation broadcast. Exact
    // decimal halving both engines.
    QDef("q_tpch_q20",
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    (l_partkey * 17 + l_suppkey * 29) % 12 + 1 AS ps_availqty
        |  FROM lineitem),
        |agg AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS DECIMAL(38,10))) / 2 AS half_qty
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  GROUP BY 1, 2),
        |chosen AS (
        |  SELECT DISTINCT ps_suppkey FROM ps
        |  JOIN agg ON agg.l_partkey = ps.ps_partkey
        |    AND agg.l_suppkey = ps.ps_suppkey
        |  WHERE ps_partkey IN (SELECT p_partkey FROM part
        |                       WHERE p_name LIKE 'red gi%')
        |    AND CAST(ps_availqty AS DECIMAL(38,10)) > half_qty)
        |SELECT s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT ps_suppkey FROM chosen)
        |  AND n_name IN ('NATION_2', 'NATION_8', 'NATION_9', 'NATION_12',
        |                 'NATION_20', 'NATION_21')
        |ORDER BY s_name
        |""".stripMargin) { (s, dir) =>
      val li = table(s, dir, "lineitem")
      val ps = li.select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey")).distinct()
        .withColumn("ps_availqty",
          (col("ps_partkey") * 17 + col("ps_suppkey") * 29) % 12 + 1)
      val yearAgg = li.filter(
          to_date(col("l_shipdate")) >= to_date(lit("1996-01-01")) &&
          to_date(col("l_shipdate")) < to_date(lit("1997-01-01")))
        .groupBy("l_partkey", "l_suppkey")
        .agg((sum(dec(col("l_quantity"))) / 2).as("half_qty"))
      val redParts = table(s, dir, "part")
        .filter(col("p_name").like("red gi%")).select("p_partkey")
      val chosen = ps
        .join(yearAgg, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .join(broadcast(redParts),
          col("ps_partkey") === col("p_partkey"), "left_semi")
        .filter(col("ps_availqty").cast("decimal(38,10)") > col("half_qty"))
        .select("ps_suppkey").distinct()
      val nations = table(s, dir, "nation").filter(col("n_name").isin(
        "NATION_2", "NATION_8", "NATION_9", "NATION_12", "NATION_20",
        "NATION_21"))
      table(s, dir, "supplier")
        .join(chosen, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .join(broadcast(nations),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select("s_name")
        .orderBy("s_name")
    },

    // ---- apply the trained tokenizer ------------------------------------
    // Token frequencies of the corpus under the learned merge table —
    // the vocabulary a downstream token-budget/packing stage consumes.
    // Spark serves it from the training loop's final checkpointed
    // vocab (one explode + hash agg + TakeOrdered); the oracle
    // re-derives the same state through the unrolled CTE.
    QDef("q_bpe_apply",
      s"""WITH $trainCte
         |SELECT token, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |  SELECT freq, unnest(string_split(substr(w, 2, length(w) - 2), ')(')) AS token
         |  FROM v$BpeN)
         |GROUP BY token ORDER BY cnt DESC, token LIMIT 25
         |""".stripMargin) { (s, dir) =>
      val (_, vocab) = trainBpe(s, dir)
      vocab.select(col("freq"), explode(symsCol).as("token"))
        .groupBy("token").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(25)
    },

    // ---- corpus-scale tokenizer apply: tokenize the DOCUMENTS ------------
    // q_bpe_apply serves token frequencies from the trained VOCAB
    // table; this row tokenizes the documents themselves under the
    // trained merges — per-doc word/token counts, what a packing or
    // budget stage actually consumes. The scale-correct plan: the
    // trained vocab IS the word→tokenization map (stripping the parens
    // recovers the original word; the wrapped form carries its token
    // segmentation), it is Heaps-law vocab-sized regardless of corpus
    // size, so it BROADCASTS and the corpus is touched exactly once —
    // one explode + broadcast-hash-join + hash agg, never a per-doc
    // merge loop. Every filtered word joins by construction (the map
    // was trained on this corpus), so the join is total — inner, not
    // left — and n_words/n_tokens count exactly the trainable words.
    QDef("q_bpe_tokenize",
      s"""WITH $trainCte,
         |map AS (
         |  SELECT replace(replace(w, '(', ''), ')', '') AS word,
         |    CAST(len(string_split(substr(w, 2, length(w) - 2), ')(')) AS BIGINT)
         |      AS n_toks
         |  FROM v$BpeN),
         |wrds AS (
         |  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS word
         |  FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(m.n_toks) AS BIGINT) AS n_tokens
         |FROM (SELECT doc_id, word FROM wrds
         |      WHERE regexp_matches(word, '^[a-z]{2,}$$')) f
         |JOIN map m USING (word)
         |GROUP BY doc_id ORDER BY doc_id
         |""".stripMargin) { (s, dir) =>
      val (_, vocab) = trainBpe(s, dir)
      val map = vocab.select(
        regexp_replace(col("w"), "[()]", "").as("word"),
        size(symsCol).cast("long").as("n_toks"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]{2,}$"))
        .join(broadcast(map), "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_words"),
          sum(col("n_toks")).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    },

    // ---- composite quality verdict (the filter's WHY) --------------------
    // Corpus filters don't just drop documents — they must report WHY,
    // or the curation loop is unsteerable. Three Gopher-style rules
    // composed into a reasons BITMAP (bit0 too-short, bit1 low
    // stopword density, bit2 low distinct-token ratio), each stated in
    // CROSS-MULTIPLIED INTEGER form (stops·10 < toks, dtoks·5 <
    // toks·3) so no float ratio ever reaches a threshold comparison —
    // zero cross-engine rounding surface by construction. Output is
    // the verdict histogram (verdict 0 = keep). Per-row expressions +
    // one hash agg over ≤ 8 groups: scan-speed at any scale.
    QDef("q_quality_verdict",
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS toks,
        |    CAST(len(list_distinct(string_split(trim(text), ' '))) AS BIGINT) AS dtoks,
        |    CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to)\b')) AS BIGINT) AS stops
        |  FROM documents),
        |v AS (
        |  SELECT doc_id,
        |    (CASE WHEN toks < 25 THEN 1 ELSE 0 END)
        |    + (CASE WHEN stops * 10 < toks THEN 2 ELSE 0 END)
        |    + (CASE WHEN dtoks * 5 < toks * 3 THEN 4 ELSE 0 END) AS verdict
        |  FROM t)
        |SELECT CAST(verdict AS BIGINT) AS verdict,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM v GROUP BY verdict ORDER BY verdict
        |""".stripMargin) { (s, dir) =>
      val w = split(trim(col("text")), " ")
      table(s, dir, "documents")
        .select(col("doc_id"),
          size(w).cast("long").as("toks"),
          size(array_distinct(w)).cast("long").as("dtoks"),
          size(regexp_extract_all(col("text"),
            lit("\\b(the|a|of|and|to)\\b"), lit(0))).cast("long").as("stops"))
        .select(col("doc_id"),
          (when(col("toks") < 25, 1L).otherwise(0L)
            + when(col("stops") * 10 < col("toks"), 2L).otherwise(0L)
            + when(col("dtoks") * 5 < col("toks") * 3, 4L).otherwise(0L))
            .as("verdict"))
        .groupBy("verdict")
        .agg(count(lit(1)).cast("bigint").as("n_docs"))
        .orderBy("verdict")
    },

    // ---- personalized PageRank (random walk with restart) ---------------
    // The recommendation dual of q_pagerank: teleport mass returns to
    // a SEED node (deterministically the lexicographic-min event type)
    // instead of spreading uniformly, so ranks answer "what is reached
    // from HERE" — related-item scoring over the same transition
    // graph. Identical loop discipline to q_pagerank (10 damped
    // iterations, facts touched once) and the same unrolled-CTE oracle
    // move; round-6 determinism convention.
    // Round-14 optimization: the 10 damped iterations over the bounded
    // event-type graph ran as ~30 Spark jobs of ≤ |vocab|-row frames —
    // pure job latency (guide §1.2). One corpus pass now collects the
    // weighted edges (Spark arithmetic unchanged) and the loop runs on
    // the bounded graph driver-side; see RankLoops for the float-order
    // argument. Measured 5.0 s med → ~1 s; oracle hash-verified at
    // both SFs; PprLoopSpec pins equality with the Spark-loop shape.
    QDef("q_ppr", pprOracle) { (s, dir) =>
      val (edges, nodes) = RankLoops.eventGraph(s, dir)
      val seed = nodes.min
      val ranks = RankLoops.damped(edges, nodes,
        init = n => if (n == seed) 1.0 else 0.0,
        restart = n => if (n == seed) 0.15 else 0.0)
      RankLoops.rankedDf(s, ranks, "ppr")
    },

    // ---- URL canonicalization dedup --------------------------------------
    // The web-corpus exact-dup step that runs BEFORE any content
    // hashing: the same page arrives under scheme/case/www/trailing-
    // slash/tracking-param/fragment variants, and canonicalization is
    // what collapses them. URLs are derived deterministically from
    // doc_id (the q_pii_flags enrichment move — five variants per
    // group of five docs, identical construction in both engines);
    // canonical form = lowercase, scheme off, leading www. off,
    // fragment off, query off, trailing slash off — an empty-
    // replacement regexp chain (RE2-safe, no group refs, so ONE
    // pattern set serves Java and RE2 alike). Per-row projection +
    // one hash agg: no joins, no windows, scale-free.
    QDef("q_dedup_urls",
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 5
        |      WHEN 0 THEN 'https://site' || (doc_id // 5) % 40 || '.example.com/p/' || doc_id // 5
        |      WHEN 1 THEN 'HTTPS://WWW.Site' || (doc_id // 5) % 40 || '.Example.com/p/' || doc_id // 5
        |      WHEN 2 THEN 'https://site' || (doc_id // 5) % 40 || '.example.com/p/' || doc_id // 5 || '/'
        |      WHEN 3 THEN 'http://site' || (doc_id // 5) % 40 || '.example.com/p/' || doc_id // 5 || '?utm_source=feed&utm_campaign=c1'
        |      ELSE 'https://site' || (doc_id // 5) % 40 || '.example.com/p/' || doc_id // 5 || '#section-2'
        |    END AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      lower(url), '^https?://', ''), '^www\.', ''), '#.*$', ''), '\?.*$', ''), '/$', '')
        |      AS canonical_url
        |  FROM u)
        |SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS keeper
        |FROM c GROUP BY canonical_url HAVING count(*) > 1
        |ORDER BY canonical_url
        |""".stripMargin) { (s, dir) =>
      val g = expr("doc_id div 5")
      val gm = expr("(doc_id div 5) % 40")
      val url = when(col("doc_id") % 5 === 0,
          concat(lit("https://site"), gm, lit(".example.com/p/"), g))
        .when(col("doc_id") % 5 === 1,
          concat(lit("HTTPS://WWW.Site"), gm, lit(".Example.com/p/"), g))
        .when(col("doc_id") % 5 === 2,
          concat(lit("https://site"), gm, lit(".example.com/p/"), g, lit("/")))
        .when(col("doc_id") % 5 === 3,
          concat(lit("http://site"), gm, lit(".example.com/p/"), g,
            lit("?utm_source=feed&utm_campaign=c1")))
        .otherwise(
          concat(lit("https://site"), gm, lit(".example.com/p/"), g,
            lit("#section-2")))
      val canonical = Seq("^https?://", "^www\\.", "#.*$", "\\?.*$", "/$")
        .foldLeft(lower(url)) { (c, p) => regexp_replace(c, p, "") }
      table(s, dir, "documents")
        .select(col("doc_id"), canonical.as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          min(col("doc_id")).cast("bigint").as("keeper"))
        .filter(col("n_docs") > 1)
        .orderBy("canonical_url")
    },

    // ---- training-sequence packing ---------------------------------------
    // The GPT-style concat-and-split packing accountant: docs are laid
    // end to end per source in deterministic md5 order and cut into
    // fixed-capacity training sequences; each doc STARTS in pack
    // floor(start/C) and straddles into the next when its span crosses
    // a cut. Output per (source, pack): docs started, their token
    // mass, and how many straddle — the truncation/waste ledger a
    // packing stage reports before anyone trains on it. All-integer
    // (capacity 256), deterministic in both engines. Plan shape: the
    // cumulative sum rides PrefixSum's two-phase form (no key-sized
    // window task — the q_corpus_prep machinery), then one hash agg;
    // at 100 TB no task ever scans more than ~1/256 of one source.
    QDef("q_pack_sequences",
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, toks,
        |    CAST(sum(toks) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM d),
        |p AS (
        |  SELECT source, (cum - toks) // 256 AS pack_id, toks,
        |    CASE WHEN (cum - 1) // 256 > (cum - toks) // 256
        |         THEN 1 ELSE 0 END AS straddle
        |  FROM c)
        |SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS toks_sum,
        |  CAST(sum(straddle) AS BIGINT) AS n_straddle
        |FROM p GROUP BY source, pack_id
        |ORDER BY source, pack_id
        |""".stripMargin) { (s, dir) =>
      val cap = 256L
      val d = table(s, dir, "documents").select(
        col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      val c = graft.plans.PrefixSum.perKey(d, "source",
        md5(col("doc_id").cast("string").cast("binary")), "doc_id",
        col("toks"), "cum")
      c.select(col("source"),
          expr(s"(cum - toks) div $cap").as("pack_id"),
          col("toks"),
          when(expr(s"(cum - 1) div $cap") > expr(s"(cum - toks) div $cap"),
            1L).otherwise(0L).as("straddle"))
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("toks")).cast("bigint").as("toks_sum"),
          sum(col("straddle")).cast("bigint").as("n_straddle"))
        .orderBy("source", "pack_id")
    },

    // ---- tokenizer fertility ---------------------------------------------
    // Tokens-per-word distribution under the trained merge table — THE
    // downstream tokenizer-quality metric (a fertility shift is how a
    // vocab mismatch with the corpus shows up in training cost: every
    // extra token per word is proportional sequence length). Grain =
    // tokens-per-word bucket; all-integer outputs (word count, corpus
    // occurrences, corpus characters) so both engines agree exactly —
    // ratios are the consumer's division. Spark serves it from the
    // training loop's checkpointed vocab: one projection + hash agg
    // over the Heaps-bounded vocabulary, corpus touched zero times.
    QDef("q_bpe_fertility",
      s"""WITH $trainCte
         |SELECT CAST(len(string_split(substr(w, 2, length(w) - 2), ')(')) AS BIGINT) AS toks,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(freq) AS BIGINT) AS occurrences,
         |  CAST(sum((length(w) - 2 * len(string_split(substr(w, 2, length(w) - 2), ')('))) * freq) AS BIGINT) AS total_chars
         |FROM v$BpeN
         |GROUP BY toks ORDER BY toks
         |""".stripMargin) { (s, dir) =>
      val (_, vocab) = trainBpe(s, dir)
      vocab.select(col("freq"),
          size(symsCol).cast("long").as("toks"),
          (length(col("w")) - lit(2) * size(symsCol)).cast("long").as("chars"))
        .groupBy("toks")
        .agg(count(lit(1)).cast("bigint").as("n_words"),
          sum(col("freq")).cast("bigint").as("occurrences"),
          sum(col("chars") * col("freq")).cast("bigint").as("total_chars"))
        .orderBy("toks")
    }
  )
}

/** Process-level memo for the trained BPE state (merge table + final
  * vocab checkpoint), shared by q_bpe_train / q_bpe_apply — one
  * training loop per corpus snapshot, the GraphMemo posture. The vocab
  * rides a loopInput checkpoint (liveCkpts → released by
  * DedupOps.clearMemos' sweep); this map's references are dropped in
  * the same sweep. */
private[operators] object BpeMemo {
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (Seq[(Long, String, String, Long)], DataFrame)]
  private val hits = scala.collection.concurrent.TrieMap.empty[String, Unit]

  def get(s: SparkSession, dir: String)(
      build: => (Seq[(Long, String, String, Long)], DataFrame))
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    val key = (s, dir)
    if (memo.contains(key)) hits.put("bpe", ())
    memo.getOrElseUpdate(key, build)
  }

  def drainHits(): Set[String] = {
    val h = hits.keySet.toSet
    hits.clear()
    h
  }

  def clear(): Unit = {
    memo.clear()
    hits.clear()
  }
}
