package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Text-analysis surface over the `documents` table: token counting
  * (whitespace + BPE-ish regex), quality scoring, language-ID heuristic,
  * corpus statistics, and document fingerprinting.
  *
  * Everything except the rolling hash is a codegen'd built-in chain —
  * per-row CPU with no shuffle; at 100 TB these run at scan speed.
  */
object TextOps {

  /** Modular polynomial rolling hash over the document's characters
    * (acc·31 + code, mod 1e9+7): the classic content-defined fingerprint.
    * Expressed with `aggregate` over the char array so it stays inside
    * codegen; mod applied each step keeps the accumulator in long range
    * (required under ANSI overflow checking). */
  private[operators] val rollingHashExpr =
    "aggregate(split(text, ''), 0L, (acc, ch) -> pmod(acc * 31 + ascii(ch), 1000000007))"

  val defs: Seq[QDef] = Seq(

    QDef("q_text_tokens",
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS sub_tokens,
        |  CAST(length(text) AS BIGINT) AS n_char, n_chars
        |FROM documents
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("sub_tokens"),
        length(col("text")).cast("long").as("n_char"),
        col("n_chars"))
    },

    QDef("q_text_quality",
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_char,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words,
        |  round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |        / length(text), 6) AS alpha_ratio,
        |  round(CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to)\b')) AS DOUBLE)
        |        / len(string_split(trim(text), ' ')), 6) AS stopword_ratio,
        |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |        / len(string_split(trim(text), ' ')), 6) AS avg_word_len
        |FROM documents
        |""".stripMargin) { (s, dir) =>
      val words = size(split(trim(col("text")), " "))
      table(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_char"),
        words.cast("long").as("n_words"),
        round(length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
          / length(col("text")), 6).as("alpha_ratio"),
        round(size(regexp_extract_all(col("text"),
          lit("\\b(the|a|of|and|to)\\b"), lit(0))).cast("double") / words, 6)
          .as("stopword_ratio"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double") / words, 6)
          .as("avg_word_len"))
    },

    // Marker-word language ID: argmax of per-language stopword counts
    // (deterministic tie-break en > de > fr). A real model is out of
    // scope; the operator shape (n-gram/marker scoring at scan speed) is
    // what scales.
    QDef("q_text_langid",
      """SELECT doc_id, lang,
        |  CASE WHEN n_en >= n_de AND n_en >= n_fr THEN 'en'
        |       WHEN n_de >= n_fr THEN 'de' ELSE 'fr' END AS guess
        |FROM (SELECT doc_id, lang,
        |        len(regexp_extract_all(text, '\b(the|and|of|to)\b')) AS n_en,
        |        len(regexp_extract_all(text, '\b(der|und|das|ist)\b')) AS n_de,
        |        len(regexp_extract_all(text, '\b(le|la|et|est)\b')) AS n_fr
        |      FROM documents) t
        |""".stripMargin) { (s, dir) =>
      def markers(pat: String) =
        size(regexp_extract_all(col("text"), lit(pat), lit(0)))
      table(s, dir, "documents")
        .withColumn("n_en", markers("\\b(the|and|of|to)\\b"))
        .withColumn("n_de", markers("\\b(der|und|das|ist)\\b"))
        .withColumn("n_fr", markers("\\b(le|la|et|est)\\b"))
        .select(col("doc_id"), col("lang"),
          when(col("n_en") >= col("n_de") && col("n_en") >= col("n_fr"), "en")
            .when(col("n_de") >= col("n_fr"), "de")
            .otherwise("fr").as("guess"))
    },

    QDef("q_lang_stats",
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,10))) AS STRING) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          avgExact(col("n_chars")).as("avg_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
    },

    // Bag-of-words fingerprint: md5 over the sorted distinct token set —
    // word-order-insensitive exact dedup key.
    QDef("q_text_fingerprint",
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split(trim(text), ' '))), ' ')) AS bag_fp
        |FROM documents
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        md5(array_join(array_sort(array_distinct(split(trim(col("text")), " "))), " ")
          .cast("binary")).as("bag_fp"))
    },

    // Rolling content hash. Oracle mirrors the fold with DuckDB's
    // list_reduce (0 prepended as the init value); both engines keep
    // the accumulator in BIGINT range by reducing mod 1e9+7 each step,
    // and both operands stay positive so % == pmod. TextOpsSpec
    // additionally checks a Scala reference implementation.
    QDef("q_text_rollhash",
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST(unicode(c) AS BIGINT) for c in split(text, '')]),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS roll_hash
        |FROM documents
        |""".stripMargin) { (s, dir) =>
      // the codegen'd RollingHash expression, not the HOF fold: the HOF
      // interprets its lambda per character and materializes a
      // one-string-per-char array (TextOpsSpec asserts parity)
      graft.functions.TextHashExpressions.register(s)
      table(s, dir, "documents").select(
        col("doc_id"), call_function("rollhash", col("text")).as("roll_hash"))
    },

    // Corpus token-frequency table (top 100): tokenize → count → top-k.
    QDef("q_text_wordcount",
      """SELECT word, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents) t
        |WHERE word <> ''
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 100
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .select(explode(split(trim(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(100)
    },

    // Redaction/scrubbing pass: mask email-shaped and long-digit tokens
    // (the PII-scrub step of a training pipeline; patterns chosen to be
    // regex-dialect-portable).
    QDef("q_text_scrub",
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(text, '[a-z0-9._]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.-]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_longnums
        |FROM documents
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), "[a-z0-9._]+@[a-z0-9.-]+", "<EMAIL>"),
          "[0-9]{6,}", "<NUM>").as("scrubbed"),
        size(regexp_extract_all(col("text"),
          lit("[a-z0-9._]+@[a-z0-9.-]+"), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"),
          lit("[0-9]{6,}"), lit(0))).cast("long").as("n_longnums"))
    },

    // Repetition-ratio quality signal: share of a document's word
    // 3-grams that are repeats (1 - distinct/total) — the standard
    // degenerate-text detector a training pipeline runs next to
    // stopword/length scoring. Per-row expression chain, no shuffle.
    QDef("q_text_repetition",
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |f AS (SELECT doc_id, w FROM toks WHERE len(w) >= 3),
        |idx AS (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM f),
        |g AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |      FROM idx WHERE i <= len(w) - 2),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS total_ngrams,
        |               CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams
        |        FROM g GROUP BY 1)
        |SELECT doc_id, total_ngrams, distinct_ngrams,
        |  round(1 - CAST(distinct_ngrams AS DOUBLE) / total_ngrams, 6) AS rep_ratio
        |FROM agg
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"),
          (size(col("w")) - 2).cast("long").as("total_ngrams"),
          size(array_distinct(expr(
            "transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
          ))).cast("long").as("distinct_ngrams"))
        .select(col("doc_id"), col("total_ngrams"), col("distinct_ngrams"),
          round(lit(1) - col("distinct_ngrams").cast("double") / col("total_ngrams"), 6)
            .as("rep_ratio"))
    },

    // TF-IDF top-3 terms per document (keyword extraction for corpus
    // triage). Shape: tokenize → tf per (doc, term) → df per term →
    // score join keyed on term → per-doc top-3 via the bounded-heap
    // `topk_str_by` aggregate — k rows per (doc × partition) cross the
    // final exchange, no Window sort of the full scored table. The
    // idf factor is the raw N/df ratio (not its log): both engines
    // compute tf·N first (exact small integers in double) then one
    // correctly-rounded IEEE division, so scores are bit-identical
    // cross-engine — a libm log would not be.
    QDef("q_tfidf",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM toks WHERE term <> '' GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |s AS (SELECT doc_id, term,
        |        round(CAST(tf AS DOUBLE) * n.n / df, 6) AS score
        |      FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, score,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        |      FROM s)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, score FROM r WHERE rnk <= 3
        |""".stripMargin) { (s, dir) =>
      graft.functions.TopKBy.register(s)
      val docs = table(s, dir, "documents")
      // Corpus size as a LAZY 1-row aggregate broadcast into the score join
      // (the oracle's `n` CTE) — an eager docs.count() here would run a full
      // corpus scan at plan-construction time, before the query executes.
      val nDf = docs.groupBy().agg(count(lit(1)).cast("double").as("corpus_n"))
      val tf = docs
        .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(df_, "term")
        .crossJoin(broadcast(nDf))
        .withColumn("score",
          round(col("tf").cast("double") * col("corpus_n") / col("df"), 6))
        .groupBy("doc_id")
        .agg(expr("topk_str_by(score, term, 3)").as("top"))
        .select(col("doc_id"), posexplode(col("top")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.term").as("term"), col("col.score").as("score"))
    },

    // Context-window chunking: split each document into 32-token chunks
    // on a 24-token stride (8-token overlap) — the fixed-window chunker
    // a training/RAG pipeline runs before tokenization-to-ids. Chunk k
    // starts at token k·24 while k·24 < n_tokens, so every token lands
    // in ≥1 chunk and consecutive chunks share the overlap. Per-row
    // explode, no shuffle; chunk boundaries are pure arithmetic so both
    // engines emit identical rows.
    QDef("q_chunk_docs",
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |k AS (SELECT doc_id, w,
        |        unnest(range(0, CAST(floor((len(w) - 1) / 24) AS BIGINT) + 1)) AS k
        |      FROM t)
        |SELECT doc_id, k AS chunk_idx,
        |  CAST(len(w[k*24 + 1 : k*24 + 32]) AS BIGINT) AS n_tokens,
        |  array_to_string(w[k*24 + 1 : k*24 + 32], ' ') AS chunk_text
        |FROM k
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, int(floor((size(w) - 1) / 24))), k -> slice(w, k * 24 + 1, 32))")))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          size(col("col")).cast("long").as("n_tokens"),
          array_join(col("col"), " ").as("chunk_text"))
    },
  )
}
