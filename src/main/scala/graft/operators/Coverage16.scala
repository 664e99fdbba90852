package graft.operators

import graft._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 extension wave: corpus-curation operators a training-data
  * pipeline runs between dedup and sampling — vocabulary coverage, gram
  * novelty scoring, PII scanning (the compliance sibling of the
  * takedown machinery), time-decayed engagement, and the k-core /
  * degree-distribution pair that completes the co-purchase graph
  * family (pagerank / triangles / CC already ship).
  *
  * Reference scope: the reference has no analytics surface beyond
  * mirror SELECTs (/root/reference/README.md:85-134); these are
  * LLM-pipeline extensions over the driver corpus, per the §2-B
  * extension rows.
  */
object Coverage16 {

  /** The thresholded co-purchase edge list (support ≥ 2, p1 < p2) —
    * the same graph q_triangle_count / q_pagerank analyze; pair
    * generation from per-order part SETS (one groupBy, no fact
    * self-join — the Coverage7 construction). MEMOIZED per (session,
    * dir) like the dedup family's verified pairs: three graph queries
    * (k-core, degree dist, plus any caller) share one derivation —
    * exactly what a 100 TB deployment does by materializing the edge
    * table once per corpus snapshot. Cleared by `DedupOps.clearMemos`
    * (the bench's between-runs sweep) so medians stay honest. */
  private[operators] def copurchaseEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    GraphMemo.edges(s, dir) {
      table(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))
            |""".stripMargin)).as("pr"))
        .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select("p1", "p2")
    }

  private val copurchaseSql =
    """  SELECT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY p1, p2 HAVING count(DISTINCT a.l_orderkey) >= 2""".stripMargin

  /** Unrolled 3-core peel for the DuckDB oracle: round r keeps nodes
    * with degree ≥ 3 in round r−1's edge set. The gate corpus
    * (sf0.01) reaches its fixpoint by round ~12 (probed: edge count
    * stable 1970 from round 12 through 40); 16 rounds = fixpoint + 4
    * confirming no-op rounds of slack. The Spark side iterates to the
    * TRUE fixpoint, so equality holds exactly when the unroll covers
    * convergence — which the slack guarantees on the gate data.
    * MATERIALIZED: DuckDB inlines plain CTEs per reference, which
    * re-reads the parquet once per reference and trips the open-file
    * limit at this depth. */
  private val kcoreSql: String = {
    val rounds = (1 to 16).map { r =>
      val prev = if (r == 1) "e0" else s"e${r - 1}"
      s"""n$r AS MATERIALIZED (
         |  SELECT node FROM (
         |    SELECT p1 AS node FROM $prev UNION ALL SELECT p2 FROM $prev)
         |  GROUP BY 1 HAVING count(*) >= 3),
         |e$r AS MATERIALIZED (
         |  SELECT p1, p2 FROM $prev
         |  WHERE p1 IN (SELECT node FROM n$r)
         |    AND p2 IN (SELECT node FROM n$r))""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |$copurchaseSql),
       |$rounds
       |SELECT node, CAST(count(*) AS BIGINT) AS core_degree
       |FROM (SELECT p1 AS node FROM e16 UNION ALL SELECT p2 FROM e16)
       |GROUP BY 1
       |""".stripMargin
  }

  val defs: Seq[QDef] = Seq(

    // ---- vocabulary coverage ---------------------------------------------
    // Per-source out-of-vocabulary rate against the corpus top-20
    // vocabulary (count-desc, word-asc tie-break — a deterministic
    // vocab cut). The tokenizer-building question every pipeline asks:
    // which sources does a fixed vocabulary serve worst? Scale: the
    // vocab is a corpus-wide word count (cardinality = vocabulary,
    // not corpus) cut to k by one TakeOrdered, then a BROADCAST left
    // join — the corpus-sized side never shuffles for the membership
    // test, and the per-source rollup is one hash aggregation.
    QDef("q_vocab_coverage",
      """WITH words AS (
        |  SELECT d.source, w.word
        |  FROM documents d, unnest(string_split(trim(d.text), ' ')) AS w(word)),
        |vocab AS (
        |  SELECT word FROM words GROUP BY 1
        |  ORDER BY count(*) DESC, word LIMIT 20)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS oov_tokens,
        |  round(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
        |    / CAST(count(*) AS DOUBLE), 6) AS oov_rate
        |FROM words LEFT JOIN vocab v USING (word)
        |GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val words = table(s, dir, "documents")
        .select(col("source"), explode(split(trim(col("text")), " ")).as("word"))
      val vocab = words.groupBy("word").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("word")).limit(20)
        .select(col("word"), lit(1).as("_inv"))
      words.join(broadcast(vocab), Seq("word"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("_inv").isNull, 1).otherwise(0)).cast("long")
            .as("oov_tokens"))
        .select(col("source"), col("n_tokens"), col("oov_tokens"),
          round(col("oov_tokens").cast("double") / col("n_tokens"), 6)
            .as("oov_rate"))
    },

    // ---- n-gram novelty scoring ------------------------------------------
    // Per document: how many of its DISTINCT 8-grams are first seen in
    // THIS doc, in (doc_id, pos) corpus order — the curation signal
    // that separates contributing documents from recombinations of
    // earlier text (novelty 1.0 = all new; near 0 = assembled from
    // seen grams). Shares SubstringDedup's gram/first-occurrence
    // machinery (one definition of "gram" across the dedup family);
    // the owner doc rides the single-long encoding, so the per-gram
    // min stays a HashAggregate.
    QDef("q_ngram_novelty",
      """WITH docs AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, i AS pos, array_to_string(w[(i+1):(i+8)], ' ') AS g
        |  FROM docs, unnest(range(len(w) - 7)) AS t(i)
        |  WHERE len(w) >= 8),
        |owner AS (
        |  SELECT g, min(doc_id * (1::BIGINT << 24) + pos) // (1::BIGINT << 24)
        |    AS od
        |  FROM grams GROUP BY g),
        |perdoc AS (
        |  SELECT gr.doc_id, count(DISTINCT gr.g) AS n_grams,
        |    count(DISTINCT CASE WHEN o.od = gr.doc_id THEN gr.g END) AS novel
        |  FROM grams gr JOIN owner o USING (g) GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(p.novel, 0) AS BIGINT) AS novel_grams,
        |  round(coalesce(p.novel, 0)
        |    / CAST(coalesce(p.n_grams, 1) AS DOUBLE), 6) AS novelty
        |FROM docs d LEFT JOIN perdoc p USING (doc_id)
        |""".stripMargin) { (s, dir) =>
      val docs = SubstringDedup.tokenize(table(s, dir, "documents"))
      val grams = SubstringDedup.gramsEnc(docs)
      val owner = grams.groupBy("g").agg(min(col("enc")).as("fe"))
        .select(col("g"), shiftright(col("fe"), 24).as("od"))
      val perdoc = grams.join(owner, "g")
        .groupBy("doc_id")
        .agg(countDistinct(col("g")).as("n_grams"),
          countDistinct(when(col("od") === col("doc_id"), col("g")))
            .as("novel"))
      docs.select("doc_id").join(perdoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("novel"), lit(0L)).as("novel_grams"),
          round(coalesce(col("novel"), lit(0L)).cast("double") /
            coalesce(col("n_grams"), lit(1L)), 6).as("novelty"))
    },

    // ---- PII scanning ----------------------------------------------------
    // Per-source counts of email / phone / IPv4 hits — the SCAN half of
    // the compliance story whose REMOVAL half is the takedown machinery
    // (IncrementalPostings.delete et al.): a pipeline first finds what
    // it must redact. The corpus is synthetic, so both engines enrich
    // deterministically from doc_id (same expression text both sides —
    // the q_media_* synthesis convention) and then run the SAME three
    // regexes; counting is regexp_count, codegen'd, one pass, one
    // hash aggregation. The regex subset (char classes, bounded
    // repetition) behaves identically in Java regex and RE2.
    QDef("q_pii_flags",
      """WITH enriched AS (
        |  SELECT doc_id, source,
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
        |  FROM documents),
        |flags AS (
        |  SELECT doc_id, source,
        |    len(regexp_extract_all(text,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS emails,
        |    len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4}-[0-9]{4}')) AS phones,
        |    len(regexp_extract_all(text,
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS ips
        |  FROM enriched)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(emails) AS BIGINT) AS emails,
        |  CAST(sum(phones) AS BIGINT) AS phones,
        |  CAST(sum(ips) AS BIGINT) AS ips,
        |  CAST(sum(CASE WHEN emails + phones + ips > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS flagged_docs
        |FROM flags GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val d = table(s, dir, "documents")
      val enriched = d.select(col("doc_id"), col("source"),
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
      enriched.select(col("source"),
          regexp_count(col("text"),
            lit("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")).as("emails"),
          regexp_count(col("text"),
            lit("[0-9]{3}-[0-9]{4}-[0-9]{4}")).as("phones"),
          regexp_count(col("text"),
            lit("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}")).as("ips"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("emails")).cast("long").as("emails"),
          sum(col("phones")).cast("long").as("phones"),
          sum(col("ips")).cast("long").as("ips"),
          sum(when(col("emails") + col("phones") + col("ips") > 0, 1)
            .otherwise(0)).cast("long").as("flagged_docs"))
    },

    // ---- time-decayed engagement -----------------------------------------
    // Per-user half-life-weighted value sum (half-life 30 days against
    // the corpus max ts) — the recency weighting feature stores and
    // ranking pipelines maintain. Cross-engine: each TERM is rounded to
    // 10dp and decimal-cast BEFORE the sum (a double sum's order noise
    // would sit exactly on the comparison quantum; decimal addition is
    // order-independent), then one string-roundtripped double out.
    // Scale: one broadcast 1-row max, one hash aggregation.
    QDef("q_decay_sum",
      """WITH mx AS (SELECT max(ts) AS m FROM events),
        |d AS (
        |  SELECT user_id,
        |    CAST(round(value * power(0.5,
        |      date_diff('second', ts, (SELECT m FROM mx)) / (30.0 * 86400)),
        |      10) AS DECIMAL(38,10)) AS dv
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(CAST(CAST(sum(dv) AS STRING) AS DOUBLE), 4) AS decayed_value
        |FROM d GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val mx = ev.agg(max(col("ts")).as("m"))
      ev.crossJoin(broadcast(mx))
        .select(col("user_id"),
          round(col("value") * pow(lit(0.5),
            (unix_seconds(col("m").cast("timestamp")) -
              unix_seconds(col("ts").cast("timestamp"))).cast("double") /
              (30.0 * 86400)), 10).cast("decimal(38,10)").as("dv"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("dv")).cast("double"), 4).as("decayed_value"))
    },

    // ---- k-core decomposition --------------------------------------------
    // The 3-core of the co-purchase graph: iteratively peel nodes of
    // degree < 3 until a fixpoint — the standard dense-subgraph /
    // influence-backbone extraction (the graph sibling of the CC
    // fixpoint, same loop discipline: localCheckpoint per round so
    // plans stay constant-size, rounds bounded by peel depth, never
    // corpus size). Spark runs to the TRUE fixpoint; the oracle
    // unrolls 16 peel rounds (fixpoint ~12 on the gate corpus + slack
    // — see kcoreSql). Output: each core node with its degree inside
    // the core.
    QDef("q_kcore", kcoreSql) { (s, dir) =>
      // the memoized edge table IS already a loopInput checkpoint —
      // seed the peel from it directly, but never release it (other
      // graph queries share it); only loop-OWNED rounds drop early
      var edges = copurchaseEdges(s, dir)
      var loopOwned = false
      var n = edges.count()
      var converged = n == 0
      var iter = 0
      while (!converged && iter < 50) {
        val nodes = edges
          .select(explode(array(col("p1"), col("p2"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 3).select("node")
        val next = DedupOps.loopInput(edges
          .join(nodes.withColumnRenamed("node", "p1"), "p1")
          .join(nodes.withColumnRenamed("node", "p2"), "p2"))
        val m = next.count() // materializes next — its input can drop
        if (loopOwned) DedupOps.releaseLoopInput(edges)
        converged = m == n
        n = m
        edges = next
        loopOwned = true
        iter += 1
      }
      // fail LOUDLY if the round cap ever bites: a partially-peeled
      // edge set would emit silently-wrong core degrees, and the
      // oracle-equality argument assumes the TRUE fixpoint
      require(converged,
        s"q_kcore: no fixpoint within $iter peel rounds ($n edges left)")
      edges.select(explode(array(col("p1"), col("p2"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("core_degree"))
    },

    // ---- degree distribution ---------------------------------------------
    // Log₂-bucketed degree histogram of the co-purchase graph — the
    // one-pass shape diagnostic run before committing to a join
    // strategy on graph data (a heavy tail = salt the hub keys). The
    // bucket is length(bin(d)) — integer bit length, no float log
    // whose libm rounding could differ across engines.
    QDef("q_graph_degree_dist",
      s"""WITH e AS (
         |$copurchaseSql),
         |deg AS (
         |  SELECT node, count(*) AS d
         |  FROM (SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e)
         |  GROUP BY 1)
         |SELECT CAST(len(bin(d)) AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(min(d) AS BIGINT) AS min_deg, CAST(max(d) AS BIGINT) AS max_deg
         |FROM deg GROUP BY 1
         |""".stripMargin) { (s, dir) =>
      // both endpoints via ONE explode, not a unionAll of two selects —
      // a union re-executes the whole edge-derivation subtree per leg
      copurchaseEdges(s, dir)
        .select(explode(array(col("p1"), col("p2"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("d"))
        .groupBy(length(bin(col("d"))).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("d")).as("min_deg"), max(col("d")).as("max_deg"))
    },

    // ---- connected components of the co-purchase graph -------------------
    // Component size distribution — the "is this graph one blob or
    // many islands?" diagnostic (here: one ~1.9k-node giant component
    // plus small satellites). Rides the SAME pointer-doubling CC
    // fixpoint the dedup family uses (O(log diameter) rounds,
    // per-round localCheckpoint) over the shared memoized edge table;
    // the oracle is the dedup-cluster reachability CTE re-anchored to
    // the co-purchase edges.
    QDef("q_graph_components",
      s"""WITH RECURSIVE e0 AS MATERIALIZED (
         |$copurchaseSql),
         |edges AS (SELECT p1 AS a, p2 AS b FROM e0 UNION SELECT p2, p1 FROM e0),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.id),
         |cc AS (SELECT id, min(r) AS canonical FROM reach GROUP BY id)
         |SELECT canonical, CAST(count(*) AS BIGINT) AS n_nodes
         |FROM cc GROUP BY 1
         |""".stripMargin) { (s, dir) =>
      DedupOps.connectedComponents(copurchaseEdges(s, dir)
          .select(col("p1").as("d1"), col("p2").as("d2")))
        .groupBy("canonical").agg(count(lit(1)).as("n_nodes"))
    },

    // ---- windowed DISTINCT aggregate -------------------------------------
    // Running distinct event types per user — SQL's
    // `count(DISTINCT) OVER`, which Spark's window functions DON'T
    // support: encoded as `size(collect_set() OVER)`, exact because
    // the set is bounded by the event-type vocabulary (a handful),
    // never the frame length. The window partitions by user — at
    // 100 TB the per-user frame is the user's history, the standard
    // sessionized-window cost, and the state per row is the tiny set.
    QDef("q_win_countd",
      """SELECT user_id, event_id,
        |  CAST(count(DISTINCT event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_types
        |FROM events
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "events").select(col("user_id"), col("event_id"),
        size(collect_set(col("event_type")).over(w)).cast("long").as("n_types"))
    },

    // ---- windowed exact median -------------------------------------------
    // Trailing-10-event exact median per user. DuckDB's windowed
    // `median` averages the two middles on even frames; Spark has no
    // exact windowed percentile, so the frame's values ride a bounded
    // sorted array (≤10 elements — constant per-row state) and the
    // middle arithmetic is spelled out. Both engines see the same
    // parquet doubles and the same two-middle average → identical bits.
    QDef("q_win_median",
      """SELECT user_id, event_id,
        |  round(median(value) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS med10
        |FROM events
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-9, Window.currentRow)
      table(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          sort_array(collect_list(col("value")).over(w)).as("_fr"))
        .select(col("user_id"), col("event_id"),
          round(when(size(col("_fr")) % 2 === 1,
            element_at(col("_fr"), expr("CAST((size(_fr) + 1) div 2 AS INT)")))
            .otherwise((element_at(col("_fr"), expr("CAST(size(_fr) div 2 AS INT)")) +
              element_at(col("_fr"), expr("CAST(size(_fr) div 2 + 1 AS INT)"))) / 2), 6)
            .as("med10"))
    },

    // ---- CUSUM mean-shift detection --------------------------------------
    // Per user: the event where the cumulative sum of (value − user
    // mean) deviates most — the classic CUSUM change-point statistic.
    // Cross-engine determinism is the whole trick here: the mean comes
    // from an exact decimal sum (order-independent), each deviation is
    // rounded to 10dp and decimal-cast BEFORE the running sum (DuckDB
    // computes windowed float sums on a segment tree — a DIFFERENT
    // association order than Spark's sequential fold, so a double
    // cusum would drift), and the argmax tie-breaks on event_id.
    QDef("q_cusum_shift",
      """WITH m AS (
        |  SELECT user_id,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(38,10))) AS STRING) AS DOUBLE)
        |      / count(*) AS mu
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, e.event_id,
        |    sum(CAST(round(e.value - m.mu, 10) AS DECIMAL(38,10))) OVER (
        |      PARTITION BY e.user_id ORDER BY e.ts, e.event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        |  FROM events e JOIN m USING (user_id)),
        |r AS (
        |  SELECT user_id, event_id, abs(cusum) AS a,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY abs(cusum) DESC, event_id) AS rn
        |  FROM c)
        |SELECT user_id, CAST(event_id AS BIGINT) AS shift_event,
        |  round(CAST(CAST(a AS STRING) AS DOUBLE), 4) AS max_dev
        |FROM r WHERE rn = 1
        |""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val m = ev.groupBy("user_id")
        .agg((sumExact(col("value")) / count(lit(1))).as("mu"))
      val wc = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = ev.join(m, "user_id")
        .withColumn("cusum", sum(round(col("value") - col("mu"), 10)
          .cast("decimal(38,10)")).over(wc))
      val wr = Window.partitionBy("user_id")
        .orderBy(abs(col("cusum")).desc, col("event_id"))
      c.withColumn("rn", row_number().over(wr))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("shift_event"),
          round(abs(col("cusum")).cast("double"), 4).as("max_dev"))
    },

    // ---- session-level rollup --------------------------------------------
    // Per-user session metrics over the same 30-minute-gap sessions
    // q_sessionize builds (session_window both sides of the pair;
    // `>=` in the oracle's lag flag matches session_window's
    // touching-windows-don't-merge semantics). The DAU dashboards'
    // staple: session counts, events per session, longest session.
    QDef("q_session_stats",
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id)
        |         >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x),
        |sess AS (
        |  SELECT user_id, sid, count(*) AS n_events,
        |    date_diff('second', min(ts), max(ts)) AS dur_s
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  round(sum(n_events) / CAST(count(*) AS DOUBLE), 6)
        |    AS events_per_session,
        |  CAST(max(dur_s) AS BIGINT) AS max_session_s
        |FROM sess GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          (unix_seconds(max(col("ts")).cast("timestamp")) -
            unix_seconds(min(col("ts")).cast("timestamp"))).as("dur_s"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).cast("long").as("n_events"),
          round(sum(col("n_events")).cast("double") / count(lit(1)), 6)
            .as("events_per_session"),
          max(col("dur_s")).cast("long").as("max_session_s"))
    },

    // ---- conversion lag --------------------------------------------------
    // Corpus percentiles of first-view → first-purchase lag. The
    // percentile is DISC (no interpolation — integer seconds stay
    // integers) and computed WITHOUT a data-sized unpartitioned
    // window: percentile_disc(p) is the value at ascending rank
    // ⌈p·n⌉, served by the two-phase OrderedPrefix rank + a min-filter
    // (the q_gap_stats construction lifted to a global, rank-based
    // form — one row per converted user, never sorted in one task).
    QDef("q_conversion_lag",
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        |  FROM events GROUP BY 1),
        |lag AS (
        |  SELECT user_id, date_diff('second', fv, fp) AS lag_s
        |  FROM f WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  CAST(min(lag_s) AS BIGINT) AS min_s,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_s) AS BIGINT)
        |    AS p50_s,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_s) AS BIGINT)
        |    AS p90_s,
        |  CAST(max(lag_s) AS BIGINT) AS max_s
        |FROM lag
        |""".stripMargin) { (s, dir) =>
      val f = table(s, dir, "events").groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("fv"),
          min(when(col("event_type") === "purchase", col("ts"))).as("fp"))
      val lagT = f
        .filter(col("fv").isNotNull && col("fp").isNotNull &&
          col("fp") >= col("fv"))
        .select(col("user_id"),
          (unix_seconds(col("fp").cast("timestamp")) -
            unix_seconds(col("fv").cast("timestamp"))).as("lag_s"))
      val ranked = graft.plans.OrderedPrefix.rank(
        lagT, Nil, col("lag_s").cast("double"), col("user_id"), "rk")
      val n = lagT.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(n))
        .agg(count(lit(1)).as("n_converted"),
          min(col("lag_s")).as("min_s"),
          min(when(col("rk") >= ceil(col("n") * 0.5), col("lag_s"))).as("p50_s"),
          min(when(col("rk") >= ceil(col("n") * 0.9), col("lag_s"))).as("p90_s"),
          max(col("lag_s")).as("max_s"))
    },

    // ---- source-mix drift ------------------------------------------------
    // Per-source L1 distance between its language mix and the corpus
    // mix — the data-drift alarm a curation pipeline watches when a
    // source starts delivering different content. Each |Δshare| term
    // is rounded to 10dp and decimal-cast before the per-source sum
    // (≤ |languages| terms, but the house rule is unconditional:
    // double-addition order must never reach the comparison quantum).
    QDef("q_source_mix_drift",
      """WITH m AS (SELECT source, lang, count(*) AS c
        |           FROM documents GROUP BY 1, 2),
        |t AS (SELECT source, sum(c) AS n FROM m GROUP BY 1),
        |g AS (SELECT lang, count(*) AS gc FROM documents GROUP BY 1),
        |tot AS (SELECT count(*) AS gn FROM documents),
        |terms AS (
        |  SELECT m.source,
        |    CAST(round(abs(m.c / CAST(t.n AS DOUBLE)
        |      - g.gc / CAST(tot.gn AS DOUBLE)), 10) AS DECIMAL(38,10)) AS d
        |  FROM m JOIN t USING (source) JOIN g USING (lang), tot)
        |SELECT source,
        |  round(CAST(CAST(sum(d) AS STRING) AS DOUBLE), 6) AS l1_drift
        |FROM terms GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val m = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      val t = m.groupBy("source").agg(sum(col("c")).as("n"))
      val g = docs.groupBy("lang").agg(count(lit(1)).as("gc"))
      val tot = docs.agg(count(lit(1)).as("gn"))
      m.join(t, "source").join(broadcast(g), "lang").crossJoin(broadcast(tot))
        .select(col("source"),
          round(abs(col("c").cast("double") / col("n") -
            col("gc").cast("double") / col("gn")), 10)
            .cast("decimal(38,10)").as("d"))
        .groupBy("source")
        .agg(round(sum(col("d")).cast("double"), 6).as("l1_drift"))
    },

    // ---- local clustering coefficient ------------------------------------
    // Per-node cc = 2t / d(d−1) over the co-purchase graph, reported
    // as an integer-exact decile histogram (bucket = ⌊10·cc⌋ computed
    // as (20t) div (d(d−1)) — BIGINT floor division, no float whose
    // rounding could straddle a bucket edge across engines) with the
    // per-bucket mean cc from decimal-cast 10dp terms. Rides the
    // degree-oriented triangle TRIPLES (O(m^1.5) enumeration,
    // plans.OrientedTriangles) over the shared memoized edge table;
    // the oracle keeps the id-ordered self-join as the anchor —
    // per-node counts are orientation-invariant for the same reason
    // the total is.
    QDef("q_graph_cluster_coeff",
      s"""WITH e AS MATERIALIZED (
         |$copurchaseSql),
         |tri AS (
         |  SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
         |  FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
         |    JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
         |tv AS (
         |  SELECT node, count(*) AS t
         |  FROM (SELECT a AS node FROM tri
         |        UNION ALL SELECT b FROM tri
         |        UNION ALL SELECT c FROM tri)
         |  GROUP BY 1),
         |deg AS (
         |  SELECT node, count(*) AS d
         |  FROM (SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e)
         |  GROUP BY 1),
         |cc AS (
         |  SELECT deg.node, deg.d, COALESCE(tv.t, 0) AS t
         |  FROM deg LEFT JOIN tv USING (node) WHERE deg.d >= 2)
         |SELECT CAST((20 * t) // (d * (d - 1)) AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_nodes,
         |  round(CAST(CAST(sum(CAST(round(2.0 * t / (d * (d - 1)), 10)
         |      AS DECIMAL(38,10))) AS STRING) AS DOUBLE) / count(*), 6)
         |    AS avg_cc
         |FROM cc GROUP BY 1
         |""".stripMargin) { (s, dir) =>
      val e = copurchaseEdges(s, dir)
      // per-node triangle incidence from ONE read of the triple table
      // (explode, not a 3-leg union that re-runs the enumeration)
      val tv = graft.plans.OrientedTriangles.triangles(e)
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("t"))
      graft.plans.OrientedTriangles.degrees(e)
        .withColumnRenamed("v", "node")
        .filter(col("deg") >= 2)
        .join(tv, Seq("node"), "left")
        .select(col("deg").as("d"), coalesce(col("t"), lit(0L)).as("t"))
        .groupBy(expr("(20 * t) div (d * (d - 1))").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_nodes"),
          round(sum(round(lit(2.0) * col("t") / (col("d") * (col("d") - 1)), 10)
            .cast("decimal(38,10)")).cast("double") / count(lit(1)), 6)
            .as("avg_cc"))
    },

    // ---- neighborhood Jaccard (link strength) ----------------------------
    // Top-20 co-purchase edges by common-neighbor count — the link-
    // prediction staple. Common neighbors of an edge's endpoints ARE
    // the triangles through that edge, so the score rides the same
    // O(m^1.5) oriented enumeration instead of a neighbor-set
    // intersection join (Σ deg² with no orientation bound). Ordered by
    // the INTEGER count with (p1, p2) tie-break — a float-jaccard sort
    // key could order near-ties differently across engines; jaccard
    // c/(d₁+d₂−c) is reported, not sorted on.
    QDef("q_graph_jaccard",
      s"""WITH e AS MATERIALIZED (
         |$copurchaseSql),
         |tri AS (
         |  SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
         |  FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
         |    JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
         |te AS (
         |  SELECT p1, p2, count(*) AS cn FROM (
         |    SELECT least(a, b) AS p1, greatest(a, b) AS p2 FROM tri
         |    UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
         |    UNION ALL SELECT least(a, c), greatest(a, c) FROM tri)
         |  GROUP BY 1, 2),
         |deg AS (
         |  SELECT node, count(*) AS d
         |  FROM (SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e)
         |  GROUP BY 1)
         |SELECT e.p1, e.p2, CAST(COALESCE(te.cn, 0) AS BIGINT) AS cn,
         |  round(COALESCE(te.cn, 0) /
         |    CAST(d1.d + d2.d - COALESCE(te.cn, 0) AS DOUBLE), 6) AS jaccard
         |FROM e LEFT JOIN te ON e.p1 = te.p1 AND e.p2 = te.p2
         |  JOIN deg d1 ON d1.node = e.p1 JOIN deg d2 ON d2.node = e.p2
         |ORDER BY cn DESC, e.p1, e.p2 LIMIT 20
         |""".stripMargin) { (s, dir) =>
      val e = copurchaseEdges(s, dir)
      // each triangle charges its three edges from ONE read of the
      // triple table (normalized least/greatest — the enumeration's
      // (a,b,c) is (degree,id)-oriented, not id-sorted)
      val te = graft.plans.OrientedTriangles.triangles(e)
        .select(explode(array(
          struct(least(col("a"), col("b")).as("p1"),
            greatest(col("a"), col("b")).as("p2")),
          struct(least(col("b"), col("c")).as("p1"),
            greatest(col("b"), col("c")).as("p2")),
          struct(least(col("a"), col("c")).as("p1"),
            greatest(col("a"), col("c")).as("p2")))).as("pr"))
        .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("cn"))
      val deg = graft.plans.OrientedTriangles.degrees(e)
      e.join(te, Seq("p1", "p2"), "left")
        .join(deg.select(col("v").as("p1"), col("deg").as("d1")), "p1")
        .join(deg.select(col("v").as("p2"), col("deg").as("d2")), "p2")
        .select(col("p1"), col("p2"),
          coalesce(col("cn"), lit(0L)).as("cn"),
          round(coalesce(col("cn"), lit(0L)).cast("double") /
            (col("d1") + col("d2") - coalesce(col("cn"), lit(0L)))
              .cast("double"), 6).as("jaccard"))
        .orderBy(col("cn").desc, col("p1"), col("p2"))
        .limit(20)
    },

    // ---- two-hop reach (friend-of-friend) --------------------------------
    // Top-20 nodes by ≤2-hop neighborhood size over the co-purchase
    // graph — the "recommendation reach" ranking (how many parts are
    // one co-purchase away from being co-purchased). The 2-path join
    // is the SAME Σ deg²-bounded shape as the triangle enumeration —
    // the support-≥2 threshold is what keeps it bounded — and the
    // DISTINCT collapse runs BEFORE the per-node count so the count
    // never sees the multiplicity blowup. exact-2-hop (new2) =
    // 2-paths minus direct edges (left_anti); all keys integer,
    // ordered by (reach2 DESC, node).
    QDef("q_graph_two_hop",
      s"""WITH e AS MATERIALIZED (
         |$copurchaseSql),
         |u AS (SELECT p1 AS v, p2 AS w FROM e UNION ALL SELECT p2, p1 FROM e),
         |p2s AS (SELECT DISTINCT a.v, b.w
         |  FROM u a JOIN u b ON a.w = b.v AND a.v <> b.w),
         |reach AS (SELECT v, w FROM p2s UNION SELECT v, w FROM u),
         |r AS (SELECT v, CAST(count(*) AS BIGINT) AS reach2 FROM reach GROUP BY 1),
         |n2 AS (SELECT v, CAST(count(*) AS BIGINT) AS new2 FROM (
         |  SELECT v, w FROM p2s EXCEPT SELECT v, w FROM u) GROUP BY 1),
         |d AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM u GROUP BY 1)
         |SELECT r.v AS node, d.deg, COALESCE(n2.new2, 0) AS new2, r.reach2
         |FROM r JOIN d USING (v) LEFT JOIN n2 USING (v)
         |ORDER BY r.reach2 DESC, r.v LIMIT 20
         |""".stripMargin) { (s, dir) =>
      val e = copurchaseEdges(s, dir)
      val u = e.select(col("p1").as("v"), col("p2").as("w"))
        .unionAll(e.select(col("p2").as("v"), col("p1").as("w")))
      val p2s = u.as("a")
        .join(u.as("b"), col("a.w") === col("b.v") && col("a.v") =!= col("b.w"))
        .select(col("a.v").as("v"), col("b.w").as("w")).distinct()
      val reach = p2s.union(u).distinct()
        .groupBy("v").agg(count(lit(1)).as("reach2"))
      val new2 = p2s.join(u, Seq("v", "w"), "left_anti")
        .groupBy("v").agg(count(lit(1)).as("new2"))
      val deg = u.groupBy("v").agg(count(lit(1)).as("deg"))
      reach.join(deg, "v").join(new2, Seq("v"), "left")
        .select(col("v").as("node"), col("deg"),
          coalesce(col("new2"), lit(0L)).as("new2"), col("reach2"))
        .orderBy(col("reach2").desc, col("node"))
        .limit(20)
    },

    // ---- degree assortativity --------------------------------------------
    // Newman's degree-assortativity coefficient of the co-purchase
    // graph — "do hubs link to hubs?" (negative = hub-to-leaf, the
    // typical retail shape). Every Σ in the formula is an INTEGER sum
    // over edge-endpoint degrees (emitted alongside r for exact
    // comparison); only the final ratio is float, with the operand
    // tree textually identical in both engines so each IEEE step
    // rounds identically. One keyed join onto the degree table per
    // endpoint, one global agg — no iteration.
    QDef("q_graph_assortativity",
      s"""WITH e AS MATERIALIZED (
         |$copurchaseSql),
         |deg AS (
         |  SELECT node, count(*) AS d
         |  FROM (SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e)
         |  GROUP BY 1),
         |s AS (
         |  SELECT CAST(count(*) AS BIGINT) AS m,
         |    CAST(sum(d1.d * d2.d) AS BIGINT) AS sxy,
         |    CAST(sum(d1.d + d2.d) AS BIGINT) AS sx,
         |    CAST(sum(d1.d * d1.d + d2.d * d2.d) AS BIGINT) AS sx2
         |  FROM e JOIN deg d1 ON d1.node = e.p1
         |    JOIN deg d2 ON d2.node = e.p2)
         |SELECT m, sxy, sx, sx2,
         |  round((sxy / CAST(m AS DOUBLE) - (sx / (2.0 * m)) * (sx / (2.0 * m))) /
         |        (sx2 / (2.0 * m) - (sx / (2.0 * m)) * (sx / (2.0 * m))), 6)
         |    AS assortativity
         |FROM s
         |""".stripMargin) { (s, dir) =>
      val e = copurchaseEdges(s, dir)
      val deg = graft.plans.OrientedTriangles.degrees(e)
      val sums = e
        .join(deg.select(col("v").as("p1"), col("deg").as("d1")), "p1")
        .join(deg.select(col("v").as("p2"), col("deg").as("d2")), "p2")
        .agg(count(lit(1)).as("m"),
          sum(col("d1") * col("d2")).as("sxy"),
          sum(col("d1") + col("d2")).as("sx"),
          sum(col("d1") * col("d1") + col("d2") * col("d2")).as("sx2"))
      sums.select(col("m"), col("sxy"), col("sx"), col("sx2"),
        round((col("sxy") / col("m").cast("double") -
            (col("sx") / (lit(2.0) * col("m"))) * (col("sx") / (lit(2.0) * col("m")))) /
          (col("sx2") / (lit(2.0) * col("m")) -
            (col("sx") / (lit(2.0) * col("m"))) * (col("sx") / (lit(2.0) * col("m")))), 6)
          .as("assortativity"))
    },

    // ---- engagement inequality (Gini) ------------------------------------
    // Gini coefficient of per-user event counts — the "do 1% of users
    // produce 99% of the data?" curation diagnostic. The rank formula
    // G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) needs every xᵢ's global rank,
    // which at 100 TB is the OrderedPrefix two-phase rank, not a
    // single-partition window; tie ORDER is irrelevant to Σ i·xᵢ
    // (equal x over consecutive i), but ranks must be DISTINCT, so the
    // tie column pins them. All Σ are integer; the ratio is the only
    // float.
    QDef("q_user_gini",
      """WITH c AS (SELECT user_id, count(*) AS x FROM events GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(x) AS BIGINT) AS n_events,
        |  CAST(sum(i * x) AS BIGINT) AS weighted,
        |  round((2.0 * sum(i * x) - (count(*) + 1) * sum(x)) /
        |        (count(*) * CAST(sum(x) AS DOUBLE)), 6) AS gini
        |FROM r
        |""".stripMargin) { (s, dir) =>
      val counts = table(s, dir, "events").groupBy("user_id")
        .agg(count(lit(1)).as("x"))
      graft.plans.OrderedPrefix.rank(
          counts, Nil, col("x").cast("double"), col("user_id"), "rk")
        .agg(count(lit(1)).as("n_users"),
          sum(col("x")).as("n_events"),
          sum(col("rk") * col("x")).as("weighted"))
        .select(col("n_users"), col("n_events"), col("weighted"),
          round((lit(2.0) * col("weighted") -
              (col("n_users") + 1) * col("n_events")) /
            (col("n_users") * col("n_events").cast("double")), 6).as("gini"))
    },

    // ---- cohort lifetime value -------------------------------------------
    // Weekly-cohort LTV triangle: per (first-seen week, weeks-since)
    // the buyer count and exact-decimal purchase revenue — the
    // retention triangle's revenue sibling. Ages come from day
    // arithmetic on week-truncated stamps (both engines truncate to
    // Monday; days div 7 is exact on aligned weeks — no engine 'week'
    // diff whose boundary conventions could differ).
    QDef("q_cohort_ltv",
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events GROUP BY 1),
        |rev AS (SELECT e.user_id, f.cohort,
        |    date_diff('day', f.cohort, date_trunc('week', e.ts)) // 7 AS age,
        |    e.value
        |  FROM events e JOIN f USING (user_id)
        |  WHERE e.event_type = 'purchase')
        |SELECT CAST(cohort AS TIMESTAMP) AS cohort, CAST(age AS BIGINT) AS age,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS buyers,
        |  round(CAST(CAST(sum(CAST(value AS DECIMAL(38,10))) AS STRING)
        |    AS DOUBLE), 6) AS revenue
        |FROM rev GROUP BY 1, 2
        |""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val f = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort"))
      ev.filter(col("event_type") === "purchase").join(f, "user_id")
        .select(col("user_id"), col("cohort"),
          expr("datediff(date_trunc('week', ts), cohort) div 7").as("age"),
          col("value"))
        .groupBy(col("cohort").cast("timestamp_ntz").as("cohort"),
          col("age").cast("long").as("age"))
        .agg(countDistinct(col("user_id")).as("buyers"),
          round(sumExact(col("value")), 6).as("revenue"))
    },

    // ---- daily-volume autocorrelation ------------------------------------
    // Sample ACF of the daily event-count series at lags 1..7 — the
    // "is traffic weekly-periodic?" diagnostic that decides whether a
    // seasonality model is worth fitting. The series is the BOUNDED
    // per-day aggregate (≤ a few thousand rows at any corpus size), so
    // the lag alignment is a broadcast self-join on day+k — never a
    // window over raw events. Gap-robust: pairs counts the MATCHED
    // (t, t+k) days, so the mean-centering identity
    //   Σ(xₜ−x̄)(xₜ₊ₖ−x̄) = pk − x̄(shead+stail) + pairs·x̄²
    // holds on an irregular grid too. All moments are DECIMAL(38,0)-
    // exact (BIGINT would overflow at ~1e9 events/day · 10 yr since
    // the identity multiplies through by n²); the two operands take
    // the string-roundtrip double cast (the one cast both engines
    // round identically) and the ratio is the only float op.
    QDef("q_autocorr",
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
        |  CAST(sum(x) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(x*x) AS DECIMAL(38,0)) AS sq FROM d),
        |l AS (SELECT k.k, CAST(count(*) AS DECIMAL(38,0)) AS pairs,
        |    CAST(sum(a.x * b.x) AS DECIMAL(38,0)) AS pk,
        |    CAST(sum(a.x) AS DECIMAL(38,0)) AS shead,
        |    CAST(sum(b.x) AS DECIMAL(38,0)) AS stail
        |  FROM d a JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) k(k) ON true
        |  JOIN d b ON b.day = a.day + k.k
        |  GROUP BY 1)
        |SELECT CAST(k AS BIGINT) AS lag, CAST(pairs AS BIGINT) AS pairs,
        |  round(CAST(CAST(n*n*pk - n*sx*(shead+stail) + pairs*sx*sx AS STRING)
        |      AS DOUBLE)
        |    / CAST(CAST(n*(n*sq - sx*sx) AS STRING) AS DOUBLE), 6) AS acf
        |FROM l CROSS JOIN s
        |""".stripMargin) { (s, dir) =>
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val d = table(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      val stats = d.agg(d38(count(lit(1))).as("n"), d38(sum(col("x"))).as("sx"),
        d38(sum(col("x") * col("x"))).as("sq"))
      val ks = s.range(1, 8).select(col("id").cast("int").as("k"))
      val lagged = d.crossJoin(broadcast(ks))
        .select(col("k"), col("x").as("xa"), date_add(col("day"), col("k")).as("tday"))
        .join(broadcast(d.select(col("day").as("tday"), col("x").as("xb"))), "tday")
        .groupBy(col("k")).agg(d38(count(lit(1))).as("pairs"),
          d38(sum(col("xa") * col("xb"))).as("pk"),
          d38(sum(col("xa"))).as("shead"), d38(sum(col("xb"))).as("stail"))
      val str2d = (c: Column) => c.cast("string").cast("double")
      lagged.crossJoin(broadcast(stats))
        .select(col("k").cast("long").as("lag"), col("pairs").cast("long").as("pairs"),
          round(str2d(col("n") * col("n") * col("pk")
              - col("n") * col("sx") * (col("shead") + col("stail"))
              + col("pairs") * col("sx") * col("sx"))
            / str2d(col("n") * (col("n") * col("sq") - col("sx") * col("sx"))),
            6).as("acf"))
    },

    // ---- seasonal-naive forecast evaluation --------------------------------
    // MAE of the lag-1 (naive) and lag-7 (seasonal-naive) forecasts of
    // the daily volume series — the standard "is there exploitable
    // weekly structure?" companion to q_autocorr: if MAE₇ < MAE₁ the
    // seasonal model has skill. Same scale shape as the ACF: the lag
    // alignment is a broadcast self-join on the BOUNDED per-day
    // aggregate, never a window over raw events. The error sums are
    // integer-exact; the per-lag MAE is one exact-int division.
    QDef("q_seasonal_naive",
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events GROUP BY 1),
        |e AS (SELECT k.k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(abs(a.x - b.x)) AS BIGINT) AS sae
        |  FROM d a JOIN (VALUES (1),(7)) k(k) ON true
        |  JOIN d b ON b.day = a.day + k.k GROUP BY 1)
        |SELECT CAST(k AS BIGINT) AS lag, n, sae,
        |  round(CAST(sae AS DOUBLE) / n, 6) AS mae
        |FROM e
        |""".stripMargin) { (s, dir) =>
      val d = table(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      val ks = s.sql("SELECT * FROM VALUES (1),(7) AS t(k)")
      d.crossJoin(broadcast(ks))
        .select(col("k"), col("x").as("xa"),
          date_add(col("day"), col("k")).as("tday"))
        .join(broadcast(d.select(col("day").as("tday"), col("x").as("xb"))),
          "tday")
        .groupBy(col("k")).agg(count(lit(1)).as("n"),
          sum(abs(col("xa") - col("xb"))).as("sae"))
        .select(col("k").cast("long").as("lag"), col("n"), col("sae"),
          round(col("sae").cast("double") / col("n"), 6).as("mae"))
    },

    // ---- inter-arrival burstiness ------------------------------------------
    // Histogram of users by squared coefficient of variation of their
    // inter-arrival gaps — the bot/burst-traffic triage: CV²≈1 is
    // Poisson arrivals (bucket 10), CV²≫1 bursty, CV²≪1 metronomic.
    // ENTIRELY integer: gaps are floored epoch seconds, the bucket is
    // the all-BIGINT floor division ⌊10·n·(n·Σg²−S²) / ((n−1)·S²)⌋
    // (numerator/denominator both nonnegative, so Spark `div` and
    // DuckDB `//` agree), capped at 30 — no float op anywhere, so no
    // cross-engine rounding surface at all. The per-user fold is a
    // key-partitioned window (scales out); magnitudes: S ≤ span ≤
    // 3e8 s (10 yr), n·Σg² ≤ n·S·max_gap — BIGINT-safe through ~1e5
    // events/user·decade; beyond that escalate the three moments to
    // DECIMAL(38,0), the q_autocorr move.
    QDef("q_burstiness",
      """WITH g AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
        |      - lag(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(gap) AS BIGINT) AS s, CAST(sum(gap*gap) AS BIGINT) AS q
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1 HAVING count(*) >= 2)
        |SELECT CAST(least((10 * n * (n*q - s*s)) // ((n-1) * s * s), 30)
        |    AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM m GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val sec = expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000")
      table(s, dir, "events")
        .select(col("user_id"), (sec - lag(sec, 1).over(w)).as("gap"))
        .filter(col("gap").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(col("gap")).as("s"),
          sum(col("gap") * col("gap")).as("q"))
        .filter(col("n") >= 2)
        .groupBy(least(
            expr("(10 * n * (n*q - s*s)) div ((n-1) * s * s)"),
            lit(30L)).as("bucket"))
        .agg(count(lit(1)).as("n_users"))
    },

    // ---- Benford first-digit audit -----------------------------------------
    // First-significant-digit distribution of order totals vs the
    // Benford expectation log₁₀(1+1/d) — the classic synthetic-data /
    // fraud audit (TPC-H's uniform prices fail it loudly, which is the
    // point: the query DETECTS generator artifacts). Exact-integer
    // spine: cents recovered via the DECIMAL(18,2) convention, first
    // digit = first char of the BIGINT's string form (identical
    // rendering in both engines — no float log on the data path). The
    // only transcendental is the 9-value Benford CONSTANT column;
    // safe at round-6dp because the closest of the nine values to a
    // rounding boundary (log₁₀(1.25) ≈ 0.0969100130) is still 4.9e-7
    // away — a libm 1-ulp divergence (~1e-17) cannot cross it.
    // Scale shape: one hash agg over the scan + a 1-row total
    // broadcast; output ≤ 9 rows.
    QDef("q_benford",
      """WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice > 0),
        |n AS (SELECT CAST(substr(CAST(cents AS STRING), 1, 1) AS BIGINT) AS digit,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM n)
        |SELECT digit, n_orders,
        |  round(CAST(n_orders AS DOUBLE) / total, 6) AS share,
        |  round(log10(1.0 + 1.0 / digit), 6) AS benford
        |FROM n, t
        |""".stripMargin) { (s, dir) =>
      val n = table(s, dir, "orders")
        .filter(col("o_totalprice") > 0)
        .select((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("bigint").as("cents"))
        .groupBy(substring(col("cents").cast("string"), 1, 1)
          .cast("bigint").as("digit"))
        .agg(count(lit(1)).as("n_orders"))
      val t = n.agg(sum(col("n_orders")).as("total"))
      n.crossJoin(broadcast(t))
        .select(col("digit"), col("n_orders"),
          round(col("n_orders").cast("double") / col("total"), 6).as("share"),
          round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("benford"))
    },

    // ---- Heaps-law vocabulary growth ---------------------------------------
    // Cumulative distinct-vocabulary size vs cumulative token count at
    // doubling checkpoints of the doc_id order — the "is the corpus
    // still teaching the tokenizer new words?" curve (Heaps' law:
    // V ≈ K·nᵝ; a flattening curve means diminishing returns for
    // further ingestion). Checkpoint = bit length of doc_id
    // (length(bin(x)), the q_graph_degree_dist move — bin(0)='0' has
    // length 1 in both engines), so the curve has ≤64 points at ANY
    // corpus size. A token's first checkpoint is one min() — the
    // first-seen reduction (q_cume_distinct's move) — so no running
    // DISTINCT ever materializes; the only unpartitioned window is
    // the cumulative sum over the ≤64-row checkpoint table. All
    // integer.
    QDef("q_vocab_growth",
      """WITH tok AS (
        |  SELECT length(bin(d.doc_id)) AS b, t.term
        |  FROM documents d, unnest(string_split(trim(d.text), ' ')) AS t(term)
        |  WHERE t.term <> ''),
        |bt AS (SELECT b, CAST(count(*) AS BIGINT) AS toks FROM tok GROUP BY 1),
        |f AS (SELECT term, min(b) AS fb FROM tok GROUP BY 1),
        |bv AS (SELECT fb AS b, CAST(count(*) AS BIGINT) AS vnew FROM f GROUP BY 1),
        |j AS (SELECT bt.b, bt.toks, coalesce(bv.vnew, 0) AS vnew
        |  FROM bt LEFT JOIN bv USING (b))
        |SELECT CAST(b AS BIGINT) AS bucket,
        |  CAST(sum(toks) OVER (ORDER BY b) AS BIGINT) AS cum_tokens,
        |  CAST(sum(vnew) OVER (ORDER BY b) AS BIGINT) AS cum_vocab
        |FROM j
        |""".stripMargin) { (s, dir) =>
      val tok = table(s, dir, "documents")
        .select(length(bin(col("doc_id"))).cast("bigint").as("b"),
          explode(split(trim(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
      val bt = tok.groupBy("b").agg(count(lit(1)).as("toks"))
      val bv = tok.groupBy("term").agg(min(col("b")).as("fb"))
        .groupBy(col("fb").as("b")).agg(count(lit(1)).as("vnew"))
      val w = Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bt.join(bv, Seq("b"), "left")
        .na.fill(0L, Seq("vnew"))
        .select(col("b").as("bucket"),
          sum(col("toks")).over(w).as("cum_tokens"),
          sum(col("vnew")).over(w).as("cum_vocab"))
    },

    // ---- market-basket lift ----------------------------------------------
    // Top-25 co-purchased part pairs by support, scored with lift =
    // n·supp(p1,p2) / (supp(p1)·supp(p2)) — the association-rule
    // staple (q_cooccur_lift's sibling on the basket fact). Pairs come
    // from per-order part SETS (one groupBy, no fact self-join — the
    // co-purchase construction, support kept this time); the ORDER is
    // the integer support with (p1, p2) tie-break, lift is reported,
    // never sorted on (float sort keys order near-ties differently
    // across engines). Supports are distinct-order counts: a part
    // twice in one order is one basket.
    QDef("q_basket_lift",
      """WITH n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
        |s AS (SELECT l_partkey, count(DISTINCT l_orderkey) AS supp
        |      FROM lineitem GROUP BY 1),
        |pr AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
        |    count(DISTINCT a.l_orderkey) AS supp_pair
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 3)
        |SELECT pr.p1, pr.p2, CAST(supp_pair AS BIGINT) AS supp_pair,
        |  round(supp_pair * CAST(n_orders AS DOUBLE) / (s1.supp * s2.supp), 6)
        |    AS lift
        |FROM pr JOIN s s1 ON s1.l_partkey = pr.p1
        |  JOIN s s2 ON s2.l_partkey = pr.p2, n
        |ORDER BY supp_pair DESC, pr.p1, pr.p2 LIMIT 25
        |""".stripMargin) { (s, dir) =>
      val li = table(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      val pairs = li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))
            |""".stripMargin)).as("pr"))
        .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("supp_pair"))
        .filter(col("supp_pair") >= 3)
      val supp = li.groupBy("l_partkey")
        .agg(countDistinct(col("l_orderkey")).as("supp"))
      val n = li.agg(countDistinct(col("l_orderkey")).as("n_orders"))
      pairs
        .join(supp.select(col("l_partkey").as("p1"), col("supp").as("s1")), "p1")
        .join(supp.select(col("l_partkey").as("p2"), col("supp").as("s2")), "p2")
        .crossJoin(broadcast(n))
        .select(col("p1"), col("p2"), col("supp_pair"),
          round(col("supp_pair") * col("n_orders").cast("double") /
            (col("s1") * col("s2")), 6).as("lift"))
        .orderBy(col("supp_pair").desc, col("p1"), col("p2"))
        .limit(25)
    },

    // ---- windowed funnel -------------------------------------------------
    // Three-step view→click→purchase funnel anchored at each user's
    // FIRST view, steps ordered and the whole window bounded at 3 days
    // from the anchor (the first-touch-anchored variant — deterministic
    // and relational, unlike best-anchor scan semantics: three
    // conditional-min aggregations, all keyed on user_id, co-partitioned
    // shuffles, no per-user state beyond three timestamps).
    QDef("q_funnel_window",
      """WITH v AS (
        |  SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t1
        |  FROM events GROUP BY 1),
        |c2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.t1
        |    AND e.ts <= v.t1 + INTERVAL 3 DAY
        |  GROUP BY 1),
        |p3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |    JOIN c2 ON e.user_id = c2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c2.t2
        |    AND e.ts <= v.t1 + INTERVAL 3 DAY
        |  GROUP BY 1),
        |d AS (
        |  SELECT v.user_id,
        |    CASE WHEN t1 IS NULL THEN 0
        |         WHEN c2.user_id IS NULL THEN 1
        |         WHEN p3.user_id IS NULL THEN 2 ELSE 3 END AS depth
        |  FROM v LEFT JOIN c2 ON v.user_id = c2.user_id
        |    LEFT JOIN p3 ON v.user_id = p3.user_id)
        |SELECT CAST(depth AS BIGINT) AS depth,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM d GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val v = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"))
      val c2 = ev.join(v, "user_id")
        .filter(col("event_type") === "click" && col("ts") >= col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 3 DAY"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p3 = ev.join(v, "user_id").join(c2, "user_id")
        .filter(col("event_type") === "purchase" && col("ts") >= col("t2") &&
          col("ts") <= col("t1") + expr("INTERVAL 3 DAY"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      // assembly WITHOUT the outer joins the oracle spells: each stage
      // only exists when its predecessor does, so per-user depth is the
      // max over tagged stage rows — one union + one keyed aggregation
      // instead of two O(users)-sized outer joins (which can neither
      // broadcast at scale nor beat a plain regroup)
      v.select(col("user_id"),
          when(col("t1").isNull, 0).otherwise(1).as("d"))
        .unionAll(c2.select(col("user_id"), lit(2).as("d")))
        .unionAll(p3.select(col("user_id"), lit(3).as("d")))
        .groupBy("user_id").agg(max(col("d")).as("dep"))
        .groupBy(col("dep").cast("long").as("depth"))
        .agg(count(lit(1)).as("n_users"))
    }
  )
}

/** Process-level memo for the co-purchase edge table (the dedup
  * family's pairsMemo shape): cached once per (session, sfDir), served
  * to every graph query, released in `DedupOps.clearMemos`'s sweep so
  * repeat bench runs pay the full derivation. */
private[operators] object GraphMemo {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]
  private val hits = scala.collection.concurrent.TrieMap.empty[String, Unit]

  def edges(s: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    val key = (s, dir)
    if (memo.contains(key)) hits.put("copurchase", ())
    // materialized as a loopInput CHECKPOINT, not a .cache(): the
    // first (memo-cold) consumer then pays exactly the derivation +
    // one checkpoint write it already paid pre-memo — an extra cache
    // layer on top measured +0.5-1.2 s per cold graph query at sf0.1.
    // The backing RDD rides liveCkpts, released by clearMemos' sweep.
    memo.getOrElseUpdate(key, DedupOps.loopInput(build))
  }

  def drainHits(): Set[String] = {
    val h = hits.keySet.toSet
    hits.clear()
    h
  }

  def clear(): Unit = {
    // the backing checkpoint RDDs are unpersisted by the liveCkpts
    // drain that precedes this call; only the references drop here
    memo.clear()
    hits.clear()
  }
}
