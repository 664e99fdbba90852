package graft.operators

import graft._
import graft.plans.OrderedPrefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension wave 3: value-ordered prefix analytics over the
  * [[graft.plans.OrderedPrefix]] two-phase machinery (record highs,
  * revenue Pareto curve, per-language quality terciles) plus three
  * keyed-window behavioral staples (event trigrams, inter-arrival gap
  * percentiles, rolling active users).
  *
  * The first three are the queries that classically hide a data-sized
  * single-partition window (`OVER (ORDER BY ts)`, `OVER (ORDER BY
  * revenue DESC)`, `NTILE(3) OVER (PARTITION BY lang ...)` with a
  * handful of languages). Each runs the range-bucketed two-phase plan
  * instead: the only unpartitioned window is over ≤254 bucket-summary
  * rows, every per-row window partitions by (key, bucket), and decimal
  * accumulation keeps the running sums bit-identical to the oracle's
  * sequential window at any parallelism.
  *
  * Reference scope: the reference materializes CDC rows into Postgres
  * and leaves analytics to SQL on the mirror (README.md:1-40); these are
  * the mirror-side analytics a consumer of the same tables runs,
  * re-expressed Spark-first per SURVEY.md §2-B.
  */
object Coverage13 {

  val defs: Seq[QDef] = Seq(

    // ---- running record highs (global value order, two-phase) ------------
    // "Did this event set a new all-time record?" needs the strictly-
    // before prefix max in (ts, event_id) order — the canonical
    // `OVER (ORDER BY ts)` scale-killer, here OrderedPrefix.runningMax
    // (exclusive): bucket by time range, prefix-max over ≤254 bucket
    // summaries, intra-bucket windows partitioned by bucket. Per-day
    // rollup: events, new records, and the running high at day close
    // (max over the day of the inclusive prefix max — prefix max is
    // monotone, so the day's max IS the day-close value).
    QDef("q_record_highs",
      """WITH m AS (
        |  SELECT ts, value,
        |    max(value) OVER (ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |  FROM events)
        |SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(*) FILTER (WHERE prev IS NULL OR value > prev) AS BIGINT)
        |    AS n_records,
        |  max(CASE WHEN prev IS NULL OR value > prev THEN value ELSE prev END)
        |    AS day_high
        |FROM m GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      // unix_micros is an order-faithful double (µs magnitudes ≪ 2^53)
      OrderedPrefix.runningMax(ev, Nil,
          unix_micros(col("ts").cast("timestamp")), col("event_id"),
          col("value"), "prev", inclusive = false)
        .select(col("ts").cast("date").as("day"), col("value"), col("prev"))
        .withColumn("is_rec", col("prev").isNull || col("value") > col("prev"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_events"),
          count(when(col("is_rec"), 1)).as("n_records"),
          max(greatest(col("prev"), col("value"))).as("day_high"))
    },

    // ---- revenue Pareto curve (how many parts cover X% of revenue) -------
    // Rank parts by revenue desc + cumulative revenue share — the
    // `OVER (ORDER BY revenue DESC)` scale-killer, run as
    // OrderedPrefix.rankSum: exact decimal running totals (order-
    // independent, so the two-phase sum equals the oracle's sequential
    // window bit-for-bit), ranks from bucket count offsets. The share
    // divides two identical exact decimals cast to double on both
    // engines, so threshold comparisons can't flip cross-engine.
    QDef("q_revenue_pareto",
      """WITH rev AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)))
        |      AS revd
        |  FROM lineitem GROUP BY 1),
        |r AS (
        |  SELECT l_partkey, revd,
        |    CAST(row_number() OVER w AS BIGINT) AS rk,
        |    CAST(sum(revd) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS DECIMAL(38,10)) AS cum
        |  FROM rev
        |  WINDOW w AS (ORDER BY CAST(CAST(revd AS STRING) AS DOUBLE) DESC,
        |               l_partkey)),
        |tot AS (
        |  SELECT CAST(CAST(SUM(revd) AS STRING) AS DOUBLE) AS tot,
        |    CAST(count(*) AS BIGINT) AS np
        |  FROM rev),
        |s AS (
        |  SELECT rk, CAST(CAST(cum AS STRING) AS DOUBLE) / tot AS share, np
        |  FROM r, tot),
        |th AS (SELECT CAST(unnest([0.5, 0.75, 0.9, 0.95, 0.99]) AS DOUBLE)
        |         AS threshold)
        |SELECT threshold,
        |  CAST(min(rk) FILTER (WHERE share >= threshold) AS BIGINT) AS n_parts,
        |  round(CAST(min(rk) FILTER (WHERE share >= threshold) AS DOUBLE)
        |        / max(np), 6) AS pct_parts
        |FROM th CROSS JOIN s GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      // loopInput (lazy localCheckpoint): the 20k-row revenue aggregate
      // feeds the two-phase rank, the range bounds, AND the 1-row total
      // — materialized once instead of re-aggregating lineitem 3×.
      val rev = DedupOps.loopInput(table(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revd")))
      val ranked = OrderedPrefix.rankSum(rev, Nil,
        -col("revd").cast("double"), col("l_partkey"), col("revd"), "rk", "cum")
      val tot = rev.agg(sum(col("revd")).cast("double").as("tot"),
        count(lit(1)).as("np"))
      val shared = ranked.crossJoin(broadcast(tot))
        .select(col("rk"), (col("cum").cast("double") / col("tot")).as("share"),
          col("np"))
      val ths = Seq(0.5, 0.75, 0.9, 0.95, 0.99)
      val mins = ths.zipWithIndex.map { case (t, i) =>
        min(when(col("share") >= t, col("rk"))).as(s"r$i")
      }
      shared.groupBy()
        .agg(mins.head, mins.tail :+ max(col("np")).as("np"): _*)
        .select(expr("stack(5, " + ths.zipWithIndex
            .map { case (t, i) => s"${t}D, r$i" }.mkString(", ") +
            ") as (threshold, n_parts)"),
          col("np"))
        .select(col("threshold"), col("n_parts"),
          round(col("n_parts").cast("double") / col("np"), 6).as("pct_parts"))
    },

    // ---- CCNet-style per-language quality terciles -----------------------
    // Bucket each language's documents into head/middle/tail thirds of a
    // quality score — NTILE(3) PARTITION BY lang, which serializes into
    // one task per language on a plain window (5 languages → 5 tasks
    // scanning 1/5 of a 100 TB corpus each). OrderedPrefix.rank with
    // keys=lang gives the per-language rank range-bucketed (parallel in
    // lang × 254 buckets); the tile is then pure arithmetic on (rank,
    // count) reproducing SQL NTILE's remainder rule (first `count mod 3`
    // tiles get the extra row).
    QDef("q_ccnet_buckets",
      """WITH sc AS (
        |  SELECT doc_id, lang,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS score
        |  FROM documents WHERE length(text) > 0),
        |t AS (
        |  SELECT lang, score,
        |    ntile(3) OVER (PARTITION BY lang ORDER BY score, doc_id) AS tile
        |  FROM sc)
        |SELECT lang, CAST(tile AS BIGINT) AS tile,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  round(min(score), 6) AS lo_score,
        |  round(max(score), 6) AS hi_score
        |FROM t GROUP BY 1, 2
        |""".stripMargin) { (s, dir) =>
      // loopInput: the scored projection feeds the per-key rank, its
      // range bounds, and the per-language counts — checkpointing the
      // (doc_id, lang, score) rows runs the regexp scan once, not 3×.
      // Empty documents are filtered BEFORE scoring on both engines: a
      // 0-length text yields a null score, which OrderedPrefix would
      // drop from the rank while `cnt` still counted it, skewing the
      // NTILE arithmetic (round-7 advice #2 — latent until a corpus
      // regeneration ships an empty text).
      val sc = DedupOps.loopInput(table(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("lang"),
          (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
            / length(col("text"))).as("score")))
      val ranked = OrderedPrefix.rank(sc, Seq("lang"), col("score"),
        col("doc_id"), "rk")
      val cnts = sc.groupBy("lang").agg(count(lit(1)).as("cnt"))
      // NTILE(3): q = cnt div 3, r = cnt mod 3; tiles 1..r have q+1 rows.
      // greatest(q,1) only guards the (rank > r*(q+1) ⇒ q ≥ 1) else-branch
      // against ANSI div-by-zero on languages with < 3 documents.
      ranked.join(broadcast(cnts), "lang")
        .withColumn("q", expr("cnt div 3")).withColumn("r", col("cnt") % 3)
        .withColumn("tile",
          when(col("rk") <= col("r") * (col("q") + 1),
            expr("(rk - 1) div (q + 1)") + 1)
            .otherwise(col("r") + 1 +
              expr("(rk - r * (q + 1) - 1) div greatest(q, 1)")))
        .groupBy("lang", "tile")
        .agg(count(lit(1)).as("n_docs"),
          round(min(col("score")), 6).as("lo_score"),
          round(max(col("score")), 6).as("hi_score"))
    },

    // ---- top event-type trigrams (behavioral sequence mining) ------------
    // Per-user ordered lag windows (keyed — parallel across users at any
    // scale) → corpus-wide counts → TakeOrderedAndProject for the top 25
    // (per-partition heaps, k-row driver merge, never a global sort).
    // Ties at the cut break deterministically by trigram text.
    QDef("q_event_trigrams",
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 2) OVER w AS a, lag(event_type, 1) OVER w AS b
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |t AS (SELECT a || '>' || b || '>' || event_type AS trigram
        |      FROM s WHERE a IS NOT NULL)
        |SELECT trigram, CAST(count(*) AS BIGINT) AS n
        |FROM t GROUP BY 1
        |ORDER BY n DESC, trigram LIMIT 25
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .select(col("event_type"),
          lag(col("event_type"), 2).over(w).as("a"),
          lag(col("event_type"), 1).over(w).as("b"))
        .filter(col("a").isNotNull)
        .select(concat_ws(">", col("a"), col("b"), col("event_type"))
          .as("trigram"))
        .groupBy("trigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("trigram")).limit(25)
    },

    // ---- inter-arrival gap percentiles per event type --------------------
    // Gap = µs since the user's previous event (keyed lag window); exact
    // p50/p90 via the shared cume_dist construction (q_percentile_disc's
    // "smallest value with cume_dist ≥ p" — one window sort per event
    // type, the exact-percentile cost floor; approx_percentile is the
    // sketch path when that suffices). All-integer µs arithmetic — no
    // float drift cross-engine.
    QDef("q_gap_stats",
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) AS gap_us
        |  FROM events),
        |r AS (
        |  SELECT event_type, gap_us,
        |    cume_dist() OVER (PARTITION BY event_type ORDER BY gap_us) AS cd
        |  FROM g WHERE gap_us IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(min(gap_us) AS BIGINT) AS min_gap_us,
        |  CAST(max(gap_us) AS BIGINT) AS max_gap_us,
        |  CAST(min(gap_us) FILTER (WHERE cd >= 0.5) AS BIGINT) AS p50_gap_us,
        |  CAST(min(gap_us) FILTER (WHERE cd >= 0.9) AS BIGINT) AS p90_gap_us
        |FROM r GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val wu = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val g = table(s, dir, "events")
        .select(col("event_type"),
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(lag(col("ts"), 1).over(wu).cast("timestamp")))
            .as("gap_us"))
        .filter(col("gap_us").isNotNull)
      val we = Window.partitionBy("event_type").orderBy("gap_us")
      g.select(col("event_type"), col("gap_us"),
          cume_dist().over(we).as("cd"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_us")).as("min_gap_us"),
          max(col("gap_us")).as("max_gap_us"),
          min(when(col("cd") >= 0.5, col("gap_us"))).as("p50_gap_us"),
          min(when(col("cd") >= 0.9, col("gap_us"))).as("p90_gap_us"))
    },

    // ---- rolling 7-day active users (DAU / WAU) --------------------------
    // COUNT(DISTINCT) OVER a sliding range isn't windowable; the
    // distributed shape is contribute-then-aggregate: dedup to user-days,
    // explode each into the ≤7 window days it serves, keep days that
    // exist in the data, and count distinct per day. Shuffle volume is
    // 7 × |user-days| (already deduped), independent of raw event count.
    QDef("q_rolling_active_users",
      """WITH ud AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM ud),
        |wau AS (
        |  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
        |  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY 1),
        |dau AS (
        |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM ud GROUP BY 1)
        |SELECT day, dau.dau, wau.wau
        |FROM wau JOIN dau USING (day)
        |""".stripMargin) { (s, dir) =>
      val ud = table(s, dir, "events")
        .select(col("ts").cast("date").as("day"), col("user_id")).distinct()
      val days = ud.select("day").distinct()
      val wau = ud.withColumn("o", explode(sequence(lit(0), lit(6))))
        .select(date_add(col("day"), col("o")).as("day"), col("user_id"))
        .join(broadcast(days), "day")
        .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
      val dau = ud.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
      wau.join(dau, "day").select(col("day"), col("dau"), col("wau"))
    },

    // ---- cluster label purity (SemDeDup-style curation signal) -----------
    // Assign every vector to its nearest seed centroid (the shared IVF
    // assignment: broadcast centroids, map-side argmax_by — one row per
    // vector crosses the exchange) and score each cluster by majority-
    // label share. Low-purity clusters are the mixed/noisy regions a
    // curation pass inspects first. Votes and totals are two bounded
    // hash aggregations over (centroid, label) — nothing data-sized
    // shuffles twice; purity is an integer-ratio double, exact
    // cross-engine.
    QDef("q_cluster_purity",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
        |           WHERE vec_id % 97 = 0),
        |ax AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS a,
        |              unnest(c.cv) AS b
        |       FROM embeddings e CROSS JOIN c),
        |ad AS (SELECT vec_id, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na,
        |              sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM ax GROUP BY 1, 2),
        |asg AS (SELECT vec_id, cid,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id
        |            ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid)
        |            AS rn
        |        FROM ad),
        |a0 AS (SELECT vec_id, cid AS centroid_id FROM asg WHERE rn = 1),
        |v AS (SELECT a0.centroid_id, e.label, CAST(count(*) AS BIGINT) AS votes
        |      FROM a0 JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
        |t AS (SELECT centroid_id, CAST(sum(votes) AS BIGINT) AS n_members,
        |             max(votes) AS mx FROM v GROUP BY 1),
        |m AS (SELECT centroid_id, label FROM (
        |    SELECT centroid_id, label,
        |      ROW_NUMBER() OVER (PARTITION BY centroid_id
        |        ORDER BY votes DESC, label) AS rn
        |    FROM v) WHERE rn = 1)
        |SELECT t.centroid_id, t.n_members, m.label AS maj_label,
        |  round(CAST(t.mx AS DOUBLE) / t.n_members, 6) AS purity
        |FROM t JOIN m USING (centroid_id)
        |""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val asg = SimilarityOps.ivfAssign(e.select("vec_id", "embedding"), 97)
      val votes = asg.select("vec_id", "centroid_id")
        .join(e.select("vec_id", "label"), "vec_id")
        .groupBy("centroid_id", "label").agg(count(lit(1)).as("votes"))
      votes.groupBy("centroid_id")
        .agg(sum(col("votes")).as("n_members"),
          max(col("votes")).as("mx"),
          call_function("argmax_by", col("label"),
            col("votes").cast("double"), col("label").cast("bigint"))
            .as("maj_label"))
        .select(col("centroid_id"), col("n_members"), col("maj_label"),
          round(col("mx").cast("double") / col("n_members"), 6).as("purity"))
    },

    // ---- per-cluster embedding outliers (z-score pruning signal) ---------
    // Vectors far from their own centroid (z ≤ −1.5 on the within-cluster
    // cosine distribution) are the mislabeled/noise candidates a pruning
    // pass drops. Cross-engine float parity trick: the rounded cosine is
    // scaled to an exact INTEGER (c6 = round(cos·1e6)), so the per-
    // cluster sums and sums-of-squares are exact integer arithmetic and
    // mean/std/z derive from identical doubles on both engines — scale
    // cancels in z, so no decimal-quantum drift is possible. Shape: one
    // broadcast centroid join + two bounded aggregations; degenerate
    // clusters (n ≤ 1 or zero variance) drop via the std > 0 guard
    // (NaN/∞ compare false in both engines).
    QDef("q_embed_outliers",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
        |           WHERE vec_id % 97 = 0),
        |ax AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS a,
        |              unnest(c.cv) AS b
        |       FROM embeddings e CROSS JOIN c),
        |ad AS (SELECT vec_id, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na,
        |              sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM ax GROUP BY 1, 2),
        |asg AS (SELECT vec_id, cid, round(dot / (sqrt(na) * sqrt(nb)), 6) AS d,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id
        |            ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid)
        |            AS rn
        |        FROM ad),
        |wc AS (SELECT vec_id, cid AS centroid_id, d AS cos,
        |              CAST(round(d * 1000000, 0) AS BIGINT) AS c6
        |       FROM asg WHERE rn = 1),
        |st AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(c6) AS BIGINT) AS s,
        |              CAST(sum(c6 * c6) AS BIGINT) AS ss
        |       FROM wc GROUP BY 1),
        |sd AS (SELECT centroid_id, n, CAST(s AS DOUBLE) / n AS m,
        |         sqrt((CAST(ss AS DOUBLE) - n * (CAST(s AS DOUBLE) / n)
        |               * (CAST(s AS DOUBLE) / n)) / CAST(n - 1 AS DOUBLE))
        |           AS sdev
        |       FROM st)
        |SELECT w.vec_id, w.centroid_id, w.cos,
        |  round((CAST(w.c6 AS DOUBLE) - sd.m) / sd.sdev, 4) AS z
        |FROM wc w JOIN sd USING (centroid_id)
        |WHERE sd.sdev > 0
        |  AND (CAST(w.c6 AS DOUBLE) - sd.m) / sd.sdev <= -1.5
        |""".stripMargin) { (s, dir) =>
      import graft.functions.VectorOps
      val e = table(s, dir, "embeddings")
      val asg = SimilarityOps.ivfAssign(e.select("vec_id", "embedding"), 97)
      val cents = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val wc = asg.join(broadcast(cents), col("centroid_id") === col("cid"))
        .withColumn("cos", round(VectorOps.cosine(col("embedding"), col("cv")), 6))
        .select(col("vec_id"), col("centroid_id"), col("cos"),
          round(col("cos") * 1000000, 0).cast("long").as("c6"))
      val st = wc.groupBy("centroid_id")
        .agg(count(lit(1)).as("n"), sum(col("c6")).as("s"),
          sum(col("c6") * col("c6")).as("ss"))
      val m = col("s").cast("double") / col("n")
      val sd = st.select(col("centroid_id"), col("n"), m.as("m"),
        sqrt((col("ss").cast("double") - col("n") * m * m)
          / (col("n") - 1).cast("double")).as("sdev"))
      wc.join(broadcast(sd), "centroid_id")
        .withColumn("z_raw", (col("c6").cast("double") - col("m")) / col("sdev"))
        .filter(col("sdev") > 0 && col("z_raw") <= -1.5)
        .select(col("vec_id"), col("centroid_id"), col("cos"),
          round(col("z_raw"), 4).as("z"))
    },

    // ---- SemDeDup: within-cluster semantic near-duplicates ---------------
    // Cluster-bucketed candidate generation (the SemDeDup recipe:
    // near-dups land in the same k-means cell, so only within-cluster
    // pairs are scored — candidates bound by Σ|cluster|², never N²) with
    // exact cosine verification and lowest-id survivorship. The
    // per-cluster self-join co-locates on centroid_id (ONE exchange pair
    // at any scale), norms precompute per vector, and the same 0.4
    // threshold as the id-band anchor q_dedup_embedding keeps the two
    // candidate generators comparable. Output: per-cluster members,
    // duplicate pairs, and vectors a pruning pass would drop.
    QDef("q_dedup_semantic",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
        |           WHERE vec_id % 97 = 0),
        |ax AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS a,
        |              unnest(c.cv) AS b
        |       FROM embeddings e CROSS JOIN c),
        |ad AS (SELECT vec_id, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na,
        |              sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM ax GROUP BY 1, 2),
        |asg AS (SELECT vec_id, cid,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id
        |            ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid)
        |            AS rn
        |        FROM ad),
        |a0 AS (SELECT vec_id, cid AS centroid_id FROM asg WHERE rn = 1),
        |p AS (SELECT a1.centroid_id, a1.vec_id AS v1, a2.vec_id AS v2
        |      FROM a0 a1 JOIN a0 a2 ON a1.centroid_id = a2.centroid_id
        |        AND a2.vec_id > a1.vec_id),
        |px AS (SELECT p.centroid_id, p.v1, p.v2, unnest(e1.embedding) AS a,
        |              unnest(e2.embedding) AS b
        |       FROM p JOIN embeddings e1 ON e1.vec_id = p.v1
        |              JOIN embeddings e2 ON e2.vec_id = p.v2),
        |pd AS (SELECT centroid_id, v1, v2, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na,
        |              sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM px GROUP BY 1, 2, 3),
        |dup AS (SELECT centroid_id, v1, v2 FROM pd
        |        WHERE round(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.4),
        |mem AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_members
        |        FROM a0 GROUP BY 1),
        |ds AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |              CAST(count(DISTINCT v2) AS BIGINT) AS n_pruned
        |       FROM dup GROUP BY 1)
        |SELECT mem.centroid_id, mem.n_members,
        |  CAST(coalesce(ds.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  CAST(coalesce(ds.n_pruned, 0) AS BIGINT) AS n_pruned
        |FROM mem LEFT JOIN ds USING (centroid_id)
        |""".stripMargin) { (s, dir) =>
      import graft.functions.VectorOps
      val e = table(s, dir, "embeddings")
      val asg = SimilarityOps.ivfAssign(e.select("vec_id", "embedding"), 97)
        .withColumn("nsq", VectorOps.normSq(col("embedding")))
      val a = asg.select(col("centroid_id"), col("vec_id").as("v1"),
        col("embedding").as("e1"), col("nsq").as("n1"))
      val b = asg.select(col("centroid_id"), col("vec_id").as("v2"),
        col("embedding").as("e2"), col("nsq").as("n2"))
      val dup = a.join(b, Seq("centroid_id"))
        .filter(col("v2") > col("v1"))
        .withColumn("cos", round(VectorOps.dot(col("e1"), col("e2"))
          / (sqrt(col("n1")) * sqrt(col("n2"))), 6))
        .filter(col("cos") >= 0.4)
        .select(col("centroid_id"), col("v1"), col("v2"))
      val mem = asg.groupBy("centroid_id").agg(count(lit(1)).as("n_members"))
      val ds = dup.groupBy("centroid_id")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("v2")).as("n_pruned"))
      mem.join(ds, Seq("centroid_id"), "left")
        .select(col("centroid_id"), col("n_members"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_pruned"), lit(0L)).as("n_pruned"))
    },
  )
}
