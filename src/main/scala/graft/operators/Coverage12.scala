package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Round-7 extension wave 2: the CDC time-travel *diff*, the dedup
  * threshold tuning curve, the CDC churn histogram, and a per-document
  * information-density quality signal.
  *
  * q_state_delta is the audit dual of q_state_at / `CdcReplay --asof`
  * (reference: the materialized tables a CDC consumer maintains,
  * consumer/src/main/java/com/example/cdc/DebeziumToPostgresConsumer.java:204-241
  * — last-writer-wins per key): "what changed between T1 and T2" over the
  * event history. One hash aggregation computes both as-of states at once
  * — max over a (ts, event_id, …) struct is the last-writer-wins pick, and
  * the T1 state is the same max over a T1-guarded struct — so the whole
  * operator is a single map-side-combined groupBy, not two windows plus a
  * join. A key's state "changed" iff its latest event at T2 is newer than
  * T1, so the filter is simply s2.ts > T1.
  *
  * q_text_entropy is the character-entropy quality staple (low-entropy
  * docs are boilerplate/spam candidates). Entirely per-row higher-order
  * functions — zero shuffles at any corpus size — with the suite's
  * pinned-order double convention: both engines fold p·ln p terms in
  * sorted-distinct-char order, so the sums are bit-identical before the
  * 6-digit round, and `0.0 - sum` (not unary minus) keeps a degenerate
  * zero-entropy doc at +0.0 on both sides.
  */
object Coverage12 {

  val defs: Seq[QDef] = Seq(

    // ---- CDC state diff between two points in time ------------------------
    QDef("q_state_delta",
      """WITH h2 AS (
        |  SELECT user_id, ts, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'),
        |s2 AS (SELECT user_id, ts, event_id, value FROM h2 WHERE rn = 1),
        |h1 AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-08 00:00:00'),
        |s1 AS (SELECT user_id, event_id, value FROM h1 WHERE rn = 1)
        |SELECT s2.user_id,
        |  CASE WHEN s1.user_id IS NULL THEN 'new' ELSE 'changed' END AS change,
        |  s1.event_id AS old_event_id, s1.value AS old_value,
        |  s2.event_id AS new_event_id, s2.value AS new_value
        |FROM s2 LEFT JOIN s1 ON s1.user_id = s2.user_id
        |WHERE s2.ts > TIMESTAMP '2024-01-08 00:00:00'
        |""".stripMargin) { (s, dir) =>
      val t1 = lit("2024-01-08 00:00:00").cast("timestamp_ntz")
      val t2 = lit("2024-01-15 00:00:00").cast("timestamp_ntz")
      val st = struct(col("ts"), col("event_id"), col("value"))
      table(s, dir, "events")
        .filter(col("ts") <= t2)
        .groupBy("user_id")
        .agg(max(st).as("s2"), max(when(col("ts") <= t1, st)).as("s1"))
        .filter(col("s2.ts") > t1)
        .select(col("user_id"),
          when(col("s1").isNull, "new").otherwise("changed").as("change"),
          col("s1.event_id").as("old_event_id"),
          col("s1.value").as("old_value"),
          col("s2.event_id").as("new_event_id"),
          col("s2.value").as("new_value"))
    },

    // ---- duplicate-rate vs threshold tuning curve -------------------------
    // The dedup-tuning staple: how many near-dup pairs survive at each
    // candidate similarity cutoff. ONE exact pair computation (the
    // q_dedup_ngram_jaccard anchor at the loosest threshold) feeds six
    // conditional sums — a single 1-row aggregate, unpivoted by stack —
    // so the curve costs one pair scan, not six. The LSH / DF-capped
    // variants remain the 100 TB candidate-generation path; this row
    // pins the multi-threshold accounting.
    QDef("q_dedup_threshold_curve",
      s"""WITH ${DedupOps.shingleOracleCtes},
        |j AS (SELECT round(CAST(inter AS DOUBLE) / (s1.n + s2.n - inter), 6) AS jaccard
        |      FROM pairs JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
        |      WHERE round(CAST(inter AS DOUBLE) / (s1.n + s2.n - inter), 6) >= 0.7),
        |t AS (SELECT CAST(unnest([0.7, 0.75, 0.8, 0.85, 0.9, 0.95]) AS DOUBLE)
        |        AS threshold)
        |SELECT threshold, CAST(count(j.jaccard) AS BIGINT) AS n_pairs
        |FROM t LEFT JOIN j ON j.jaccard >= t.threshold
        |GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val ths = Seq(0.7, 0.75, 0.8, 0.85, 0.9, 0.95)
      val pairs = DedupOps.jaccardPairs(
        DedupOps.shingles(table(s, dir, "documents")), ths.head)
      val sums = ths.zipWithIndex.map { case (t, i) =>
        coalesce(sum(when(col("jaccard") >= t, 1L)), lit(0L)).as(s"c$i")
      }
      pairs.agg(sums.head, sums.tail: _*)
        .select(expr("stack(6, " +
          ths.zipWithIndex.map { case (t, i) => s"${t}D, c$i" }.mkString(", ") +
          ") as (threshold, n_pairs)"))
    },

    // ---- CDC churn audit: events-per-key histogram ------------------------
    // The hot-key profile that sizes a CDC materializer's compaction
    // cost (reference: one UPSERT round-trip per event, so a key's cost
    // is exactly its event count): how many keys receive N events, and
    // what share of total traffic each churn bucket carries. Two
    // bounded hash aggregations (key → count, count → histogram) plus a
    // broadcast 1-row total; the share is an integer-ratio division, so
    // the doubles are exact cross-engine.
    QDef("q_cdc_op_stats",
      """WITH pk AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |h AS (SELECT n AS events_per_key, CAST(count(*) AS BIGINT) AS n_keys
        |      FROM pk GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM events)
        |SELECT events_per_key, n_keys,
        |  round(events_per_key * n_keys / total, 6) AS event_share
        |FROM h, t
        |""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val hist = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
        .groupBy(col("n").as("events_per_key"))
        .agg(count(lit(1)).as("n_keys"))
      val tot = ev.agg(count(lit(1)).cast("double").as("total"))
      hist.crossJoin(broadcast(tot))
        .select(col("events_per_key"), col("n_keys"),
          round(col("events_per_key") * col("n_keys") / col("total"), 6)
            .as("event_share"))
    },

    // ---- per-document character entropy -----------------------------------
    QDef("q_text_entropy",
      """WITH t AS (
        |  SELECT doc_id, [c for c in string_split(text, '') if c <> ''] AS cs
        |  FROM documents),
        |d AS (SELECT doc_id, cs, list_sort(list_distinct(cs)) AS u FROM t),
        |n AS (
        |  SELECT doc_id, CAST(len(cs) AS BIGINT) AS n_chars,
        |    CAST(len(u) AS BIGINT) AS n_distinct,
        |    [len(list_filter(cs, x -> x = c)) for c in u] AS ns
        |  FROM d)
        |SELECT doc_id, n_chars, n_distinct,
        |  round(0.0 - list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      [(x / CAST(n_chars AS DOUBLE)) * ln(x / CAST(n_chars AS DOUBLE))
        |       for x in ns]),
        |    (a, b) -> a + b), 6) AS entropy
        |FROM n
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          expr("filter(split(text, ''), x -> x <> '')").as("cs"))
        .select(col("doc_id"), col("cs"),
          size(col("cs")).cast("long").as("n_chars"),
          expr("array_sort(array_distinct(cs))").as("u"))
        .select(col("doc_id"), col("n_chars"),
          size(col("u")).cast("long").as("n_distinct"),
          expr("transform(u, c -> size(filter(cs, x -> x = c)))").as("ns"))
        .select(col("doc_id"), col("n_chars"), col("n_distinct"),
          round(lit(0.0) - expr(
            """aggregate(ns, 0D, (a, n) ->
              |  a + (n / CAST(n_chars AS DOUBLE)) * ln(n / CAST(n_chars AS DOUBLE)))"""
              .stripMargin), 6).as("entropy"))
    },
  )
}
