package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Round-5 extension batch 3: cumulative distinct counting without a
  * distinct-over-window (the first-seen reduction), the map-type
  * function surface, and T5-style span corruption (the denoising-
  * objective preprocessing step of an LLM training pipeline).
  */
object Coverage8 {

  val defs: Seq[QDef] = Seq(

    // ---- cumulative distinct users per event type -------------------------
    // COUNT(DISTINCT) OVER a running window is unsupported (and
    // inherently O(n·window) done naively). The distributed answer:
    // reduce each (type, user) to its FIRST day, count new users per
    // day, and a running SUM of new users IS the running distinct
    // count. Two partial-agg exchanges plus a window over the tiny
    // per-day table — never the fact table.
    QDef("q_cume_distinct",
      """WITH fs AS (
        |  SELECT event_type, user_id, min(CAST(ts AS DATE)) AS first_day
        |  FROM events GROUP BY event_type, user_id),
        |byday AS (
        |  SELECT event_type, first_day AS day, count(*) AS new_users
        |  FROM fs GROUP BY event_type, first_day)
        |SELECT event_type, day, new_users,
        |  sum(new_users) OVER (PARTITION BY event_type ORDER BY day)
        |    AS cume_users
        |FROM byday
        |""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
      table(s, dir, "events")
        .groupBy("event_type", "user_id")
        .agg(min(to_date(col("ts"))).as("day"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("new_users"))
        .withColumn("cume_users", sum(col("new_users")).over(w))
    },

    // ---- map-type function surface ----------------------------------------
    // Per-user event-type→count maps built with map_from_entries, then
    // map_keys / map_filter / map_entries over them. Map cells can't be
    // hash-compared across engines (and crash the driver's
    // canonicalizer), so the output serializes the filtered map in
    // canonical sorted "k:v" form — the oracle builds the identical
    // string relationally, without a map type.
    QDef("q_map_funcs",
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id, count(*) AS n_types,
        |  coalesce(string_agg(
        |    CASE WHEN cnt >= 2 THEN event_type || ':' || cnt END,
        |    ',' ORDER BY event_type), '') AS frequent
        |FROM c GROUP BY user_id
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"),
          size(map_keys(col("m"))).cast("long").as("n_types"),
          array_join(array_sort(expr(
            "transform(map_entries(map_filter(m, (k, v) -> v >= 2))," +
              " e -> concat(e.key, ':', e.value))")), ",").as("frequent"))
    },

    // ---- T5-style span corruption (denoising objective) --------------------
    // The masked-span pretraining prep: deterministic spans (token
    // index i with i mod 10 < 3) are replaced by one sentinel per span
    // in the INPUT; the TARGET lists each sentinel followed by the
    // tokens it hides. Pure per-row transforms (no shuffle at all —
    // embarrassingly parallel at any corpus size); determinism comes
    // from position, not RNG, so replays and both engines agree
    // exactly. Spark's lambda index is 0-based, DuckDB's 1-based — the
    // oracle shifts accordingly.
    QDef("q_span_corrupt",
      """SELECT doc_id,
        |  array_to_string(list_filter(list_transform(
        |    string_split(trim(text), ' '), (t, i) ->
        |      CASE WHEN (i-1) % 10 = 0 THEN '<x' || ((i-1) // 10) || '>'
        |           WHEN (i-1) % 10 < 3 THEN NULL ELSE t END),
        |    x -> x IS NOT NULL), ' ') AS input,
        |  array_to_string(list_filter(list_transform(
        |    string_split(trim(text), ' '), (t, i) ->
        |      CASE WHEN (i-1) % 10 = 0 THEN '<x' || ((i-1) // 10) || '>' || ' ' || t
        |           WHEN (i-1) % 10 < 3 THEN t ELSE NULL END),
        |    x -> x IS NOT NULL), ' ') AS target
        |FROM documents
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .select(col("doc_id"),
          array_join(expr(
            """filter(transform(w, (t, i) ->
              |  CASE WHEN i % 10 = 0 THEN concat('<x', i div 10, '>')
              |       WHEN i % 10 < 3 THEN NULL ELSE t END),
              |  x -> x IS NOT NULL)""".stripMargin), " ").as("input"),
          array_join(expr(
            """filter(transform(w, (t, i) ->
              |  CASE WHEN i % 10 = 0 THEN concat('<x', i div 10, '> ', t)
              |       WHEN i % 10 < 3 THEN t ELSE NULL END),
              |  x -> x IS NOT NULL)""".stripMargin), " ").as("target"))
    }
  )
}
