package graft.operators

import graft._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing as batch queries (the streaming package runs the
  * same shapes incrementally; these are the oracle-checked semantics):
  * tumbling, sliding, and session windows over `events.ts`.
  *
  * Scale notes: tumbling/sliding grouping keys are derived per-row
  * (window start), so the aggregation is one hash-partial + one shuffle.
  * Session windows require per-key ordering — Spark's session_window
  * merges per (user, overlapping-range); partitioning is by user_id, the
  * natural CDC/event key.
  */
object Temporal {

  val defs: Seq[QDef] = Seq(

    QDef("q_window_tumbling",
      """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS ws,
        |  event_type, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start")
          .cast("timestamp_ntz").as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumExact(col("value")).as("sum_value"))
    },

    QDef("q_window_sliding",
      """WITH b AS (SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP) AS w0,
        |                  value FROM events),
        |u AS (SELECT w0 AS ws, value FROM b
        |      UNION ALL
        |      SELECT w0 - INTERVAL '30 minutes', value FROM b)
        |SELECT ws, COUNT(*) AS n, CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS sum_value
        |FROM u GROUP BY ws
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").getField("start")
          .cast("timestamp_ntz").as("ws"))
        .agg(count(lit(1)).as("n"), sumExact(col("value")).as("sum_value"))
    },

    // Session windows: 30-minute inactivity gap per user. Oracle builds
    // sessions with the classic lag+cumulative-flag idiom at full µs
    // precision (gap strictly > 30 min starts a new session).
    QDef("q_sessionize",
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id,
        |  CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  CAST(max(ts) AS TIMESTAMP) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          sumExact(col("value")).as("sum_value"))
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    },

    // SCD Type 2 view of the change stream: each change row becomes a
    // validity interval [ts, next change ts) per key, open-ended for
    // the current image. The reference's Postgres mirror is SCD Type 1
    // (overwrite in place, DebeziumToPostgresConsumer.java:197-232);
    // this is the other standard CDC materialization — history kept,
    // one window pass partitioned by the key.
    QDef("q_scd2",
      """SELECT user_id,
        |  CAST(ts AS TIMESTAMP) AS valid_from,
        |  CAST(LEAD(ts) OVER w AS TIMESTAMP) AS valid_to,
        |  event_type, value,
        |  LEAD(ts) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      table(s, dir, "events").select(
        col("user_id"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"),
        col("event_type"), col("value"),
        lead(col("ts"), 1).over(w).isNull.as("is_current"))
    },

    // Daily user activity rollup (date bucketing + conditional aggs).
    QDef("q_daily_activity",
      """SELECT CAST(ts AS DATE) AS day, user_id,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,10)))
        |    FILTER (WHERE event_type = 'purchase') AS STRING) AS DOUBLE) AS purchase_value
        |FROM events GROUP BY 1, 2
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("day"), col("user_id"))
        .agg(count(lit(1)).as("n"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          sum(when(col("event_type") === "purchase", dec(col("value"))))
            .cast("double").as("purchase_value"))
    },
  )
}
