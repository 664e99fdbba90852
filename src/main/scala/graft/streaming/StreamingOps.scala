package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics over event streams: the incremental versions of
  * operators/Temporal.scala — same grouping expressions, so a stream
  * that is fully processed produces exactly the batch answer (asserted
  * in StreamingOpsSpec).
  *
  * Watermarks bound state: with a 1-hour watermark a tumbling/session
  * aggregation holds only windows newer than (max event time − 1 h);
  * events later than that are dropped deterministically. At 100 TB/day
  * the state store holds hours, not history — the CDC materialization
  * path (graft.cdc) is the unbounded-state design instead.
  */
object StreamingOps {

  /** Tumbling event-time counts/sums per window × event_type. */
  def tumblingAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      // group by the window column itself (not a derived field) so the
      // watermark stays attached and append mode can close windows
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,10)")).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("ws"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding (1 h window, 30 min slide) sums. */
  def slidingAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,10)")).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("ws"),
        col("n"), col("sum_value"))

  /** Session windows (30 min gap) per user. */
  def sessionAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")

  /** Exactly-once-per-event-id view of an at-least-once stream:
    * watermarked dropDuplicates keeps the dedup state bounded. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates("event_id", "ts")

  /** Sliding 7-day × 1-day DISTINCT active users — the live DAU/WAU
    * board, and the one windowed shape none of the plain aggs cover
    * (COUNT(DISTINCT) isn't an algebraic window aggregate).
    * Two chained stateful operators: dropDuplicates on
    * (user_id, window) bounds each user to ONE state row per window it
    * touches — state O(users × 7), the dedup key includes the
    * event-time window so the watermark evicts closed windows — and
    * the downstream count is then an ordinary windowed aggregation.
    * Batch twin: q_rolling_active_users (equality spec per window). */
  def activeUsers(events: DataFrame, watermark: String = "14 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), window(col("ts"), "7 days", "1 day").as("w"))
      .dropDuplicates("user_id", "w")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("wau"))
      .select(col("w.start").cast("timestamp_ntz").as("ws"),
        col("w.end").cast("timestamp_ntz").as("we"), col("wau"))

  /** Running count per event_type (update-mode friendly, unbounded key
    * space bounded by the type dictionary). */
  def runningCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,10)")).as("sum_value"))

  /** Stream–static enrichment: join each event to a STATIC dimension
    * (the CDC mirror's lookup pattern — stream of facts, slowly-read
    * dim snapshot). Stateless, unlike the stream-stream join below: the
    * static side re-plans per micro-batch, and with `broadcast()` the
    * stream side never shuffles — the same plan a 100 TB fact stream
    * wants. Inner semantics; rows with no dim match drop. */
  def enrichStatic(events: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(streamKey) === col(dimKey))

  /** Watermarked stream-stream join: each purchase joined to the same
    * user's views within the preceding hour. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * the state store retains only one hour per side — the join works
    * at unbounded input. */
  def purchaseViewJoin(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    val v = views.withWatermark("ts", "1 hour")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))
    p.join(v, expr(
      "user_id = v_user_id AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"))
      .select("purchase_id", "user_id", "p_ts", "view_id", "v_ts", "purchase_value")
  }

  /** LEFT OUTER watermarked stream-stream join: [[purchaseViewJoin]]
    * plus the rows it silently drops — purchases with NO view in the
    * preceding hour, which is precisely the cohort a funnel /
    * attribution consumer needs ("bought without browsing"). Matched
    * pairs emit as they meet, exactly as the inner join; a purchase
    * that stays unmatched emits ONCE, null-extended (view_id/v_ts
    * null), when the watermark passes the end of its match window —
    * the engine can only then prove no admissible view will arrive.
    * Late views inside the watermark still match (the pair emits in
    * the later batch); state per side stays the inner join's one hour.
    * Complete-input equality with the batch left join is pinned in
    * StreamingOpsSpec, including the match-arrives-later and
    * never-matched cases. */
  def purchaseViewJoinOuter(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    val v = views.withWatermark("ts", "1 hour")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))
    p.join(v, expr(
      "user_id = v_user_id AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"),
      "leftOuter")
      .select("purchase_id", "user_id", "p_ts", "view_id", "v_ts", "purchase_value")
  }

  /** FULL OUTER watermarked stream-stream join — the union member of
    * the join family ([[purchaseViewJoin]] inner,
    * [[purchaseViewJoinOuter]] left, [[purchaseViewJoinRight]] right):
    * BOTH dangling cohorts emit
    * null-extended when the watermark proves no admissible partner can
    * arrive — purchases with no preceding-hour view ("bought without
    * browsing") AND views that led to no purchase within the following
    * hour (the abandoned-browse cohort an attribution consumer
    * retargets). `user_id` is coalesced across sides so every output
    * row carries its user regardless of which side dangles. Matched
    * pairs emit as they meet; state per side stays the inner join's
    * one hour. Complete-input equality with the batch full join is
    * pinned in StreamingOpsSpec. */
  /** RIGHT OUTER watermarked stream-stream join — the mirror of
    * [[purchaseViewJoinOuter]], completing the family (inner, left,
    * right, full): matched pairs plus ONLY the view-side dangling
    * cohort — views that led to no purchase within the following hour
    * (the abandoned-browse retarget list), null-extended on the
    * purchase columns once the watermark proves no admissible purchase
    * can arrive. `user_id` is coalesced across sides (the view side
    * always carries it on dangling rows). Matched pairs emit as they
    * meet; state per side stays the inner join's one hour. Complete-
    * input equality with the batch right join is pinned in
    * StreamingOpsSpec. */
  def purchaseViewJoinRight(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    val v = views.withWatermark("ts", "1 hour")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))
    p.join(v, expr(
      "user_id = v_user_id AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"),
      "rightOuter")
      .select(col("purchase_id"),
        coalesce(col("user_id"), col("v_user_id")).as("user_id"),
        col("p_ts"), col("view_id"), col("v_ts"), col("purchase_value"))
  }

  def purchaseViewJoinFull(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
    val v = views.withWatermark("ts", "1 hour")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("v_ts"))
    p.join(v, expr(
      "user_id = v_user_id AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"),
      "fullOuter")
      .select(col("purchase_id"),
        coalesce(col("user_id"), col("v_user_id")).as("user_id"),
        col("p_ts"), col("view_id"), col("v_ts"), col("purchase_value"))
  }
}
