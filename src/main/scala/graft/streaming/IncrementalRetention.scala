package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming cohort-retention maintenance: the stateful twin of
  * q_retention (operators.Coverage5). The batch triangle counts
  * DISTINCT users per (first-activity day, days-since) cell; the
  * stream maintains it as SIGNED cell deltas — the IncrementalView
  * move applied to groupState instead of a change feed.
  *
  * Why signed: a user's cohort is the global MIN of their activity
  * days, and an earlier-day event can arrive in a LATER micro-batch.
  * Twins whose per-key fold is order-sensitive (ewma/locf/decay)
  * document an in-order delivery contract; retention doesn't need
  * one — a re-anchored cohort RETRACTS the user's previously-emitted
  * cells (−1) and re-emits them against the new cohort (+1), so the
  * aggregated deltas equal the batch triangle under ARBITRARY event
  * order and any micro-batch split (IncrementalRetentionSpec feeds a
  * shuffled stream). The downstream consumer folds deltas with a
  * keyed SUM — associative and commutative, so at-least-once sinks
  * that dedup on (user-batch) replay cleanly and the triangle view is
  * exactly the IncrementalView grouped-sum shape.
  *
  * State per user: cohort day + the distinct active-day set — bounded
  * by the corpus day span (≤ a few thousand ints even for a 10-year
  * stream), NOT by event count; per-batch emission is bounded by the
  * user's new-or-shifted cells. No eviction option on purpose: the
  * triangle is a full-history aggregate — evicting a user and
  * re-admitting them later would mint a second, later cohort and
  * double-count the user; the honest contract is O(users) state or an
  * upstream retention window applied to the WHOLE pipeline.
  */
object IncrementalRetention {

  /** Input: one activity observation (epoch day, µs-derived). */
  final case class REv(user_id: Long, day: Int)

  /** State: cohort = min(days); days = distinct active epoch days.
    * Public top-level (Janino). */
  final case class RSt(cohort: Int, days: Array[Int])

  /** Signed triangle-cell delta; fold with sum(delta). */
  final case class Delta(cohort_day: Int, days_since: Int, delta: Int)

  def fromEvents(events: DataFrame): Dataset[REv] = {
    import events.sparkSession.implicits._
    events.selectExpr(
      "CAST(user_id AS LONG) AS user_id",
      // DIV, not `/`: Column `/` on longs is DOUBLE division
      "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 AS INT) AS day")
      .as[REv]
  }

  def deltas(events: Dataset[REv]): Dataset[Delta] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RSt, Delta](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (_, it, state) =>
        val incoming = it.map(_.day).toSet
        val oldSt = state.getOption
        val oldDays = oldSt.map(_.days.toSet).getOrElse(Set.empty[Int])
        val allDays = oldDays ++ incoming
        val cohort = allDays.min
        state.update(RSt(cohort, allDays.toArray))
        val oldCells = oldSt match {
          case Some(s) => oldDays.map(d => (s.cohort, d - s.cohort))
          case None => Set.empty[(Int, Int)]
        }
        val newCells = allDays.map(d => (cohort, d - cohort))
        ((newCells -- oldCells).iterator.map { case (c, a) => Delta(c, a, 1) } ++
          (oldCells -- newCells).iterator.map { case (c, a) => Delta(c, a, -1) })
      }
  }

  /** The materialized triangle a consumer maintains from the deltas:
    * keyed sum, zero-count cells dropped — column-compatible with
    * batch q_retention (cohort_day as DATE, n_users). */
  def triangle(deltas: DataFrame): DataFrame =
    deltas.groupBy(
        date_from_unix_date(col("cohort_day")).as("cohort_day"),
        col("days_since").cast("long").as("days_since"))
      .agg(sum(col("delta")).cast("long").as("n_users"))
      .filter(col("n_users") > 0)
}
