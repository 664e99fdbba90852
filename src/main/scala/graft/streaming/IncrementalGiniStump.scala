package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Continuously-retrained Gini stump: the online twin of q_tree_stump
  * (operators/Coverage19.scala). Documents stream in; after every
  * micro-batch the operator re-derives the currently-optimal split —
  * a quality/language classifier that is always trained on everything
  * seen so far, which is how a production ingest filter actually
  * wants to live (retrain-on-arrival, not retrain-on-cron).
  *
  * WHY THIS IS CHEAP: the stump's sufficient statistic is the
  * (feature, bucket, lang) count histogram — grid-bounded (96 buckets
  * × langs) no matter how many documents flow through — so state is
  * O(grid) in ONE group and the per-batch sweep costs |grid|×|langs|.
  * The row stream is PRE-REDUCED map-side before the singleton group
  * ([[cellsOf]]): each micro-batch partition folds its observations
  * to local (feature, bucket, lang, count) cells, so the one-task
  * shuffle carries O(partitions × grid) cells per batch, never
  * O(batch rows). Training a model whose sufficient statistics are a
  * bounded histogram is a FOLD, and folds stream.
  *
  * EQUALITY CONTRACT: after any prefix of micro-batches, the emitted
  * top-3 rows (tagged with the accumulated doc count) equal the batch
  * q_tree_stump over exactly the accumulated documents — integer
  * sufficient statistics, the same deterministic-double ranking with
  * (feature, b) tie-breaks, the same round-half-up-6 gini edge.
  * Redelivery distorts counts like any histogram fold (the drift
  * monitors' documented stance).
  */
object IncrementalGiniStump {

  /** One streamed observation: label + both feature buckets. */
  final case class FObs(lang: String, bChars: Long, bTokens: Long)

  /** One histogram cell. */
  final case class FCell(feature: String, b: Long, lang: String, c: Long)

  /** Accumulated histogram. */
  final case class FState(cells: Array[FCell])

  /** One ranked candidate split, tagged with the accumulated count. */
  final case class SplitRow(feature: String, threshold: Long, gini: Double,
      n_left: Long, n_right: Long, rn: Long, n_total: Long)

  /** The batch query's observation shape (n_chars/16 capped 63,
    * token count/4 capped 31). */
  def fromDocuments(docs: DataFrame): Dataset[FObs] = {
    import docs.sparkSession.implicits._
    docs.select(col("lang"),
      least(expr("CAST(n_chars AS BIGINT) div 16"), lit(63L)).as("bChars"),
      least(expr("CAST(size(split(trim(text), ' ')) AS BIGINT) div 4"),
        lit(31L)).as("bTokens"))
      .as[FObs]
  }

  /** The candidate sweep — integer-for-integer the batch plan's
    * cumAndTotals/candidates algebra, shared by the stream fold and
    * the spec's prefix recompute. Returns the ranked top-k. */
  def sweep(cells: Seq[FCell], k: Int = 3): Seq[SplitRow] = {
    // every document lands in EACH feature's histogram exactly once,
    // so the accumulated doc count is one feature's mass, not the sum
    val nTotal = cells.filter(_.feature == "n_chars").map(_.c).sum
    val cands = cells.groupBy(_.feature).toSeq.flatMap { case (f, cs) =>
      val grid = cs.map(_.b).distinct.sorted
      val langs = cs.map(_.lang).distinct.sorted
      val byCell = cs.groupBy(c => (c.b, c.lang)).view
        .mapValues(_.map(_.c).sum).toMap
      val tot = langs.map(l => l -> grid.map(b =>
        byCell.getOrElse((b, l), 0L)).sum).toMap
      grid.map { b =>
        val lcnt = langs.map(l => l -> grid.filter(_ <= b).map(bb =>
          byCell.getOrElse((bb, l), 0L)).sum).toMap
        val nl = langs.map(lcnt).sum
        val nr = langs.map(l => tot(l) - lcnt(l)).sum
        val sl2 = langs.map(l => lcnt(l) * lcnt(l)).sum
        val sr2 = langs.map(l => (tot(l) - lcnt(l)) * (tot(l) - lcnt(l))).sum
        (f, b, nl, nr, sl2, sr2)
      }.filter(t => t._3 > 0 && t._4 > 0)
    }
    val ranked = cands.map { case (f, b, nl, nr, sl2, sr2) =>
      val s = sl2.toDouble / nl + sr2.toDouble / nr
      (f, b, nl, nr, s)
    }.sortBy { case (f, b, _, _, s) => (-s, f, b) }.take(k)
    ranked.zipWithIndex.map { case ((f, b, nl, nr, s), i) =>
      val thr = if (f == "n_chars") b * 16 + 15 else b * 4 + 3
      val gini = BigDecimal(1.0 - s / (nl + nr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      SplitRow(f, thr, gini, nl, nr, i.toLong + 1, nTotal)
    }
  }

  /** Map-side pre-reduction: fold each partition's observations into
    * its local (feature, bucket, lang, count) cells (both feature
    * bucketings from the one pass), so the singleton state group
    * receives O(partitions × grid) cells per micro-batch instead of
    * the raw row stream. */
  private[streaming] def cellsOf(obs: Dataset[FObs]): Dataset[FCell] = {
    import obs.sparkSession.implicits._
    obs.mapPartitions { it =>
      val acc = scala.collection.mutable
        .Map.empty[(String, Long, String), Long]
      it.foreach { o =>
        acc(("n_chars", o.bChars, o.lang)) =
          acc.getOrElse(("n_chars", o.bChars, o.lang), 0L) + 1L
        acc(("n_tokens", o.bTokens, o.lang)) =
          acc.getOrElse(("n_tokens", o.bTokens, o.lang), 0L) + 1L
      }
      acc.iterator.map { case ((f, b, l), c) => FCell(f, b, l, c) }
    }
  }

  /** The stream: pre-reduce each micro-batch map-side, fold both
    * feature histograms in one grid-sized state group, and emit the
    * re-ranked top-3 every micro-batch. */
  def train(obs: Dataset[FObs]): Dataset[SplitRow] = {
    import obs.sparkSession.implicits._
    cellsOf(obs).groupByKey(_ => 0)
      .flatMapGroupsWithState[FState, SplitRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (_, it, state) =>
        val acc = scala.collection.mutable
          .Map.empty[(String, Long, String), Long]
        state.getOption.foreach(_.cells.foreach(c =>
          acc((c.feature, c.b, c.lang)) = c.c))
        it.foreach { fc =>
          acc((fc.feature, fc.b, fc.lang)) =
            acc.getOrElse((fc.feature, fc.b, fc.lang), 0L) + fc.c
        }
        val cells = acc.toSeq.map { case ((f, b, l), c) => FCell(f, b, l, c) }
        state.update(FState(cells.toArray))
        sweep(cells).iterator
      }
  }
}
