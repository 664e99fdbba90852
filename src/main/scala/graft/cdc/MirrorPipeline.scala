package graft.cdc

import graft.cdc.IncrementalView.ViewDef
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The mirror plus its dashboards in one streaming pipeline: each
  * micro-batch of raw CDC envelopes is materialized into the
  * ParquetTableStore (the reference's Postgres-mirror role), then
  * every registered incremental view advances from the RECORDED
  * change feed of the version that batch produced — O(delta) per
  * view per batch, never a base rescan (`cdc.IncrementalView`).
  *
  * Restart/replay stance (at-least-once foreachBatch): `applyBatch`
  * re-merges identical content on replay, so the replayed version's
  * change feed nets to zero and `refreshToCurrent` no-ops off its
  * `_REFLECTS` marker — the views stay exactly consistent with the
  * mirror without a ledger. MirrorPipelineSpec pins view==recompute
  * across batches and across a replay.
  */
object MirrorPipeline {

  /** One maintained view over a mirrored base table. */
  final case class ViewSpec(base: String, basePks: Seq[String],
      view: String, vdef: ViewDef)

  /** `partitioning`/`nBuckets` MUST match the values the store root
    * was created with — a different bucket count re-hashes keys into
    * different buckets and the merge would silently duplicate them
    * (the store has no self-describing layout; a production table
    * format would carry it in table metadata). */
  def start(raw: DataFrame, catalog: CdcCatalog,
      registry: Map[String, StructType], storeRoot: String,
      views: Seq[ViewSpec], checkpointDir: String,
      dlqDir: Option[String] = None,
      partitioning: Map[String, Seq[String]] = Map.empty,
      nBuckets: Int = 64,
      statsColumns: Map[String, Seq[String]] = Map.empty,
      joinViews: Seq[IncrementalJoinView.JoinViewDef] = Nil): StreamingQuery =
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val store = new ParquetTableStore(batch.sparkSession, storeRoot,
          partitioning, nBuckets, statsColumns)
        Materializer.applyBatch(batch, catalog, registry, store, dlqDir)
        views.foreach { v =>
          // a batch may not touch this view's base at all — then the
          // base has no versions yet, or the marker already points at
          // the current one and the refresh no-ops
          if (store.version(v.base).nonEmpty)
            IncrementalView.refreshToCurrent(
              store, v.base, v.basePks, v.view, v.vdef)
        }
        joinViews.foreach { j =>
          // advance once either base exists; refreshToCurrent handles
          // the half-present pair (empty-side sentinel → empty view)
          if (store.version(j.left).nonEmpty ||
              store.version(j.right).nonEmpty)
            IncrementalJoinView.refreshToCurrent(store, j)
        }
      }
      .start()
}
