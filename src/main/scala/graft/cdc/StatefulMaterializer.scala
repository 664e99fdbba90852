package graft.cdc

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** In-engine variant of the CDC materialization (SURVEY.md §2-A M1/M3,
  * "flatMapGroupsWithState" path): the keyed mutable table lives in
  * Spark's state store instead of an external sink. Each micro-batch
  * emits the new row image (or a delete marker) per changed key — i.e.
  * a changelog of the materialized table, consumable downstream without
  * any external system.
  *
  * Replay safety: the state remembers the last applied offset per key
  * and ignores older offsets, so at-least-once redelivery is exactly-
  * once in effect. State is partitioned by key across executors — the
  * natural horizontal scale-out; checkpointing persists it.
  */
object StatefulMaterializer {

  /** One decoded change event, keyed and with a dynamic row image. */
  final case class KeyedChange(key: String, op: String, offset: Long,
      after: Map[String, String])

  /** Current image of a key (deleted=true → tombstone in the output
    * changelog; after is empty then). */
  final case class KeyImage(key: String, deleted: Boolean,
      after: Map[String, String])

  /** State-store record. Public: the state encoder's generated code
    * must be able to reach the constructor (a private nested class
    * fails Janino compilation at runtime). */
  final case class KeyState(offset: Long, deleted: Boolean,
      after: Map[String, String])

  def materialize(changes: Dataset[KeyedChange]): Dataset[KeyImage] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, KeyImage](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[KeyedChange], state: GroupState[KeyState]) =>
          var cur = state.getOption
          var changed = false
          it.toSeq.sortBy(_.offset).foreach { c =>
            if (cur.forall(_.offset < c.offset)) { // replayed offsets are no-ops
              cur =
                if (c.op == Envelope.DeleteOp)
                  Some(KeyState(c.offset, deleted = true, Map.empty))
                else if (Envelope.UpsertOps.contains(c.op) && c.after != null)
                  Some(KeyState(c.offset, deleted = false, c.after))
                else cur.map(s => s.copy(offset = c.offset))
              changed = true
            }
          }
          cur.foreach(state.update)
          if (changed && cur.isDefined)
            Iterator(KeyImage(key, cur.get.deleted, cur.get.after))
          else Iterator.empty
      }
  }
}
