package graft.cdc

import graft.TestSpark
import graft.cdc.StatefulMaterializer.{KeyImage, KeyedChange}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulMaterializerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("state-store materialization: upserts, deletes, replay no-ops") {
    val ms = MemoryStream[KeyedChange](spark)
    val q = StatefulMaterializer.materialize(ms.toDS())
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    try {
      ms.addData(Seq(
        KeyedChange("1", "r", 0, Map("name" -> "sally")),
        KeyedChange("2", "r", 1, Map("name" -> "george")),
        KeyedChange("3", "c", 2, Map("name" -> "ed"))))
      q.processAllAvailable()
      ms.addData(Seq(
        KeyedChange("3", "u", 3, Map("name" -> "ed2")),
        KeyedChange("2", "d", 4, null),
        KeyedChange("3", "u", 3, Map("name" -> "STALE-REPLAY")), // same offset → ignored
        KeyedChange("1", "c", 0, Map("name" -> "STALE-REPLAY")))) // old offset → ignored
      q.processAllAvailable()
    } finally q.stop()

    // last emitted image per key is the materialized row
    val images = spark.table("state_out").as[KeyImage].collect()
      .groupBy(_.key).map { case (k, v) => k -> v.last }
    assert(images("1").after == Map("name" -> "sally"))
    assert(images("3").after == Map("name" -> "ed2"))
    assert(images("2").deleted)
    // the stale replays changed nothing: no third image for keys 1/3
    assert(!images("1").deleted && images("3").after("name") != "STALE-REPLAY")
  }

  test("within-batch last-writer-wins by offset regardless of arrival order") {
    val ms = MemoryStream[KeyedChange](spark)
    val q = StatefulMaterializer.materialize(ms.toDS())
      .writeStream.format("memory").queryName("state_out2")
      .outputMode("update").start()
    try {
      ms.addData(Seq(
        KeyedChange("k", "u", 12, Map("v" -> "late")),
        KeyedChange("k", "c", 10, Map("v" -> "first")),
        KeyedChange("k", "u", 11, Map("v" -> "middle"))))
      q.processAllAvailable()
    } finally q.stop()
    val img = spark.table("state_out2").as[KeyImage].collect().last
    assert(img.after == Map("v" -> "late"))
  }
}
