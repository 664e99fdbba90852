package graft.cdc

import graft.TestSpark
import graft.streaming.IndexFs
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

/** Vacuum's retention horizon must be FAIL-SAFE: age is established
  * from the newest FILE mtime under a candidate (object-store
  * connectors synthesize directory statuses with mtime 0 — a dir's
  * own mtime says nothing about what's inside), and an unknown/zero
  * mtime means "not old enough", never "old enough". The round-11
  * advice scenario: an in-flight merge's freshly staged bucket dirs on
  * an S3-like root must survive a concurrent vacuum even when the
  * connector reports their directory mtime as 0. */
class VacuumAgeGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(t: (Int, Double)*): DataFrame = t.toDF("id", "v")
  private def keys(ids: Int*): DataFrame = ids.toDF("id")

  test("newestModifiedAt: file = own mtime; dir = max over contained " +
      "files, not the dir status; absent = None") {
    val root = Files.createTempDirectory("agegate")
    val f = root.resolve("a.txt")
    Files.write(f, "x".getBytes)
    Files.setLastModifiedTime(f, FileTime.fromMillis(1000000L))
    assert(IndexFs.newestModifiedAt(spark, f.toString).contains(1000000L))
    // the directory's own mtime is NEWER than the file's (local FS
    // updates it on create) — the per-file gate must return the
    // file's, and keep returning it if the dir mtime is zeroed
    val sub = root.resolve("d")
    Files.createDirectory(sub)
    val g = sub.resolve("b.txt")
    Files.write(g, "y".getBytes)
    Files.setLastModifiedTime(g, FileTime.fromMillis(2000000L))
    Files.setLastModifiedTime(sub, FileTime.fromMillis(0L))
    assert(IndexFs.newestModifiedAt(spark, sub.toString).contains(2000000L))
    assert(IndexFs.newestModifiedAt(spark,
      root.resolve("missing").toString).isEmpty)
  }

  test("a data dir whose newest file reports mtime 0 (synthetic object-" +
      "store status) is NOT collected, even past the horizon") {
    val root = Files.createTempDirectory("agegate-v")
    val store = new ParquetTableStore(spark, "file:" + root, nBuckets = 4)
    store.applyChanges("t", Seq("id"), rows((1, 1.0)), keys())
    store.applyChanges("t", Seq("id"), rows((2, 2.0)), keys())
    store.applyChanges("t", Seq("id"), rows((3, 3.0)), keys())
    assert(store.versions("t").size == 3)

    // zero every mtime under the OLDEST version's data — the synthetic-
    // status simulation: age can no longer be established
    val dataRoot = root.resolve("t").resolve("data")
    def zeroAll(p: Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(c => zeroAll(c))
      Files.setLastModifiedTime(p, FileTime.fromMillis(0L))
    }
    val batches = Files.list(dataRoot).sorted().toArray.map(_.toString)
    zeroAll(Paths.get(batches.head))

    // keep=1, horizon=1h: the doomed manifests are hours "younger"
    // than the cutoff only through real mtimes; the zeroed batch's
    // bucket dirs must survive the unreferenced-bucket sweep because
    // their age is UNKNOWN, not because they are referenced
    val before = Files.walk(Paths.get(batches.head)).count()
    store.vacuum("t", keep = 1, minAgeMs = 3600L * 1000)
    val after = Files.walk(Paths.get(batches.head)).count()
    assert(after == before,
      s"zero-mtime staged data was collected ($before -> $after)")

    // sanity: with REAL mtimes and minAge=0 the same sweep does clean
    // unreferenced buckets (the fail-safe is about unknown age only)
    val store2root = Files.createTempDirectory("agegate-v2")
    val store2 = new ParquetTableStore(spark, "file:" + store2root, nBuckets = 4)
    store2.applyChanges("t", Seq("id"), rows((1, 1.0)), keys())
    store2.applyChanges("t", Seq("id"), rows((1, 9.0)), keys())
    store2.applyChanges("t", Seq("id"), rows((1, 8.0)), keys())
    val doomed = store2.vacuum("t", keep = 1, minAgeMs = 0L)
    assert(doomed.nonEmpty)
    // the read still serves the retained version exactly
    assert(store2.read("t").get.select("v").as[Double].collect().toSeq
      == Seq(8.0))
  }
}
