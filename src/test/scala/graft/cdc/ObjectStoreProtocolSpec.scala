package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The rename-free version-log commit protocol
  * (`_log/<seq>.commit`, highest well-formed entry wins) that makes
  * `ParquetTableStore` deployable on object stores. Pins the three
  * protocol guarantees the class scaladoc claims:
  *
  *  1. a READER NEVER SEES A TORN COMMIT — a log entry missing its
  *     `#END` terminator (crash mid-write) is invisible, and the next
  *     writer commits above the corpse;
  *  2. a CONCURRENT WRITER LOSES CLEANLY — the exclusive create
  *     arbitrates the slot, the loser's staged manifest/data/changes
  *     are unstaged, and the store serves exactly the winner's merge;
  *  3. LEGACY ADOPTION — a pre-log store (bare `_LATEST` pointer)
  *     reads transparently and the first new commit starts the log.
  *
  * All through an explicit `file:` URI root, the IndexFs pattern that
  * pins the Hadoop-FS code path an hdfs://s3a:// root takes.
  */
class ObjectStoreProtocolSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): (String, java.nio.file.Path) = {
    val p = Files.createTempDirectory("graft-oslog")
    ("file:" + p, p)
  }

  private def rows(t: (Int, String)*): DataFrame = t.toDF("id", "name")
  private def noKeys: DataFrame = Seq.empty[Int].toDF("id")

  private def names(store: ParquetTableStore): Map[Int, String] =
    store.read("t").get.select("id", "name").as[(Int, String)]
      .collect().toMap

  test("commits append to the version log; the highest entry serves reads") {
    val (root, local) = freshRoot()
    val store = new ParquetTableStore(spark, root, nBuckets = 4)
    store.applyChanges("t", Seq("id"), rows((1, "a")), noKeys)
    store.applyChanges("t", Seq("id"), rows((1, "a2"), (2, "b")), noKeys)
    val log = local.resolve("t").resolve("_log").toFile.listFiles()
      .map(_.getName).filter(_.endsWith(".commit")).sorted.toSeq
    assert(log == Seq(f"${1L}%020d.commit", f"${2L}%020d.commit"), log)
    // entry content: the committed manifest name, terminated
    val c2 = new String(Files.readAllBytes(
      local.resolve("t").resolve("_log").resolve(log.last)))
    assert(c2.endsWith("#END\n") &&
      store.version("t").contains(c2.stripSuffix("\n#END\n").trim), c2)
    assert(names(store) == Map(1 -> "a2", 2 -> "b"))
    // no _LATEST pointer is written by the log protocol
    assert(!Files.exists(local.resolve("t").resolve("_LATEST")))
  }

  test("a torn commit entry is invisible to readers and the next writer " +
      "commits above the corpse") {
    val (root, local) = freshRoot()
    val store = new ParquetTableStore(spark, root, nBuckets = 4)
    store.applyChanges("t", Seq("id"), rows((1, "a")), noKeys)
    val v1 = store.version("t").get
    // crash mid-commit: slot 2 exists but its terminator never landed
    val logDir = local.resolve("t").resolve("_log")
    Files.write(logDir.resolve(f"${2L}%020d.commit"),
      "v9999999999999-000000.manifest".getBytes) // no #END
    // reader: the torn slot never counted
    assert(store.version("t").contains(v1))
    assert(names(store) == Map(1 -> "a"))
    // next writer: skips the corpse, commits at slot 3
    store.applyChanges("t", Seq("id"), rows((2, "b")), noKeys)
    assert(names(store) == Map(1 -> "a", 2 -> "b"))
    val committed = logDir.toFile.listFiles().map(_.getName)
      .filter(_.endsWith(".commit")).sorted.toSeq
    assert(committed.contains(f"${3L}%020d.commit"), committed)
    // vacuum prunes the corpse (it sits beneath a real commit) while
    // keeping the live entries
    store.vacuum("t", keep = 2)
    val after = logDir.toFile.listFiles().map(_.getName)
      .filter(_.endsWith(".commit")).sorted.toSeq
    assert(after == Seq(f"${1L}%020d.commit", f"${3L}%020d.commit"), after)
    assert(names(store) == Map(1 -> "a", 2 -> "b"))
  }

  test("a concurrent writer loses cleanly: exclusive create arbitrates, " +
      "the loser unstages, the winner's merge serves") {
    val (root, local) = freshRoot()
    val writerA = new ParquetTableStore(spark, root, nBuckets = 4)
    val writerB = new ParquetTableStore(spark, root, nBuckets = 4)
    writerA.applyChanges("t", Seq("id"), rows((1, "base")), noKeys)
    val v1 = writerA.version("t").get

    // interleave B's whole merge into A's window between parent
    // resolution and commit — the race the protocol must arbitrate
    writerA.onBeforeCommit = () => {
      writerA.onBeforeCommit = () => ()
      writerB.applyChanges("t", Seq("id"), rows((2, "from-B")), noKeys)
    }
    val e = intercept[ConcurrentWriteException] {
      writerA.applyChanges("t", Seq("id"), rows((3, "from-A")), noKeys)
    }
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)

    // the store serves exactly the winner's merge
    assert(names(writerA) == Map(1 -> "base", 2 -> "from-B"))
    val vB = writerA.version("t").get
    // the loser's staged manifest, change feed and data are unstaged:
    // only v1 and B's version remain anywhere
    val manifests = writerA.versions("t").toSet
    assert(manifests == Set(v1, vB), manifests)
    val changeDirs = local.resolve("t").resolve("changes").toFile
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(changeDirs == Set(v1, vB), changeDirs)
    // A staged one batch dir; after cleanup its dir is gone entirely
    val batchDirs = local.resolve("t").resolve("data").toFile
      .listFiles().filter(_.isDirectory).toSeq
    assert(batchDirs.size == 2, s"loser's batch dir kept: $batchDirs")

    // the loser retries from fresh state and lands normally
    writerA.applyChanges("t", Seq("id"), rows((3, "from-A")), noKeys)
    assert(names(writerA) ==
      Map(1 -> "base", 2 -> "from-B", 3 -> "from-A"))
    // the change-feed chain across winner and retried loser is intact
    val feed = writerA.changesSince("t", Seq("id"), v1)
    assert(feed.inputFiles.forall(_.contains("/changes/")),
      "span walk broke — recorded feed should serve this")
    assert(feed.select("id", "_change_type").as[(Int, String)]
      .collect().toSet == Set((2, "insert"), (3, "insert")))
  }

  test("legacy _LATEST stores adopt transparently; the first new commit " +
      "starts the log") {
    val (root, local) = freshRoot()
    val store = new ParquetTableStore(spark, root, nBuckets = 4)
    store.applyChanges("t", Seq("id"), rows((1, "legacy")), noKeys)
    val v1 = store.version("t").get
    // rewrite history into the pre-log shape: bare _LATEST, no _log
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf); f.delete()
    }
    rmRf(local.resolve("t").resolve("_log").toFile)
    Files.write(local.resolve("t").resolve("_LATEST"), v1.getBytes)

    val reopened = new ParquetTableStore(spark, root, nBuckets = 4)
    assert(reopened.version("t").contains(v1))
    assert(names(reopened) == Map(1 -> "legacy"))
    // first post-adoption commit lands at slot 1 and wins over _LATEST
    reopened.applyChanges("t", Seq("id"), rows((2, "new")), noKeys)
    assert(names(reopened) == Map(1 -> "legacy", 2 -> "new"))
    assert(Files.exists(local.resolve("t").resolve("_log")
      .resolve(f"${1L}%020d.commit")))
    assert(!reopened.version("t").contains(v1))
  }

  test("markers: torn content reads as absent (every protocol's safe " +
      "direction), whole content round-trips") {
    val (root, local) = freshRoot()
    val store = new ParquetTableStore(spark, root, nBuckets = 4)
    store.applyChanges("t", Seq("id"), rows((1, "a")), noKeys)
    store.writeMarker("t", "_REFLECTS", "v123.manifest")
    assert(store.readMarker("t", "_REFLECTS").contains("v123.manifest"))
    // torn write: the value landed but the terminator didn't
    Files.write(local.resolve("t").resolve("_TORN"), "v456.mani".getBytes)
    assert(store.readMarker("t", "_TORN").isEmpty)
    // values containing tabs (the _REFRESH_INTENT shape) round-trip
    store.writeMarker("t", "_INTENT", "a\tb\tc")
    assert(store.readMarker("t", "_INTENT").contains("a\tb\tc"))
    store.removeMarker("t", "_INTENT")
    assert(store.readMarker("t", "_INTENT").isEmpty)
  }
}
