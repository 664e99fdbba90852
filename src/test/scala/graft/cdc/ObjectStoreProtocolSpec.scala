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
    store.vacuum("t", keep = 2, minAgeMs = 0L)
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

  test("an in-flight commit completing within the torn-slot grace window " +
      "wins — the competing writer loses instead of shadowing it") {
    val (root, local) = freshRoot()
    val store = new ParquetTableStore(spark, root, nBuckets = 4)
    store.applyChanges("t", Seq("id"), rows((1, "a")), noKeys)
    val logDir = local.resolve("t").resolve("_log")
    // simulate a residual-store writer whose slot is visible before its
    // content lands (the check-then-act residual): slot 2 appears torn
    // right before this writer's exclusive create, then completes
    // 200 ms later — inside the grace window, after the first torn read
    val m = store.version("t").get // any existing manifest serves
    var slow: Thread = null
    store.onBeforeCommit = () => {
      store.onBeforeCommit = () => ()
      Files.write(logDir.resolve(f"${2L}%020d.commit"),
        "half".getBytes) // torn: no #END
      slow = new Thread(() => {
        Thread.sleep(200)
        Files.write(logDir.resolve(f"${2L}%020d.commit"),
          s"$m\n#END\n".getBytes)
      })
      slow.start()
    }
    val e = intercept[ConcurrentWriteException] {
      store.applyChanges("t", Seq("id"), rows((2, "b")), noKeys)
    }
    slow.join()
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    // the slow writer's commit was never shadowed: no slot 3 exists
    val log = logDir.toFile.listFiles().map(_.getName)
      .filter(_.endsWith(".commit")).sorted.toSeq
    assert(log == Seq(f"${1L}%020d.commit", f"${2L}%020d.commit"), log)
  }

  test("local commit publish is atomic with content: no temp residue, " +
      "arbitration preserved") {
    val dir = Files.createTempDirectory("graft-excl")
    val p = "file:" + dir.resolve("_log").resolve("x.commit")
    assert(graft.streaming.IndexFs.createExclusive(spark, p, "v1\n#END\n"))
    assert(!graft.streaming.IndexFs.createExclusive(spark, p, "v2\n#END\n"))
    val content = new String(Files.readAllBytes(
      dir.resolve("_log").resolve("x.commit")))
    assert(content == "v1\n#END\n", content)
    // the hard-link publish leaves no temp files behind, win or lose
    val names = dir.resolve("_log").toFile.listFiles().map(_.getName).toSeq
    assert(names == Seq("x.commit"), names)
  }

  test("vacuum's retention horizon protects an in-flight merge's freshly " +
      "staged state; an aged orphan is still collected") {
    val (root, local) = freshRoot()
    val store = new ParquetTableStore(spark, root, nBuckets = 4)
    store.applyChanges("t", Seq("id"), rows((1, "a")), noKeys)
    // stage what a concurrent merge would have on disk pre-commit: an
    // unreferenced batch/bucket dir and an orphan change dir
    val staged = local.resolve("t").resolve("data")
      .resolve("b9999999999999-000000").resolve("_b=0")
    Files.createDirectories(staged)
    Files.write(staged.resolve("part-00000.parquet"), "stub".getBytes)
    val orphanChanges = local.resolve("t").resolve("changes")
      .resolve("v9999999999999-000000.manifest")
    Files.createDirectories(orphanChanges)
    // default horizon: nothing fresh is touched
    store.vacuum("t", keep = 1)
    assert(Files.exists(staged) && Files.exists(orphanChanges),
      "vacuum collected state younger than the retention horizon")
    // horizon elapsed (age the files instead of waiting): collected
    import java.nio.file.attribute.FileTime
    def age(p: java.nio.file.Path): Unit =
      Files.setLastModifiedTime(p, FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600 * 1000))
    // the age gate is per-FILE since round 12 (dir mtimes are
    // synthetic on object stores): the staged parquet itself must age
    age(staged.resolve("part-00000.parquet"))
    age(staged); age(staged.getParent); age(orphanChanges)
    store.vacuum("t", keep = 1)
    assert(!Files.exists(staged) && !Files.exists(orphanChanges),
      "aged unreferenced state should be collected")
    // the committed table is untouched throughout
    assert(names(store) == Map(1 -> "a"))
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
    // torn write: the value and its newline landed, the terminator
    // didn't — absent (the current format always carries a newline,
    // so a newline-bearing unterminated file can only be torn)
    Files.write(local.resolve("t").resolve("_TORN"), "v456.mani\n#E".getBytes)
    assert(store.readMarker("t", "_TORN").isEmpty)
    Files.write(local.resolve("t").resolve("_TORN2"), "v456.manifest\n".getBytes)
    assert(store.readMarker("t", "_TORN2").isEmpty)
    // LEGACY marker (pre-log protocol): bare value, atomic-move write,
    // no newline and no terminator — reads as its complete value, so
    // an upgraded store's incremental views don't silently rebuild
    Files.write(local.resolve("t").resolve("_LEGACY"), "v456.manifest".getBytes)
    assert(store.readMarker("t", "_LEGACY").contains("v456.manifest"))
    // values containing tabs (the _REFRESH_INTENT shape) round-trip
    store.writeMarker("t", "_INTENT", "a\tb\tc")
    assert(store.readMarker("t", "_INTENT").contains("a\tb\tc"))
    store.removeMarker("t", "_INTENT")
    assert(store.readMarker("t", "_INTENT").isEmpty)
  }
}
