package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Read-path pruning for `ParquetTableStore`: zone maps
  * (`_stats/<version>.stats` — per-bucket min/max + membership bloom,
  * carried forward like manifest paths), key-hash point lookups, and
  * layout-dir narrowing. The assertions are on buckets OPENED
  * (PruneReport) and on `inputFiles`, never on wall-clock — the
  * quantity that matters at 100 TB is files skipped.
  *
  * Honesty pins (SCALING.md §Store): on a hash-bucketed layout,
  * min/max CANNOT prune a mid-domain range (every bucket spans the
  * domain — asserted, not hidden), CAN prune a whole-range miss, and
  * the BLOOM is what prunes point predicates. Degradation is always
  * toward the full scan: torn sidecar, untracked column, unsupported
  * bound — never a wrong prune.
  */
class StorePruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val NB = 64

  private var lastRoot: java.nio.file.Path = _

  private def freshStore(stats: Map[String, Seq[String]] = Map(
      "t" -> Seq("tenant", "ts", "score")),
      partitioning: Map[String, Seq[String]] = Map.empty): ParquetTableStore = {
    lastRoot = Files.createTempDirectory("graft-prune")
    new ParquetTableStore(spark, "file:" + lastRoot, partitioning,
      nBuckets = NB, statsColumns = stats)
  }

  private def rows(ids: Range): DataFrame =
    ids.map { id =>
      (id.toLong, s"t${id % 40}", id.toLong,
        new java.sql.Timestamp(1700000000000L + id * 1000L), id / 10.0)
    }.toDF("id", "tenant", "ts", "tst", "score")

  private def noKeys: DataFrame = Seq.empty[Long].toDF("id")

  private def sortedIds(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("readEq on a point predicate prunes via the per-bucket bloom " +
      "and matches the unpruned filter") {
    val store = freshStore()
    store.applyChanges("t", Seq("id"), rows(0 until 600), noKeys)
    val (df, rep) = store.readEqPruned("t", "tenant", "t7").get
    val expected = sortedIds(store.read("t").get.filter($"tenant" === "t7"))
    assert(sortedIds(df) == expected && expected.size == 15)
    // 15 rows live in ≤ 15 of 64 buckets; the bloom keeps those plus
    // at most a few false positives
    assert(rep.bucketsTotal == NB && rep.bucketsKept >= 1 &&
      rep.bucketsKept <= 25, rep)
  }

  test("readRange outside the table's whole domain prunes every bucket " +
      "and still returns the right schema") {
    val store = freshStore()
    store.applyChanges("t", Seq("id"), rows(0 until 600), noKeys)
    val (df, rep) = store.readRangePruned("t", "ts",
      Some(10000L), None).get
    assert(rep.bucketsKept == 0 && rep.bucketsTotal == NB)
    assert(df.count() == 0 &&
      df.columns.toSet == Set("id", "tenant", "ts", "tst", "score"))
  }

  test("readRange mid-domain on a hash-bucketed store honestly keeps " +
      "every bucket (min/max spans) but stays correct") {
    val store = freshStore()
    store.applyChanges("t", Seq("id"), rows(0 until 600), noKeys)
    val (df, rep) = store.readRangePruned("t", "ts",
      Some(250L), Some(350L)).get
    // ~9 uniform ids per bucket: almost every bucket's [min,max]
    // straddles the probe range (the odd small bucket may fall fully
    // to one side — that prune is still provable, just rare)
    assert(rep.bucketsKept >= rep.bucketsTotal - 3, rep)
    assert(sortedIds(df) == (250L to 350L))
  }

  test("readRange accepts timestamp bounds through the canonical " +
      "micros encoding") {
    val store = freshStore(Map("t" -> Seq("tst")))
    store.applyChanges("t", Seq("id"), rows(0 until 200), noKeys)
    val lo = new java.sql.Timestamp(1700000000000L + 50 * 1000L)
    val hi = new java.sql.Timestamp(1700000000000L + 60 * 1000L)
    val df = store.readRange("t", "tst", Some(lo), Some(hi)).get
    assert(sortedIds(df) == (50L to 60L))
    // and a miss beyond the newest timestamp prunes all buckets
    val (_, rep) = store.readRangePruned("t", "tst",
      Some(new java.sql.Timestamp(1800000000000L)), None).get
    assert(rep.bucketsKept == 0)
  }

  test("merges carry untouched buckets' stats forward and refresh " +
      "touched ones") {
    val store = freshStore()
    store.applyChanges("t", Seq("id"), rows(0 until 600), noKeys)
    // move two rows into a tenant that never existed before
    val upd = Seq(
      (3L, "t999", 3L, new java.sql.Timestamp(1700000003000L), 0.3),
      (7L, "t999", 7L, new java.sql.Timestamp(1700000007000L), 0.7))
      .toDF("id", "tenant", "ts", "tst", "score")
    store.applyChanges("t", Seq("id"), upd, noKeys)
    val st = store.bucketStats("t").get
    // every manifest bucket still has stats (carry-forward is complete)
    assert(store.version("t").isDefined)
    val manifestBuckets = st.keySet
    val (df, rep) = store.readEqPruned("t", "tenant", "t999").get
    assert(sortedIds(df) == Seq(3L, 7L))
    assert(rep.bucketsKept <= 6, rep) // ≤ 2 real + bloom fps
    // old value of the moved rows no longer matches them
    val t3 = store.readEq("t", "tenant", "t3").get
    assert(!sortedIds(t3).contains(3L) && sortedIds(t3).contains(43L))
    assert(manifestBuckets.nonEmpty)
  }

  test("deleting a tenant's last rows makes its point probe prune to " +
      "(almost) nothing") {
    val store = freshStore()
    store.applyChanges("t", Seq("id"), rows(0 until 600), noKeys)
    val doomed = (0 until 600).filter(_ % 40 == 11).map(_.toLong)
    store.applyChanges("t", Seq("id"),
      rows(0 until 0), doomed.toDF("id"))
    val (df, rep) = store.readEqPruned("t", "tenant", "t11").get
    assert(df.count() == 0)
    // rewritten buckets' fresh blooms exclude t11; untouched buckets
    // never contained it — only false positives remain
    assert(rep.bucketsKept <= 6, rep)
  }

  test("a torn stats sidecar degrades to the full scan, never a wrong " +
      "prune") {
    val store = freshStore()
    store.applyChanges("t", Seq("id"), rows(0 until 300), noKeys)
    val root = storeRoot(store)
    val statsDir = new java.io.File(root, "t/_stats")
    val sidecar = statsDir.listFiles().filter(_.getName.endsWith(".stats")).head
    val torn = new String(Files.readAllBytes(sidecar.toPath))
      .stripSuffix("\n").stripSuffix("#END").stripSuffix("\n")
    Files.write(sidecar.toPath, torn.getBytes)
    // the sidecar was written through LocalFileSystem, which keeps a
    // .crc sibling; drop it or the re-read trips on the checksum
    // instead of exercising the torn-content path (an object store
    // has no such sibling)
    Files.deleteIfExists(
      sidecar.toPath.resolveSibling("." + sidecar.getName + ".crc"))
    val (df, rep) = store.readEqPruned("t", "tenant", "t5").get
    assert(rep.bucketsKept == rep.bucketsTotal)
    assert(sortedIds(df) ==
      sortedIds(store.read("t").get.filter($"tenant" === "t5")))
  }

  test("an all-NULL tracked column is provably prunable for any range") {
    val store = freshStore(Map("t" -> Seq("maybe")))
    val df = (0 until 100).map(i => (i.toLong, null: java.lang.Long))
      .toDF("id", "maybe")
    store.applyChanges("t", Seq("id"), df, noKeys)
    val (res, rep) = store.readRangePruned("t", "maybe",
      Some(0L), Some(1000000L)).get
    assert(rep.bucketsKept == 0 && res.count() == 0)
  }

  test("NaN in a float column disables that bucket's stats (any-tag) " +
      "instead of mis-pruning") {
    val store = freshStore(Map("t" -> Seq("score")))
    val df = (0 until 100).map(i =>
      (i.toLong, if (i == 37) Double.NaN else i / 10.0))
      .toDF("id", "score")
    store.applyChanges("t", Seq("id"), df, noKeys)
    val res = store.readRange("t", "score", Some(2.0), Some(3.0)).get
    assert(sortedIds(res) == (20L to 30L))
  }

  test("readKeys opens only the keys' hash buckets") {
    val store = freshStore(Map.empty)
    store.applyChanges("t", Seq("id"), rows(0 until 600), noKeys)
    val probe = Seq(5L, 250L, 599L).toDF("id")
    val (df, rep) = store.readKeysPruned("t", Seq("id"), probe).get
    assert(sortedIds(df) == Seq(5L, 250L, 599L))
    assert(rep.bucketsKept <= 3 && rep.bucketsTotal == NB, rep)
    // a key that never existed: its bucket is opened, nothing matches
    val (miss, _) = store.readKeysPruned("t", Seq("id"),
      Seq(123456L).toDF("id")).get
    assert(miss.count() == 0)
  }

  test("readPartitionEq narrows every bucket to the value's layout " +
      "subtree") {
    val store = freshStore(Map.empty, Map("p" -> Seq("day")))
    val df = (0 until 400).map(i => (i.toLong, s"d${i % 4}", i))
      .toDF("id", "day", "v")
    store.applyChanges("p", Seq("id"), df, noKeys)
    val (res, rep) = store.readPartitionEqPruned("p", "day", "d2").get
    assert(sortedIds(res) ==
      (0 until 400).filter(_ % 4 == 2).map(_.toLong))
    assert(res.inputFiles.nonEmpty &&
      res.inputFiles.forall(_.contains("_p_day=d2")))
    // buckets that happened to receive no d2 row have no d2 subtree
    // and are skipped outright — dir-level pruning on top of the
    // within-bucket narrowing the inputFiles assertion pins
    assert(rep.bucketsKept <= rep.bucketsTotal &&
      rep.bucketsKept >= rep.bucketsTotal / 2, rep)
    // a day that was never written: zero matching subtrees anywhere
    val (none, rep2) = store.readPartitionEqPruned("p", "day", "d9").get
    assert(none.count() == 0 && rep2.bucketsKept == 0)
  }

  test("readPartitionRange keeps only in-range layout subtrees (the " +
      "time-slice scan)") {
    val store = freshStore(Map.empty, Map("p" -> Seq("day")))
    val df = (0 until 400).map(i => (i.toLong, f"2024-01-${i % 8 + 1}%02d", i))
      .toDF("id", "day", "v")
    store.applyChanges("p", Seq("id"), df, noKeys)
    val (res, rep) = store.readPartitionRangePruned("p", "day",
      Some("2024-01-03"), Some("2024-01-05")).get
    assert(sortedIds(res) ==
      (0 until 400).filter(i => i % 8 >= 2 && i % 8 <= 4).map(_.toLong))
    assert(res.inputFiles.nonEmpty && res.inputFiles.forall(p =>
      p.contains("_p_day=2024-01-03") || p.contains("_p_day=2024-01-04") ||
        p.contains("_p_day=2024-01-05")), res.inputFiles.take(3).toSeq)
    assert(rep.bucketsKept >= rep.bucketsTotal / 2, rep)
    // one-sided bound; range entirely before the data prunes all
    val tail = store.readPartitionRange("p", "day",
      Some("2024-01-07"), None).get
    assert(sortedIds(tail) ==
      (0 until 400).filter(i => i % 8 >= 6).map(_.toLong))
    val (none, rep2) = store.readPartitionRangePruned("p", "day",
      None, Some("2023-12-31")).get
    assert(none.count() == 0 && rep2.bucketsKept == 0)
  }

  test("version-pinned pruned reads serve a consistent snapshot while " +
      "merges continue") {
    val store = freshStore()
    store.applyChanges("t", Seq("id"), rows(0 until 400), noKeys)
    val v1 = store.version("t").get
    // a later merge deletes every t13 row and moves one key's tenant
    val doomed = (0 until 400).filter(_ % 40 == 13).map(_.toLong)
    store.applyChanges("t", Seq("id"),
      Seq((0L, "t777", 0L,
        new java.sql.Timestamp(1700000000000L), 0.0))
        .toDF("id", "tenant", "ts", "tst", "score"),
      doomed.toDF("id"))
    // pinned at v1: t13 still there, t777 not yet — with bloom pruning
    val (old13, rep13) = store.readEqPrunedAt("t", v1, "tenant", "t13").get
    assert(sortedIds(old13) == doomed.sorted)
    assert(rep13.bucketsKept < rep13.bucketsTotal, rep13)
    assert(store.readEqPrunedAt("t", v1, "tenant", "t777").get._1.count() == 0)
    // current: the other way round
    assert(store.readEq("t", "tenant", "t13").get.count() == 0)
    assert(sortedIds(store.readEq("t", "tenant", "t777").get) == Seq(0L))
    // pinned key fetch sees the pre-merge image of the moved key
    val (oldKey, _) = store.readKeysPrunedAt("t", v1, Seq("id"),
      Seq(0L).toDF("id")).get
    assert(oldKey.select("tenant").as[String].collect().toSeq == Seq("t0"))
    // pinned range read against the old sidecar
    val (oldRange, _) = store.readRangePrunedAt("t", v1, "ts",
      Some(390L), None).get
    assert(sortedIds(oldRange) == (390L to 399L))
  }

  test("vacuum sweeps dropped versions' sidecars and orphans, keeps " +
      "the current one") {
    val store = freshStore()
    store.applyChanges("t", Seq("id"), rows(0 until 100), noKeys)
    store.applyChanges("t", Seq("id"), rows(100 until 120), noKeys)
    store.applyChanges("t", Seq("id"), rows(120 until 140), noKeys)
    val statsDir = new java.io.File(storeRoot(store), "t/_stats")
    // plant an orphan (crash between sidecar write and commit)
    Files.write(statsDir.toPath.resolve("v0-orphan.stats"),
      "0\tYQ==\tstr\tYQ==\tYQ==\t-\n#END\n".getBytes)
    assert(statsDir.listFiles().count(_.getName.endsWith(".stats")) == 4)
    store.vacuum("t", keep = 1, minAgeMs = 0L)
    val left = statsDir.listFiles().map(_.getName).filter(_.endsWith(".stats"))
    assert(left.length == 1 &&
      store.version("t").get.stripSuffix(".manifest") + ".stats" == left.head)
    // pruned reads still work after vacuum
    assert(store.readEq("t", "tenant", "t7").get.count() ==
      store.read("t").get.filter($"tenant" === "t7").count())
  }

  test("schema evolution through the pruned read path: a column added " +
      "mid-history never prunes out legacy buckets (absent stats = keep)") {
    val store = freshStore(stats = Map("t" -> Seq("tenant", "w")))
    // history BEFORE the column exists: 600 ids spread over all 64
    // buckets, no `w` anywhere (so no bucket has `w` stats entries)
    store.applyChanges("t", Seq("id"),
      rows(0 until 600).drop("tst", "score"), noKeys)
    // the column appears: ONE merge touching few buckets carries `w`;
    // untouched buckets keep their carried-forward (w-less) entries
    val withW = Seq((1000L, "t7", 1000L, "needle"), (1001L, "t8", 1001L, "hay"))
      .toDF("id", "tenant", "ts", "w")
    store.applyChanges("t", Seq("id"), withW, noKeys)

    // the touched-bucket set is tiny; everything else is legacy
    val legacyBuckets = NB - 2 // at most 2 buckets hold ids 1000/1001

    // point lookup on the NEW column: correct rows, and the report
    // proves the honest no-prune — every legacy (stats-less) bucket is
    // kept, only w-tracked buckets could be bloom-pruned
    val (eq, eqRep) = store.readEqPruned("t", "w", "needle").get
    assert(eq.select("id").as[Long].collect().toSeq == Seq(1000L))
    assert(eqRep.bucketsKept >= legacyBuckets,
      s"legacy buckets were wrongly pruned: $eqRep")

    // range read on the new column: correct (legacy rows read as NULL
    // and BETWEEN never matches NULL), legacy buckets still kept
    val (rg, rgRep) = store.readRangePruned("t", "w",
      Some("hay"), Some("needle")).get
    assert(rg.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1000L, 1001L))
    assert(rgRep.bucketsKept >= legacyBuckets, rgRep)

    // a whole-range miss on the new column still cannot prune the
    // stats-less legacy buckets (absent stats = keep is honest, not
    // clever) — correctness over cleverness, zero wrong prunes
    val (miss, missRep) = store.readRangePruned("t", "w",
      Some("zzz"), None).get
    assert(miss.isEmpty)
    assert(missRep.bucketsKept >= legacyBuckets, missRep)

    // and the old column's pruning is undisturbed by the evolution
    val (t7, t7Rep) = store.readEqPruned("t", "tenant", "t7").get
    assert(t7.count() ==
      store.read("t").get.filter($"tenant" === "t7").count())
    assert(t7Rep.bucketsKept <= 25, t7Rep)

    // version-pinned twin: the PRE-evolution version has no `w` at all;
    // its pruned read must keep every bucket and return zero matches
    // (never a crash, never a wrong prune)
    val v1 = store.versions("t").head
    val (old, oldRep) = store.readEqPrunedAt("t", v1, "w", "needle").get
    assert(oldRep.bucketsKept == oldRep.bucketsTotal, oldRep)
    assert(old.isEmpty)
  }

  /** Local path behind the most recent `freshStore` root. */
  private def storeRoot(store: ParquetTableStore): java.io.File =
    lastRoot.toFile
}
