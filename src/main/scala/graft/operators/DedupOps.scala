package graft.operators

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family over `documents` and `embeddings`: exact
  * (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design: the exact and LSH paths are the 100 TB paths — they
  * shuffle once on a short key (hash / band bucket) and never compare
  * all pairs. The exact-Jaccard and banded-cosine queries are the
  * verification/oracle anchors; their pair joins are keyed on shingle /
  * bounded id-bands so the candidate set stays linear-ish, but at full
  * scale one would only ever run them on LSH candidates (which is
  * exactly what q_dedup_minhash_lsh does).
  */
object DedupOps {

  /** doc_id → exploded distinct word-3-gram shingles. */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = spread(docs)
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= n)
    toks.select(col("doc_id"), explode(expr(
      s"transform(sequence(0, size(w) - $n), i -> " +
        (0 until n).map(k => s"w[i + $k]").mkString("concat_ws(' ', ", ", ", ")") + ")"
    )).as("shingle")).distinct()
  }

  /** Spread per-row-heavy map work (tokenize + shingle + hash) when the
    * input is under-parallel — a one-file parquet corpus scans as a
    * single task, and AQE's byte-count heuristic cannot see per-row
    * cost (the q_fuzzy_match lesson; round-14: measured a 1.0 s
    * single-task shingling stage at sf0.1 ahead of every shingle
    * consumer). No-op whenever the input already carries at least the
    * session's shuffle-partition parallelism, so a many-filed 100-TB
    * corpus never pays an extra exchange (guide §2.4/§2.5). */
  private def spread(docs: DataFrame): DataFrame = {
    val width =
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (docs.rdd.getNumPartitions < width)
      docs.repartition(width, col("doc_id"))
    else docs
  }

  /** Exact pairwise Jaccard over shared shingles (only pairs that share
    * at least one shingle are ever materialized — the join key IS the
    * shingle, so disjoint documents never meet). The join/distinct key
    * is the shingle's 64-bit hash, not the string: same counts (a
    * collision needs ~2^32 distinct shingles to become likely), much
    * cheaper shuffle. */
  def jaccardPairs(shRaw: DataFrame, threshold: Double): DataFrame = {
    val sh = shRaw.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("b.doc_id") > col("a.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  /** doc_id → distinct shingle set kept as one array per document (the
    * no-shuffle representation: signatures and set intersections are
    * per-row expressions over it). Shingles are carried as their 64-bit
    * xxhash64, not the string — same counts and intersections (a
    * divergence needs two distinct shingles of ONE document, or of one
    * candidate pair's union, to collide in 64 bits: ~300² / 2^65 per
    * document — negligible at any corpus size, because the exposure is
    * per-document/per-pair and never compounds across the corpus the
    * way a corpus-wide join key would); the cache holds 8-byte longs
    * instead of ~20-char strings, signatures hash one long per seed
    * instead of re-hashing the string, and verification intersects
    * long arrays. [[jaccardPairs]] applies the same transformation to
    * its join key and documents the same bound. */
  def shingleArrays(docs: DataFrame, n: Int = 3): DataFrame = {
    graft.functions.TextHashExpressions.register(docs.sparkSession)
    spread(docs).select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), array_distinct(expr(
        s"transform(sequence(0, size(w) - $n), i -> xxhash64(" +
          (0 until n).map(k => s"w[i + $k]").mkString("concat_ws(' ', ", ", ", ")") + "))"
      )).as("shingles"))
      .withColumn("nsh", size(col("shingles")).cast("long"))
  }

  /** MinHash signatures via the per-row MinHashSignature expression —
    * computed at scan speed, no token explode, no aggregation. */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame =
    sh.withColumn("sig", call_function("minhash_sig", col("shingles"), lit(numHashes)))

  /** (doc_id, band, bucket) rows from a signature column — the LSH
    * index representation (persisted by streaming.IncrementalDedup). */
  def bandTable(sig: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bands = array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => element_at(col("sig"), i + 1)): _*).as("bucket"))
    }: _*)
    sig.select(col("doc_id"), explode(bands).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  /** LSH banding over signature arrays: candidate pairs = docs sharing
    * any band bucket. Only this self-join shuffles, keyed on 8-byte
    * bucket hashes. */
  def lshCandidates(sig: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val exploded = bandTable(sig, numHashes, rowsPerBand)
    exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("b.doc_id") > col("a.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** The full LSH dedup pipeline: MinHash(32) signatures → 16×2 band
    * candidates → exact Jaccard verification per candidate via one
    * array_intersect (no shingle explode, no per-shingle join). */
  def lshVerifiedPairs(docs: DataFrame, threshold: Double): DataFrame =
    lshVerifiedPairsFrom(shingleArrays(docs).cache(), threshold)

  /** [[lshVerifiedPairs]] over a caller-owned (cached) shingle table —
    * the memo path materializes the pair set eagerly and then drops the
    * shingle cache, so repeated memo rebuilds (bench runs) don't pile
    * up orphaned cached tables. */
  def lshVerifiedPairsFrom(sh: DataFrame, threshold: Double): DataFrame = {
    val cand = lshCandidates(minhashSignatures(sh, 32), 32, 2)
    cand
      .join(sh.select(col("doc_id").as("d1"), col("shingles").as("s1"),
        col("nsh").as("n1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("shingles").as("s2"),
        col("nsh").as("n2")), "d2")
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  /** 64-bit SimHash via the per-row SimHash64 expression (one compiled
    * pass over the token array per document; the first implementation
    * exploded every token and ran a 64-column aggregation). Empty
    * tokens (doubled spaces) are dropped so both hash modes see the
    * same token stream as the DuckDB oracle's `WHERE w <> ''`.
    * `portable = true` switches the per-token hash to the
    * engine-reproducible polynomial pair (see SimHash64 scaladoc). */
  def simhash(docs: DataFrame, portable: Boolean = false): DataFrame = {
    graft.functions.TextHashExpressions.register(docs.sparkSession)
    // Token-less documents are DROPPED, not hashed to 0: the oracle's
    // per-token unnest makes them vanish before banding, and keeping
    // them here would make every empty doc collide with every other in
    // all bands (simhash 0) — a divergence AND a degenerate bucket.
    docs.select(col("doc_id"),
        filter(split(trim(col("text")), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        call_function("simhash64", col("toks"), lit(portable)).as("simhash"))
  }

  /** Process-level memo of the LSH-verified pair set, keyed by
    * (session, corpus dir, threshold): the near-dup listing
    * (q_dedup_minhash_lsh) and the clustering (q_dedup_clusters)
    * consume the IDENTICAL pair set, and pair-finding (shingle →
    * signature → band join → Jaccard verify) dominates both — so it is
    * materialized once and shared, the same way a production pipeline
    * would persist the verified-pairs table between its dedup stages
    * rather than recompute it per consumer. The key is the PATH: the
    * memo assumes the corpus at `dir` is immutable for the session's
    * lifetime (true of the verify/bench harnesses and of immutable
    * data-lake snapshots); a deployment over mutable paths would key
    * on a snapshot/version id instead. */
  private val pairsMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Double), DataFrame]

  /** Names of memo tables served from cache since the last [[drainMemoHits]]
    * — the bench harness records these per query so a timing that
    * excludes pair-finding (because an earlier query in the same run
    * already paid it) is visibly marked in the bench JSON rather than
    * silently folded into a small number (round-3 advice). */
  private val memoHits = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private type MemoKey = (SparkSession, String, Double)

  private def memoGet(memo: scala.collection.concurrent.TrieMap[MemoKey, DataFrame],
      name: String, key: MemoKey)(build: => DataFrame): DataFrame = {
    if (memo.contains(key)) memoHits.put(name, ())
    memo.getOrElseUpdate(key, build)
  }

  /** Drain and return the memo tables hit since the last call. */
  def drainMemoHits(): Set[String] = {
    val hit = memoHits.keySet.toSet ++ GraphMemo.drainHits() ++
      BpeMemo.drainHits()
    memoHits.clear()
    hit
  }

  /** Drop every process-level memoized table (unpersisting its cache)
    * AND the final-round CC checkpoint RDDs that back the memoized
    * label tables. The bench harness calls this between runs so repeat
    * runs pay the full pair-finding cost instead of serving from the
    * previous run's memo — per-query medians stay comparable round over
    * round. After this call the previously-returned label DataFrames
    * must not be re-executed (their truncated lineage cannot recompute
    * a released local checkpoint) — callers re-derive via the memo. */
  def clearMemos(): Unit = {
    // BLOCKING unpersists: callers invoke this between runs/sessions,
    // outside any timed region — asynchronous removal would instead
    // race block eviction against the next run's first queries and
    // bill the cleanup to them
    Seq(pairsMemo, labelsMemo, srpPairsMemo, srpLabelsMemo).foreach { m =>
      m.values.foreach(_.unpersist(true))
      m.clear()
    }
    var r = liveCkpts.poll()
    while (r != null) { r.unpersist(true); r = liveCkpts.poll() }
    memoHits.clear()
    GraphMemo.clear() // the co-purchase edge memo rides the same sweep
    BpeMemo.clear() // trained-BPE state too (vocab ckpt drains above)
    // bloom-probe broadcasts ride query plans the same way the memo
    // frames do; release them in the same sweep so repeated bench runs
    // don't stack multi-MB executor copies
    graft.functions.BloomExpressions.clearProbes()
  }

  /** RDDs persisted by `Dataset.localCheckpoint` are NOT released by
    * `Dataset.unpersist` — the storage entry belongs to the RDD, not
    * the cache manager, so each superseded CC round stranded one
    * label-table RDD in block-manager storage until GC (measured: the
    * trivial query following the dedup family mid-bench paid 2.4× its
    * isolated cost in inherited GC debt). The checkpointed RDD is the
    * leaf of the returned plan; extract it for explicit release. */
  private def checkpointRdd(ds: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    ds.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Final-round checkpoint RDDs of completed CC fixpoints: the one
    * checkpoint per CC call that must outlive the loop (it backs the
    * returned labels), released with the memo caches in [[clearMemos]]. */
  private val liveCkpts =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]

  /** Lazily checkpoint a small derived table that an iterative loop
    * re-reads every round (PageRank's edge weights, a fixpoint's seed
    * set): without this the loop's lazy plan re-derives the input from
    * the raw scan once per iteration. The backing RDD is registered
    * with [[liveCkpts]] so [[clearMemos]] releases the storage the same
    * way it releases the CC label checkpoints — `Dataset.unpersist`
    * cannot free a localCheckpoint (see [[checkpointRdd]]). */
  def loopInput(ds: DataFrame): DataFrame = {
    val ck = ds.localCheckpoint(false)
    checkpointRdd(ck).foreach(liveCkpts.add)
    ck
  }

  /** Release a [[loopInput]] checkpoint EARLY — the in-loop form of the
    * clearMemos sweep, for fixpoints that supersede their input each
    * round (q_kcore): once the next round's checkpoint has
    * materialized, the previous round's blocks can drop immediately
    * instead of accumulating one table per round until the next memo
    * sweep (the CC loop's own prevCkpt discipline). The released frame
    * must not be re-executed afterwards. */
  def releaseLoopInput(ds: DataFrame): Unit =
    checkpointRdd(ds).foreach { r =>
      liveCkpts.remove(r)
      r.unpersist(true)
    }

  /** Pair-set row counts learned by the memo builds — lets the CC
    * consumers skip a re-count job over the cached pair table. */
  private val pairCounts = scala.collection.concurrent.TrieMap.empty[MemoKey, Long]

  def verifiedPairsFor(s: SparkSession, dir: String, threshold: Double): DataFrame =
    memoGet(pairsMemo, "pairs", (s, dir, threshold)) {
      val sh = shingleArrays(table(s, dir, "documents")).cache()
      val pairs = lshVerifiedPairsFrom(sh, threshold).cache()
      // materialize now so the shingle cache can be dropped; the count
      // doubles as the CC loop's shuffle-width input
      pairCounts.put((s, dir, threshold), pairs.count())
      sh.unpersist()
      pairs
    }

  /** Memoized cluster assignment over the shared pair set — the CC
    * fixpoint is iterative (several jobs), and both q_dedup_clusters
    * and q_dedup_survivors consume the identical labels; a production
    * pipeline would persist the assignment table once per corpus
    * snapshot. Same path-immutability assumption as [[verifiedPairsFor]]. */
  private val labelsMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Double), DataFrame]

  def clusterLabelsFor(s: SparkSession, dir: String, threshold: Double): DataFrame =
    memoGet(labelsMemo, "labels", (s, dir, threshold))(
      connectedComponentsWithRounds(verifiedPairsFor(s, dir, threshold),
        knownPairCount = pairCounts.get((s, dir, threshold)))._1.cache())

  /** Connected components over duplicate pairs by iterative min-label
    * propagation with pointer doubling: each iteration is an edge join
    * plus a label self-join plus one aggregation (all keyed shuffles),
    * converging in O(log diameter) rounds — near-dup components are
    * shallow, so 2-4 rounds in practice, and even pathological chains
    * need only logarithmically many. Every third round the labels are
    * localCheckpoint'd:
    * without it the plan lineage doubles per round and Catalyst
    * re-analysis dominates after ~10 rounds (long-chain components).
    * `pairs` is left un-cached/un-unpersisted here so callers can hand
    * in a shared cached pair set (verifiedPairsFor) without this loop
    * evicting it; only the edge table and labels are loop-owned.
    * Returns (doc_id, canonical) with canonical = min doc_id of the
    * component. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, maxIter)._1

  /** connectedComponentsWithRounds' optional `knownPairCount`: callers
    * that already materialized and counted the pair table (the memo
    * builds) pass it so the loop sizes its shuffle width without
    * re-counting — one fewer job on the clusters hot path. */

  /** connectedComponents plus the number of propagation rounds run —
    * rounds grow with log(component diameter), not component or corpus
    * size, which is the property that keeps the fixpoint cheap at
    * 100 TB (ScaleStressSpec pins it). */
  def connectedComponentsWithRounds(pairs: DataFrame, maxIter: Int = 50,
      knownPairCount: Option[Long] = None): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .cache()
    // Size the loop's shuffle width to the EDGE TABLE, not the session
    // default: each round is several keyed exchanges over the label
    // table, and at the session's full width a few-hundred-row label
    // set schedules ~150 near-empty tasks per round — pure latency
    // (measured ~1.5 s/round at sf0.1, the dominant CC cost). 100k
    // edges per partition keeps partitions well under execution memory
    // at any scale; the width only ever shrinks below the session
    // setting, never grows past it, so a 1000-executor deployment keeps
    // its configured parallelism once edges warrant it. Restored in the
    // finally — the session's other queries never see the narrow width.
    val conf = spark.conf
    val sessionWidth = conf.get("spark.sql.shuffle.partitions").toInt
    val sessionAqe = conf.get("spark.sql.adaptive.enabled")
    // known count → skip the counting job; the edge cache then
    // materializes inside the init-labels aggregation instead
    val edgeCount = knownPairCount.map(_ * 2).getOrElse(edges.count())
    val loopWidth = math.max(1L, math.min(sessionWidth.toLong,
      edgeCount / 100000 + 1)).toInt
    conf.set("spark.sql.shuffle.partitions", loopWidth.toString)
    // AQE off inside the loop: the width above is already sized to the
    // data, and AQE's per-shuffle-stage materialize-and-replan pauses
    // are pure overhead on a fixpoint of many small staged jobs
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
    // Seed labels with min(id, min neighbor) — exactly what round 1 of
    // plain propagation would compute, for one groupBy over the edge
    // table instead of a join+union+aggregate round. prevSum is seeded
    // from the same table so a star-shaped component (already at its
    // fixpoint after this init) converges in ONE confirming round.
    var labels = edges.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("canonical"))
      .select(col("src").as("id"), col("canonical")).cache()
    var iter = 0
    var converged = false
    // convergence via Σ canonical: min-label propagation only ever
    // lowers labels, so an unchanged sum IS the fixpoint — one cheap
    // aggregation per round instead of a full label-diff join
    var prevSum = labels.agg(coalesce(sum(col("canonical")), lit(0L)))
      .head().getLong(0)
    // the previous round's checkpoint RDD, released once the new round
    // has materialized (see checkpointRdd — Dataset.unpersist can't)
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    while (!converged && iter < maxIter) {
      val tRound = System.nanoTime()
      val propagated = edges
        .join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("canonical"))
      // pointer doubling: also adopt the label OF one's current label
      // (every canonical is itself a vertex id, so the self-join always
      // resolves). Label reach doubles per round, so chain-shaped
      // components converge in O(log diameter) rounds instead of
      // O(diameter) — one extra keyed join of the (small) label table
      // per round buys an exponential cut in rounds, and each round is
      // a full Spark job whose latency floor dominates at every scale.
      val doubled = labels.as("l")
        .join(labels.as("m"), col("l.canonical") === col("m.id"))
        .select(col("l.id").as("id"), col("m.canonical").as("canonical"))
      val merged = labels.unionByName(propagated).unionByName(doubled)
        .groupBy("id").agg(min(col("canonical")).as("canonical"))
      // Truncate lineage EVERY round: the round plan references `labels`
      // three times, so an un-checkpointed plan tree grows ~3^round and
      // Catalyst re-analysis dominates within a handful of rounds
      // (measured: 0.8 s → 1.9 s → 14 s per round with plain cache).
      // Lazy checkpoint — the Σ probe below is the action that
      // materializes it, so each round stays a single job over
      // constant-size plans (edges leaf ⋈ checkpointed labels leaf).
      val next = merged.localCheckpoint(false)
      // coalesce: an empty pair set yields sum(NULL) — converge, don't NPE
      val s = next.agg(coalesce(sum(col("canonical")), lit(0L))).head().getLong(0)
      converged = s == prevSum
      prevSum = s
      labels.unpersist() // round-0 seed cache (no-op on checkpointed rounds)
      // the Σ probe above materialized `next`, so the superseded round's
      // checkpoint blocks can be dropped NOW instead of at GC time
      prevCkpt.foreach(_.unpersist(false))
      prevCkpt = checkpointRdd(next)
      labels = next
      iter += 1
      if (debug) println(f"[cc] round $iter ${(System.nanoTime() - tRound) / 1e9}%.3f s")
    }
    edges.unpersist()
    // the final round's checkpoint backs the returned frame — it stays
    // persisted until clearMemos() releases it with the memo caches
    prevCkpt.foreach(liveCkpts.add)
    (labels.select(col("id").as("doc_id"), col("canonical")), iter)
    } finally {
      conf.set("spark.sql.shuffle.partitions", sessionWidth.toString)
      conf.set("spark.sql.adaptive.enabled", sessionAqe)
    }
  }

  /** Shared oracle CTE chain deriving the SRP-verified candidate pairs
    * (`dd` carries dot/norms per candidate) — interpolated into BOTH
    * embedding-LSH oracles so the arithmetic can never drift between
    * them. `buck` is referenced twice (the band self-join): MATERIALIZED
    * keeps DuckDB from inlining — and re-running — the whole projection
    * chain per reference (a long-session OOM otherwise).
    *
    * Id-domain contract for the Knuth multiply below: the multiplicand
    * is `p·d + i` with p < 128 planes and i < d vector dims — bounded
    * by 128·d (≈2¹³ at d=64), so `k · 2654435761` peaks around 2⁴⁵,
    * nowhere near int64 overflow at ANY corpus size (the hash is over
    * plane/dim indices, never over data-sized ids — unlike the split
    * coins, which use the md5-prefix idiom for exactly that reason). */
  private val srpOracleCtes =
    """e AS (SELECT vec_id, embedding FROM embeddings),
      |x AS (SELECT vec_id, len(embedding) AS d,
      |        generate_subscripts(embedding, 1) - 1 AS i, unnest(embedding) AS v FROM e),
      |pl AS (SELECT unnest(range(0, 128)) AS p),
      |kx AS (SELECT x.vec_id, pl.p, x.i, x.v,
      |        ((pl.p * x.d + x.i) * 2654435761) % 4294967296 AS h1
      |       FROM x CROSS JOIN pl),
      |hx AS (SELECT vec_id, p, i, v,
      |        (xor(h1, h1 >> 16) * 40503) % 4294967296 AS h2 FROM kx),
      |sx AS (SELECT vec_id, p, i,
      |        CASE WHEN (xor(h2, h2 >> 15) & 1) = 1
      |          THEN CAST(v AS DOUBLE) ELSE -CAST(v AS DOUBLE) END AS t
      |       FROM hx),
      |proj AS (SELECT vec_id, p,
      |        list_reduce(list_prepend(0.0, list(t ORDER BY i)), (a, b) -> a + b) AS proj
      |       FROM sx GROUP BY vec_id, p),
      |buck AS MATERIALIZED (SELECT vec_id, p // 8 AS band,
      |        sum(CASE WHEN proj >= 0 THEN 1 << (p % 8) ELSE 0 END) AS bucket
      |       FROM proj GROUP BY vec_id, p // 8),
      |cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
      |       FROM buck a JOIN buck b
      |         ON a.band = b.band AND a.bucket = b.bucket AND b.vec_id > a.vec_id),
      |pe AS (SELECT c.v1, c.v2, ea.embedding AS e1, eb.embedding AS e2
      |       FROM cand c JOIN e ea ON ea.vec_id = c.v1 JOIN e eb ON eb.vec_id = c.v2),
      |xx AS (SELECT v1, v2, unnest(e1) AS a, unnest(e2) AS b FROM pe),
      |dd AS (SELECT v1, v2, sum(CAST(a AS DOUBLE) * b) AS dot,
      |        sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
      |       FROM xx GROUP BY v1, v2)""".stripMargin

  /** SRP duplicate edges at cos ≥ 0.4 + recursive reachability —
    * shared by the embedding clusters and survivors oracles (dup is
    * MATERIALIZED: it sits under the recursion and is referenced
    * twice by `edges`). */
  private val srpReachCtes =
    """dup AS MATERIALIZED (SELECT v1, v2 FROM dd
      |        WHERE round(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.4),
      |edges AS (SELECT v1 AS a, v2 AS b FROM dup UNION SELECT v2, v1 FROM dup),
      |reach(id, r) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e2.b, r.r FROM reach r JOIN edges e2 ON e2.a = r.id)""".stripMargin

  /** Shared oracle CTE chain for the text-dedup family: distinct
    * word-3-gram shingles per document, per-doc set sizes, and
    * shared-shingle intersection counts per candidate pair. Factored so
    * the text-dedup oracles (pairs ×2, clusters, survivors, and
    * Coverage5's containment) can never drift in their
    * shingle/threshold arithmetic. */
  private[operators] val shingleOracleCtes =
    """toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      |idx AS (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM toks WHERE len(w) >= 3),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |       FROM idx WHERE i <= len(w) - 2),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
      |          GROUP BY 1, 2)""".stripMargin

  /** [[shingleOracleCtes]] with a document-frequency cap on the join
    * key (round-6 verdict #2): shingles appearing in more than `maxDf`
    * documents are dropped from the representation BEFORE the pair
    * self-join, bounding the candidate blow-up at Σ df(shingle)² ≤
    * maxDf · Σ df — linear in corpus size — against boilerplate-heavy
    * corpora (license headers, navigation chrome) where one hot
    * shingle otherwise yields df² pairs. Sizes are computed over the
    * capped sets too, so the semantics are self-consistent: containment
    * over the capped representation (the standard move — hot shingles
    * carry no dedup signal anyway; cf. support thresholds in frequent
    * itemset mining). Identical CTE text serves both engines, keeping
    * the oracle exact. */
  private[operators] def shingleCappedOracleCtes(maxDf: Int): String =
    s"""toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      |idx AS (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM toks WHERE len(w) >= 3),
      |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |       FROM idx WHERE i <= len(w) - 2),
      |keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= $maxDf),
      |sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
      |          GROUP BY 1, 2)""".stripMargin

  /** Drop shingles whose document frequency exceeds `maxDf` — the
    * Spark twin of the `keep`/`sh` CTEs above. Formulated as a count
    * over a shingle-partitioned window (no ORDER BY → whole-partition
    * frame, no range tracking) rather than an aggregate + semi-join:
    * the window's exchange hashpartitions on exactly the key the
    * downstream pair self-join shuffles on, so the join consumes the
    * capped table through ReusedExchange instead of paying a fresh
    * data-sized exchange per join side (measured: whole-query median
    * 3.62 s → 2.74 s at sf0.1, exchanges 11 → 9). */
  def dfCappedShingles(sh: DataFrame, maxDf: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shingle")
    sh.withColumn("_df", count(lit(1)).over(w))
      .filter(col("_df") <= maxDf)
      .select("doc_id", "shingle")
  }

  /** Asymmetric containment pairs |A∩B| / min(|A|,|B|) ≥ threshold over
    * a (doc_id, shingle) table whose shingle column is already hashed —
    * shared by the exact anchor (Coverage5 q_dedup_containment) and its
    * DF-capped variant so the two can never drift in arithmetic. */
  def containmentPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("b.doc_id") > col("a.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("containment",
        round(col("inter").cast("double") / least(col("n1"), col("n2")), 6))
      .filter(col("containment") >= threshold)
      .select("d1", "d2", "containment")
  }

  /** Exact-Jaccard pair listing at threshold 0.8 — the full oracle of
    * BOTH q_dedup_ngram_jaccard and q_dedup_minhash_lsh (LSH with
    * deterministic seeds + exact verification finds the identical set;
    * sharing one string makes that claim structural). */
  private val jaccardOracleSql =
    s"""WITH $shingleOracleCtes
      |SELECT d1, d2,
      |       round(CAST(inter AS DOUBLE) / (s1.n + s2.n - inter), 6) AS jaccard
      |FROM pairs JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
      |WHERE round(CAST(inter AS DOUBLE) / (s1.n + s2.n - inter), 6) >= 0.8
      |""".stripMargin

  /** Duplicate edges at 0.8 + recursive reachability — shared by the
    * clusters and survivors oracles. */
  private[operators] val reachOracleCtes =
    """dup AS (SELECT d1, d2
      |        FROM pairs JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
      |        WHERE round(CAST(inter AS DOUBLE) / (s1.n + s2.n - inter), 6) >= 0.8),
      |edges AS (SELECT d1 AS a, d2 AS b FROM dup UNION SELECT d2, d1 FROM dup),
      |reach(id, r) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.id)""".stripMargin

  val defs: Seq[QDef] = Seq(

    // Exact dedup: keep the lowest doc_id per normalized-content hash.
    // min-per-group, not row_number-over-window: the aggregate partial-
    // combines map-side so only (hash, min_id) pairs shuffle — at
    // 100 TB that's the difference between shuffling a fingerprint per
    // duplicate *group* and sorting every row within its hash partition.
    QDef("q_dedup_docs_exact",
      """SELECT min(doc_id) AS doc_id FROM documents
        |GROUP BY md5(lower(trim(text)))
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .groupBy(md5(lower(trim(col("text"))).cast("binary")))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
    },

    // Exact n-gram Jaccard near-dup pairs (threshold 0.8). The corpus
    // contains planted near-duplicates (~0.99 Jaccard).
    QDef("q_dedup_ngram_jaccard",
      jaccardOracleSql) { (s, dir) =>
      jaccardPairs(shingles(table(s, dir, "documents")), 0.8)
    },

    // MinHash(32 hashes) + LSH(16 bands × 2) candidates, then exact
    // verification — the scale path: no all-pairs comparison exists.
    // Deterministic oracle: the verified output is exactly the ≥0.8
    // exact-Jaccard pair set whenever banding recall is total, and with
    // fixed permutation seeds recall on a given corpus is a
    // deterministic fact, not a per-run coin flip — ~0.99-Jaccard
    // planted dups collide in some band with probability 1-(1-0.98)^16
    // per pair (miss odds ~1e-27). DedupSimSpec separately asserts the
    // exact ⊆ candidates direction.
    QDef("q_dedup_minhash_lsh",
      jaccardOracleSql) { (s, dir) =>
      verifiedPairsFor(s, dir, 0.8)
    },

    // SimHash near-dup: 4 bands × 16 bits block candidates, hamming ≤ 6
    // confirms. Fully deterministic: the portable token-hash mode makes
    // every stage (per-token polynomial pair, bit votes, banding,
    // hamming) recomputable by DuckDB, so the driver hash-compares the
    // whole pair set. Bits ≥ 61 never vote positive (both folds < 2^30,
    // packed (h31<<31)|h131), so the oracle votes over 0..60 only.
    QDef("q_dedup_simhash",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents),
        |th AS (
        |  SELECT doc_id,
        |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        [CAST(unicode(c) AS BIGINT) for c in split(w, '')]),
        |       (a, x) -> (a * 31 + x) % 1000000007) << 31)
        |    | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        [CAST(unicode(c) AS BIGINT) for c in split(w, '')]),
        |       (a, x) -> (a * 131 + x) % 998244353) AS h
        |  FROM toks WHERE w <> ''),
        |bits AS (
        |  SELECT doc_id, b,
        |    CASE WHEN sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
        |      THEN CAST(1 AS BIGINT) << b ELSE 0 END AS bitval
        |  FROM th CROSS JOIN (SELECT unnest(range(0, 61)) AS b) bs
        |  GROUP BY doc_id, b),
        |sig AS (SELECT doc_id, sum(bitval) AS simhash FROM bits GROUP BY doc_id),
        |banded AS (
        |  SELECT doc_id, simhash, band, (simhash >> (band * 16)) & 65535 AS bucket
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bands),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bucket = b.bucket AND b.doc_id > a.doc_id)
        |SELECT d1, d2, hamming FROM pairs WHERE hamming <= 6
        |""".stripMargin) { (s, dir) =>
      // deliberately NOT cached: the plan is referenced twice (banded
      // self-join) but is scan + per-row codegen expressions — the
      // recompute is cheaper than a cache entry nobody can unpersist
      // from a lazily-returned plan (round-4 verdict: the old .cache()
      // here stranded one cached table per invocation)
      val sig = simhash(table(s, dir, "documents"), portable = true)
      val banded = sig.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            expr(s"shiftright(simhash, ${b * 16}) & 65535").as("bucket"))): _*)).as("bb"))
        .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bucket"))
      banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
            && col("b.doc_id") > col("a.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
            .cast("bigint").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 6)
    },

    // Duplicate clusters: pairs → connected components → canonical doc
    // per component (the "keep one per cluster" step after pair
    // finding). The fixpoint is deterministic, so the oracle recomputes
    // reachability with a recursive CTE and takes min(reachable id) per
    // node; DedupSimSpec additionally verifies a union-find reference.
    QDef("q_dedup_clusters",
      s"""WITH RECURSIVE
        |$shingleOracleCtes,
        |$reachOracleCtes
        |SELECT id AS doc_id, min(r) AS canonical FROM reach GROUP BY id
        |""".stripMargin) { (s, dir) =>
      // pairs come from the LSH pipeline, not exact all-pairs Jaccard:
      // the pair sets are identical on this corpus (q_dedup_minhash_lsh
      // carries the exact-pairs oracle), and CC-over-LSH-verified-pairs
      // is the composition that actually runs at 100 TB — all-pairs
      // shingle joins don't.
      clusterLabelsFor(s, dir, 0.8)
    },

    // Survivor selection — the final step of the dedup story: within
    // each duplicate cluster keep the highest-quality document (here
    // token count; max score, smallest doc_id on ties) via the
    // bounded `argmax_by` aggregate — one buffer per cluster per map
    // partition crosses the exchange, no per-cluster sort. Shares the
    // memoized pair set and CC labels' input with q_dedup_clusters.
    QDef("q_dedup_survivors",
      s"""WITH RECURSIVE
        |$shingleOracleCtes,
        |$reachOracleCtes,
        |cc AS (SELECT id AS doc_id, min(r) AS canonical FROM reach GROUP BY id),
        |tok AS (SELECT doc_id,
        |          CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |        FROM documents),
        |j AS (SELECT cc.doc_id, cc.canonical, tok.n_tokens
        |      FROM cc JOIN tok USING (doc_id)),
        |rk AS (SELECT canonical, doc_id, n_tokens,
        |         row_number() OVER (PARTITION BY canonical
        |           ORDER BY n_tokens DESC, doc_id) AS rk,
        |         CAST(count(*) OVER (PARTITION BY canonical) AS BIGINT) AS n_docs
        |       FROM j)
        |SELECT canonical, doc_id AS keep_id, n_tokens, n_docs FROM rk WHERE rk = 1
        |""".stripMargin) { (s, dir) =>
      graft.functions.TopKBy.register(s)
      val cc = clusterLabelsFor(s, dir, 0.8)
      val tok = table(s, dir, "documents").select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
      cc.join(tok, "doc_id")
        .groupBy("canonical")
        .agg(expr("argmax_by(struct(doc_id, n_tokens), CAST(n_tokens AS DOUBLE), doc_id)")
          .as("best"), count(lit(1)).as("n_docs"))
        .select(col("canonical"), col("best.doc_id").as("keep_id"),
          col("best.n_tokens").as("n_tokens"), col("n_docs"))
    },

    // Leakage-safe train/valid/test split: the q_train_test_split hash
    // applied to the CANONICAL cluster id instead of the doc id, so a
    // near-duplicate family always lands in ONE split — the guard
    // against test-set contamination by paraphrases/re-crawls that a
    // per-doc split cannot give (Lee et al.'s dedup argument applied
    // to the split boundary). Singletons (docs in no duplicate pair)
    // are their own canonical. Shares the memoized LSH pair set and
    // CC labels with q_dedup_clusters — at 100 TB the labels are the
    // once-per-snapshot assignment table (dup-involved docs only,
    // corpus-sized in the worst case), so the label attach is a plain
    // keyed equi-join on doc_id, never a broadcast. The no-cluster-
    // spans-two-splits invariant is pinned in Coverage19Spec.
    QDef("q_split_leakage_safe",
      s"""WITH RECURSIVE
        |$shingleOracleCtes,
        |$reachOracleCtes,
        |cc AS (SELECT id AS doc_id, min(r) AS canonical FROM reach GROUP BY id),
        |lab AS (SELECT d.doc_id, coalesce(cc.canonical, d.doc_id) AS canonical
        |        FROM documents d LEFT JOIN cc USING (doc_id)),
        |sp AS (SELECT doc_id, canonical,
        |         CASE WHEN substring(md5(CAST(canonical AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
        |              WHEN substring(md5(CAST(canonical AS VARCHAR)), 1, 8) < 'e6666666' THEN 'valid'
        |              ELSE 'test' END AS split
        |       FROM lab)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT canonical) AS BIGINT) AS n_clusters,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM sp GROUP BY split ORDER BY split
        |""".stripMargin) { (s, dir) =>
      val cc = clusterLabelsFor(s, dir, 0.8)
      val lab = table(s, dir, "documents").select(col("doc_id"))
        .join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("canonical"), col("doc_id")).as("canonical"))
      // md5-prefix membership coin (q_train_test_split's overflow-free
      // idiom — the Knuth multiply wraps int64 for canonicals ≥ ~3.47e9)
      val bucket =
        substring(md5(col("canonical").cast("string").cast("binary")), 1, 8)
      lab.select(col("doc_id"), col("canonical"),
          when(bucket < "cccccccc", "train").when(bucket < "e6666666", "valid")
            .otherwise("test").as("split"))
        .groupBy("split")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          countDistinct(col("canonical")).cast("long").as("n_clusters"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("split")
    },

    // Embedding-cosine near-dup over bounded id-bands (oracle anchor;
    // the unbounded version is LSH/IVF territory — see SimilarityOps).
    QDef("q_dedup_embedding",
      """WITH p AS (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2, a.embedding AS e1, b.embedding AS e2
        |  FROM embeddings a JOIN embeddings b
        |    ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 100),
        |x AS (SELECT v1, v2, unnest(e1) AS a, unnest(e2) AS b FROM p),
        |d AS (SELECT v1, v2, sum(CAST(a AS DOUBLE) * b) AS dot,
        |             sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |      FROM x GROUP BY v1, v2)
        |SELECT v1, v2, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos
        |FROM d WHERE round(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.4
        |""".stripMargin) { (s, dir) =>
      import graft.functions.VectorOps
      VectorOps.ensure(s)
      // Norms are precomputed per vector (O(N)); the id-band condition
      // is expressed as equi-joins on 100-wide blocks (a pair ≤100 apart
      // lives in the same or adjacent block), so Catalyst hash-joins
      // instead of a broadcast-nested-loop over all pairs. The codegen'd
      // dot product runs only per surviving candidate pair.
      val e = table(s, dir, "embeddings")
        .withColumn("nsq", VectorOps.normSq(col("embedding")))
        .withColumn("blk", floor(col("vec_id") / 100))
      val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("nsq").as("n1"), col("blk").as("blk1"))
      val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        col("nsq").as("n2"), col("blk").as("blk2"))
      val band = col("v2") > col("v1") && col("v2") <= col("v1") + 100
      val pairs = a.join(b, col("blk1") === col("blk2") && band)
        .unionByName(a.join(b, col("blk1") + 1 === col("blk2") && band))
      pairs
        .withColumn("cos", round(
          VectorOps.dot(col("e1"), col("e2")) / (sqrt(col("n1")) * sqrt(col("n2"))), 6))
        .filter(col("cos") >= 0.4)
        .select("v1", "v2", "cos")
    },

    // Embedding near-dup, SRP-LSH scale path: signed-random-projection
    // buckets (16 bands × 8 bits, codegen'd `srp_buckets`) turn cosine
    // proximity into an equi-join key — the same anchor/scale pairing
    // as exact-Jaccard vs MinHash+LSH on text. The hyperplanes are
    // pure integer arithmetic (no RNG state), so DuckDB recomputes the
    // identical buckets, candidates, and verified pairs from the same
    // parquet bytes: the oracle is exact, not statistical. Candidates
    // are verified with the exact cosine at the same 0.4 threshold as
    // q_dedup_embedding; `SrpSpec` additionally demonstrates ≥99%
    // recall on a planted high-cosine corpus, where LSH actually earns
    // its keep.
    QDef("q_dedup_embedding_lsh",
      s"""WITH $srpOracleCtes
        |SELECT v1, v2, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos
        |FROM dd WHERE round(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.4
        |""".stripMargin) { (s, dir) =>
      srpVerifiedPairsFor(s, dir, 0.4)
    },

    // Embedding duplicate clusters: connected components over the
    // SRP-verified pair set — the embedding-side parallel of
    // q_dedup_clusters (pairs → min-label fixpoint → canonical id per
    // clustered vector). Shares the memoized pair table with
    // q_dedup_embedding_lsh; the oracle re-derives the identical pairs
    // (deterministic SRP) and recomputes reachability recursively.
    QDef("q_dedup_embedding_clusters",
      s"""WITH RECURSIVE
        |$srpOracleCtes,
        |$srpReachCtes
        |SELECT id AS vec_id, min(r) AS canonical FROM reach GROUP BY id
        |""".stripMargin) { (s, dir) =>
      srpLabelsFor(s, dir, 0.4)
    },

    // Embedding survivor selection — the vector twin of
    // q_dedup_survivors: within each embedding duplicate cluster keep
    // the largest-norm vector (max rounded ‖x‖², smallest vec_id on
    // ties) via the bounded argmax_by aggregate, over the memoized
    // cluster labels.
    QDef("q_dedup_embedding_survivors",
      s"""WITH RECURSIVE
        |$srpOracleCtes,
        |$srpReachCtes,
        |cc AS (SELECT id AS vec_id, min(r) AS canonical FROM reach GROUP BY id),
        |nn AS (SELECT vec_id, round(sum(CAST(a AS DOUBLE) * a), 6) AS nsq
        |       FROM (SELECT vec_id, unnest(embedding) AS a FROM e) u
        |       GROUP BY vec_id),
        |j AS (SELECT cc.vec_id, cc.canonical, nn.nsq
        |      FROM cc JOIN nn USING (vec_id)),
        |rk AS (SELECT canonical, vec_id, nsq,
        |         row_number() OVER (PARTITION BY canonical
        |           ORDER BY nsq DESC, vec_id) AS rk,
        |         CAST(count(*) OVER (PARTITION BY canonical) AS BIGINT) AS n_vecs
        |       FROM j)
        |SELECT canonical, vec_id AS keep_id, nsq, n_vecs FROM rk WHERE rk = 1
        |""".stripMargin) { (s, dir) =>
      graft.functions.TopKBy.register(s)
      val e = table(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val nn = withNormSq(e).select(col("vec_id"), round(col("nsq"), 6).as("nsq"))
      srpLabelsFor(s, dir, 0.4).join(nn, "vec_id")
        .groupBy("canonical")
        .agg(expr("argmax_by(struct(vec_id, nsq), nsq, vec_id)").as("best"),
          count(lit(1)).as("n_vecs"))
        .select(col("canonical"), col("best.vec_id").as("keep_id"),
          col("best.nsq").as("nsq"), col("n_vecs"))
    },
  )

  /** Memoized SRP-verified pair table per (session, corpus, threshold)
    * — q_dedup_embedding_lsh and q_dedup_embedding_clusters consume
    * the identical pair set, and banding + verification dominates
    * both (same sharing rationale as [[verifiedPairsFor]]). */
  private val srpPairsMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Double), DataFrame]

  /** Memoized embedding cluster labels over the shared SRP pair set —
    * same sharing rationale as [[clusterLabelsFor]]. */
  private val srpLabelsMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Double), DataFrame]

  def srpLabelsFor(s: SparkSession, dir: String, threshold: Double): DataFrame =
    memoGet(srpLabelsMemo, "srp_labels", (s, dir, threshold))(
      connectedComponents(srpVerifiedPairsFor(s, dir, threshold)
        .select(col("v1").as("d1"), col("v2").as("d2")))
        .select(col("doc_id").as("vec_id"), col("canonical")).cache())

  def srpVerifiedPairsFor(s: SparkSession, dir: String, threshold: Double): DataFrame =
    memoGet(srpPairsMemo, "srp_pairs", (s, dir, threshold)) {
      val e = table(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val banded = srpBands(e)
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
            && col("b.vec_id") > col("a.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
        .distinct()
      cosineVerify(cand, withNormSq(e), threshold).cache()
    }

  /** vec_id → exploded SRP (band, bucket) rows. Bands carry only three
    * small ints — the 16×-duplicated rows that hit an exchange never
    * carry the vector itself. */
  def srpBands(vectors: DataFrame, bands: Int = 16, bitsPerBand: Int = 8): DataFrame = {
    graft.functions.SrpExpressions.register(vectors.sparkSession)
    vectors.select(col("vec_id"),
      posexplode(call_function("srp_buckets", col("embedding"),
        lit(bands), lit(bitsPerBand))))
      .toDF("vec_id", "band", "bucket")
  }

  /** (vec_id, embedding) plus the precomputed squared norm. */
  def withNormSq(vectors: DataFrame): DataFrame = {
    graft.functions.VectorOps.ensure(vectors.sparkSession)
    vectors.withColumn("nsq", graft.functions.VectorOps.normSq(col("embedding")))
  }

  /** Exact-cosine verification of candidate (v1, v2) pairs: join the
    * vectors back by id (shuffle on vec_id, only candidates move) and
    * keep pairs at or above the threshold. `vectors` must carry
    * (vec_id, embedding, nsq) — see [[withNormSq]]. */
  def cosineVerify(cand: DataFrame, vectors: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.VectorOps
    cand
      .join(vectors.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("nsq").as("n1")), "v1")
      .join(vectors.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        col("nsq").as("n2")), "v2")
      .withColumn("cos", round(
        VectorOps.dot(col("e1"), col("e2")) / (sqrt(col("n1")) * sqrt(col("n2"))), 6))
      .filter(col("cos") >= threshold)
      .select("v1", "v2", "cos")
  }
}
