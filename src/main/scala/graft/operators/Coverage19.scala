package graft.operators

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 extension batch: the supervised/statistical corner of the
  * training-data pipeline — distribution drift as a significance
  * statistic (chi-square, completing the KS/L1 family), grid-histogram
  * percentiles (the mergeable form a 100-TB latency/length monitor
  * actually stores), and an exactly-trainable quality classifier
  * (Gini-optimal decision stump + held-out evaluation).
  *
  * Reference scope: SURVEY.md §2-B LLM-pipeline operator family
  * (quality scoring / drift monitoring); the reference's own surface
  * has no classifier, so these are the from-scratch additions the
  * brief's "training-data pipeline" mandate names.
  *
  * ARITHMETIC DISCIPLINE (the repo-wide oracle-parity convention): no
  * transcendentals cross-engine. Chi-square is rational — every term
  * is built from integer counts with IEEE +,-,*,/ (deterministic,
  * unlike ln), each term is decimal-cast BEFORE the sum so the
  * reduction is order-independent, and only the rounded edge is
  * double. The stump's split objective is compared on a
  * deterministic double derived from exact integer sufficient
  * statistics (sum of squared class counts); percentile thresholds
  * are pure integer ceil division. That is why ALL FOUR queries carry
  * full DuckDB oracles rather than rows-only checks.
  */
object Coverage19 {

  /** Per-(source, len) observed/expected chi-square terms over the
    * word-count grid — shared shape with q_ks_drift so one histogram
    * state can serve both monitors (streaming.IncrementalChiSqDrift
    * reuses the same cells).
    *
    * localCheckpoint: the histogram is grid-sized (|sources|×|grid|)
    * but DOWNSTREAM it fans out to several consumers (marginals,
    * totals, the cell expansion), and each consumer would otherwise
    * re-evaluate the corpus-sized aggregation — the classic
    * DAG-duplication trap. Materializing the tiny result once turns
    * N corpus scans into 1. */
  private def lenHist(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .select(col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("len"))
      .groupBy("source", "len")
      .agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint()

  /** Bucketed (feature, bucket, lang) class-count histogram for the
    * stump — candidate thresholds are BUCKET EDGES, so the candidate
    * set is bounded by the grid (64 + 32 cells) no matter the corpus
    * size: the one corpus-sized exchange is this histogram agg;
    * everything downstream is grid-sized. */
  private def featHist(docs: DataFrame, keys: Seq[String] = Nil)
      : DataFrame = {
    // ONE corpus pass: both feature buckets explode from one row (a
    // unionAll of two projections would scan + tokenize the corpus
    // twice — at 100 TB that is the whole cost of training). `keys`
    // prefix the grouping (the depth-2 tree conditions on the parent
    // split's side column this way).
    val u = docs.select(keys.map(col) ++ Seq(col("lang"), explode(array(
        struct(lit("n_chars").as("feature"),
          least(expr("CAST(n_chars AS BIGINT) div 16"), lit(63L)).as("b")),
        struct(lit("n_tokens").as("feature"),
          least(expr("CAST(size(split(trim(text), ' ')) AS BIGINT) div 4"),
            lit(31L)).as("b")))).as("fb")): _*)
      .select(keys.map(col) ++ Seq(col("lang"),
        col("fb.feature").as("feature"), col("fb.b").as("b")): _*)
    // grid-sized (≤96 buckets × langs × |key-domain|); materialized
    // once because the stump pipeline fans it into grid/langs/cells/
    // lc/tot — unchecked, that lineage re-evaluates THIS corpus-sized
    // agg dozens of times (measured 6.6 s → the checkpointed classify
    // is sub-second)
    u.groupBy((keys ++ Seq("feature", "b", "lang")).map(col): _*)
      .agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint()
  }

  /** JOINT (b1, b2, lang) bucket histogram — round-14 optimization
    * (guide §1.2 step 1: remove passes). The depth-2 tree and the
    * train/test classifier need the corpus bucketed CONDITIONALLY (on
    * the root split's side / the holdout flag), which previously cost
    * a second full corpus pass (tokenize + bucket + cross-join against
    * the broadcast root). Both features bucket into a bounded grid
    * (64 × 32 × langs ≤ a few thousand cells), so ONE corpus pass over
    * the joint distribution is sufficient: every per-feature histogram
    * — root, per-side, train-only, test-only — is an exact grid-sized
    * marginalization of these cells (the side/test indicator is a
    * function of (b1, b2) / a rider key, never of the raw row).
    * Identical counts by construction; oracle + Coverage19Spec pin it. */
  private def jointHist(docs: DataFrame, keys: Seq[String] = Nil): DataFrame =
    docs.select(keys.map(col) ++ Seq(col("lang"),
        least(expr("CAST(n_chars AS BIGINT) div 16"), lit(63L)).as("b1"),
        least(expr("CAST(size(split(trim(text), ' ')) AS BIGINT) div 4"),
          lit(31L)).as("b2")): _*)
      .groupBy((keys ++ Seq("lang", "b1", "b2")).map(col): _*)
      .agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint()

  /** The (feature, b, lang, c) histogram [[featHist]] produces, derived
    * from the joint cells by marginalization — grid-sized work only. */
  private def featHistFromJoint(joint: DataFrame,
      keys: Seq[String] = Nil): DataFrame =
    joint.select(keys.map(col) ++ Seq(col("lang"), col("c"), explode(array(
        struct(lit("n_chars").as("feature"), col("b1").as("b")),
        struct(lit("n_tokens").as("feature"), col("b2").as("b")))).as("fb")): _*)
      .select(keys.map(col) ++ Seq(col("lang"), col("c"),
        col("fb.feature").as("feature"), col("fb.b").as("b")): _*)
      .groupBy((keys ++ Seq("feature", "b", "lang")).map(col): _*)
      .agg(sum(col("c")).cast("long").as("c"))

  /** Grid-side stump scoring: from the (feature, b, lang, c) histogram
    * to per-candidate (feature, b, nl, nr, sl2, sr2, s). Exact integer
    * sufficient statistics; `s = sl2/nl + sr2/nr` is the
    * maximize-form of weighted Gini (G = 1 - s/n), compared as a
    * deterministic double (built from identical integers by identical
    * IEEE ops on both engines). */
  private def stumpCandidates(h: DataFrame): DataFrame = {
    val (lc, tot) = cumAndTotals(h)
    stumpCandidatesFrom(lc, tot)
  }

  /** Per-candidate sufficient statistics PLUS each side's majority
    * label (min_by over a (−count, lang) struct = count-desc lang-asc
    * tie-break) — carried in the same aggregate so the classifier
    * never needs a second pass over the grid. `keys` prefix every
    * grouping (conditioning columns of a deeper tree level). */
  private def stumpCandidatesFrom(lc: DataFrame, tot: DataFrame,
      keys: Seq[String] = Nil): DataFrame =
    lc.join(tot, keys ++ Seq("feature", "lang"))
      .groupBy((keys ++ Seq("feature", "b")).map(col): _*)
      .agg(sum(col("lcnt")).cast("long").as("nl"),
        sum(col("tcnt") - col("lcnt")).cast("long").as("nr"),
        sum(col("lcnt") * col("lcnt")).cast("long").as("sl2"),
        sum((col("tcnt") - col("lcnt")) * (col("tcnt") - col("lcnt")))
          .cast("long").as("sr2"),
        min_by(col("lang"),
          struct((-col("lcnt")).as("k1"), col("lang"))).as("left_lang"),
        min_by(col("lang"),
          struct((col("lcnt") - col("tcnt")).as("k1"), col("lang")))
          .as("right_lang"))
      .filter(col("nl") > 0 && col("nr") > 0)
      .withColumn("s",
        col("sl2").cast("double") / col("nl")
          + col("sr2").cast("double") / col("nr"))

  /** The lc/tot pair of the stump algebra: per-candidate per-class
    * cumulative (left-of-split) counts and per-class totals, both off
    * the zero-filled grid×langs cell expansion. The cell table is
    * grid-sized and fans into both outputs, so it is checkpointed. */
  private def cumAndTotals(h: DataFrame, keys: Seq[String] = Nil)
      : (DataFrame, DataFrame) = {
    val kf = keys :+ "feature"
    val grid = h.select((kf :+ "b").map(col): _*).distinct()
    val langs = h.select((kf :+ "lang").map(col): _*).distinct()
    val cells = grid.join(langs, kf)
      .join(h, kf ++ Seq("b", "lang"), "left")
      .select((kf ++ Seq("b", "lang")).map(col) :+
        coalesce(col("c"), lit(0L)).as("c"): _*)
      .localCheckpoint()
    val wCum = Window.partitionBy((kf :+ "lang").map(col): _*).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lc = cells.select((kf ++ Seq("b", "lang")).map(col) :+
      sum(col("c")).over(wCum).cast("long").as("lcnt"): _*)
    val tot = cells.groupBy((kf :+ "lang").map(col): _*)
      .agg(sum(col("c")).cast("long").as("tcnt"))
    (lc, tot)
  }

  /** The shared stump-training SQL body (train-set parameterized by a
    * WHERE clause) — one definition so q_tree_stump and
    * q_tree_classify's oracles cannot drift. */
  private def stumpCtes(where: String): String =
    s"""d AS (SELECT lang, CAST(n_chars AS BIGINT) AS f1,
       |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS f2
       |  FROM documents $where),
       |u AS (SELECT lang, 'n_chars' AS feature, least(f1 // 16, 63) AS b FROM d
       |      UNION ALL
       |      SELECT lang, 'n_tokens' AS feature, least(f2 // 4, 31) AS b FROM d),
       |h AS (SELECT feature, b, lang, CAST(count(*) AS BIGINT) AS c
       |      FROM u GROUP BY 1, 2, 3),
       |grid AS (SELECT DISTINCT feature, b FROM h),
       |langs AS (SELECT DISTINCT feature, lang FROM h),
       |cells AS (SELECT g.feature, g.b, l.lang, coalesce(h.c, 0) AS c
       |  FROM grid g JOIN langs l ON l.feature = g.feature
       |  LEFT JOIN h ON h.feature = g.feature AND h.b = g.b
       |    AND h.lang = l.lang),
       |lc AS (SELECT feature, b, lang,
       |    CAST(sum(c) OVER (PARTITION BY feature, lang ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS lcnt
       |  FROM cells),
       |tot AS (SELECT feature, lang, CAST(sum(c) AS BIGINT) AS tcnt
       |        FROM cells GROUP BY 1, 2),
       |cand AS (SELECT lc.feature, lc.b,
       |    CAST(sum(lc.lcnt) AS BIGINT) AS nl,
       |    CAST(sum(tot.tcnt - lc.lcnt) AS BIGINT) AS nr,
       |    CAST(sum(lc.lcnt * lc.lcnt) AS BIGINT) AS sl2,
       |    CAST(sum((tot.tcnt - lc.lcnt) * (tot.tcnt - lc.lcnt))
       |      AS BIGINT) AS sr2
       |  FROM lc JOIN tot ON tot.feature = lc.feature
       |    AND tot.lang = lc.lang
       |  GROUP BY 1, 2),
       |scored AS (SELECT feature, b, nl, nr,
       |    CAST(sl2 AS DOUBLE) / nl + CAST(sr2 AS DOUBLE) / nr AS s
       |  FROM cand WHERE nl > 0 AND nr > 0),
       |r AS (SELECT feature, b, nl, nr, s,
       |    CAST(ROW_NUMBER() OVER (ORDER BY s DESC, feature, b)
       |      AS BIGINT) AS rn
       |  FROM scored)""".stripMargin

  val defs: Seq[QDef] = Seq(

    // ---- chi-square drift per source -----------------------------------
    // The significance-weighted sibling of q_ks_drift: per source, the
    // chi-square homogeneity statistic of the 2×grid table (this
    // source vs the rest of the corpus) over the doc-length
    // distribution. KS sees the worst CDF gap; chi-square sees the
    // aggregate cell-level distortion weighted by expectation, which
    // is what monitoring dashboards alarm on. Rational arithmetic
    // throughout — counts are integers, E = n_s·c_b/n is one IEEE
    // expression, ln never appears. The reduction is FIXED-POINT: each
    // term is floored at 1e-6 into a BIGINT and the sum is exact
    // integer addition, because the repo's usual decimal-cast-then-sum
    // is NOT cross-engine-safe for arbitrary doubles — Spark types
    // decimal(38,10)+decimal(38,10) as decimal(38,9) (precision cap),
    // rounding every pair-sum a digit early, while DuckDB keeps scale
    // 10; at sf0.001 that flipped src15's 6th decimal (spec-pinned).
    // floor() of the IDENTICAL double has no rounding-mode ambiguity
    // at all. Truncation bias ≤ 2·|grid|·1e-6 — far under the
    // statistic's own resolution. Plan: ONE corpus-sized histogram
    // exchange; the source×grid expansion and the per-source sum are
    // bounded by |sources|×|grid|.
    QDef("q_chisq_drift",
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS len
        |  FROM documents),
        |h AS (SELECT source, len, CAST(count(*) AS BIGINT) AS c
        |      FROM d GROUP BY source, len),
        |cb AS (SELECT len, CAST(sum(c) AS BIGINT) AS cb FROM h GROUP BY len),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY source),
        |ntot AS (SELECT CAST(sum(c) AS BIGINT) AS ntot FROM h),
        |x AS (
        |  SELECT ns.source, cb.len, cb.cb, ns.n, ntot.ntot,
        |    CAST(coalesce(h.c, 0) AS BIGINT) AS o
        |  FROM ns CROSS JOIN cb CROSS JOIN ntot
        |  LEFT JOIN h ON h.source = ns.source AND h.len = cb.len
        |  WHERE ns.n < ntot.ntot),
        |t AS (
        |  SELECT source, n,
        |    (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * cb / ntot)
        |      * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * cb / ntot)
        |      / (CAST(n AS DOUBLE) * cb / ntot) AS ts,
        |    (CAST(cb - o AS DOUBLE) - CAST(ntot - n AS DOUBLE) * cb / ntot)
        |      * (CAST(cb - o AS DOUBLE) - CAST(ntot - n AS DOUBLE) * cb / ntot)
        |      / (CAST(ntot - n AS DOUBLE) * cb / ntot) AS tr
        |  FROM x)
        |SELECT source,
        |  CAST(sum(CAST(floor(ts * 1000000) AS BIGINT)
        |    + CAST(floor(tr * 1000000) AS BIGINT)) AS DOUBLE)
        |    / 1000000 AS chisq,
        |  CAST(count(*) - 1 AS BIGINT) AS dof,
        |  n
        |FROM t GROUP BY source, n ORDER BY source
        |""".stripMargin) { (s, dir) =>
      val h = lenHist(s, dir)
      val cb = h.groupBy("len").agg(sum(col("c")).cast("long").as("cb"))
      val ns = h.groupBy("source").agg(sum(col("c")).cast("long").as("n"))
      val nTot = h.agg(sum(col("c")).cast("long").as("ntot"))
      // n < ntot: a source with an empty complement (single-source
      // corpus) has no rest-of-corpus to test against — its statistic
      // is undefined, and the unguarded arithmetic would divide by
      // zero (NaN → three engines disagree on floor(NaN)); emit no row
      val x = ns.crossJoin(broadcast(cb)).crossJoin(broadcast(nTot))
        .join(h, Seq("source", "len"), "left")
        .filter(col("n") < col("ntot"))
        .select(col("source"), col("len"), col("cb"), col("n"), col("ntot"),
          coalesce(col("c"), lit(0L)).as("o"))
      def term(oc: Column, nc: Column): Column = {
        val e = nc.cast("double") * col("cb") / col("ntot")
        (oc.cast("double") - e) * (oc.cast("double") - e) / e
      }
      x.select(col("source"), col("n"),
          term(col("o"), col("n")).as("ts"),
          term(col("cb") - col("o"), col("ntot") - col("n")).as("tr"))
        .groupBy("source", "n")
        .agg((sum(floor(col("ts") * 1000000).cast("long")
          + floor(col("tr") * 1000000).cast("long")).cast("double")
          / 1000000).as("chisq"),
          (count(lit(1)) - 1).cast("long").as("dof"))
        .select(col("source"), col("chisq"), col("dof"), col("n"))
        .orderBy("source")
    },

    // ---- grid-histogram percentiles per source --------------------------
    // Percentiles in the MERGEABLE form a fleet-wide monitor stores:
    // a fixed 64-bucket histogram of n_chars (width 16), percentile =
    // the lower edge of the first bucket whose cumulative count
    // reaches ceil(p·n/100) — pure integer arithmetic end to end, so
    // the result is exact-at-grid-resolution AND bit-reproducible on
    // any cluster (no order-dependent double in sight). The same
    // histogram is an incremental-view feed (cdc.GridPercentile reads
    // percentiles off a live count view); this batch query pins the
    // read-edge semantics. One corpus-sized exchange (histogram agg);
    // the cumulative window runs over ≤64 rows per source.
    QDef("q_grid_percentile",
      """WITH d AS (SELECT source, least(n_chars // 16, 63) AS b FROM documents),
        |h AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c
        |      FROM d GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        |cum AS (SELECT source, b,
        |    CAST(sum(c) OVER (PARTITION BY source ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM h),
        |p AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS p),
        |t AS (SELECT ns.source, p.p, (p.p * ns.n + 99) // 100 AS thresh,
        |        ns.n
        |      FROM ns CROSS JOIN p)
        |SELECT t.source, t.p, CAST(min(cum.b) * 16 AS BIGINT) AS edge, t.n
        |FROM t JOIN cum ON cum.source = t.source AND cum.cum >= t.thresh
        |GROUP BY t.source, t.p, t.n ORDER BY t.source, t.p
        |""".stripMargin) { (s, dir) =>
      val d = table(s, dir, "documents")
        .select(col("source"),
          least(expr("n_chars div 16"), lit(63L)).as("b"))
      // grid-sized; checkpointed so ns and the cumulative scan share
      // ONE corpus aggregation instead of re-deriving it each
      val h = d.groupBy("source", "b")
        .agg(count(lit(1)).cast("long").as("c"))
        .localCheckpoint()
      val ns = h.groupBy("source").agg(sum(col("c")).cast("long").as("n"))
      val wCum = Window.partitionBy("source").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h.select(col("source"), col("b"),
        sum(col("c")).over(wCum).cast("long").as("cum"))
      val ps = s.range(1).select(
        explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
      val t = ns.crossJoin(broadcast(ps))
        .withColumn("thresh", expr("(p * n + 99) div 100"))
      t.join(cum, Seq("source"))
        .filter(col("cum") >= col("thresh"))
        .groupBy("source", "p", "n")
        .agg((min(col("b")) * 16).cast("long").as("edge"))
        .select(col("source"), col("p"), col("edge"), col("n"))
        .orderBy("source", "p")
    },

    // ---- Gini-optimal decision stump (trainable quality classifier) ----
    // The exactly-trainable core of a fastText-style quality filter:
    // over a bounded candidate grid (bucket edges of n_chars and token
    // count), find the split minimizing weighted Gini impurity of the
    // language label. Gini — unlike entropy — is RATIONAL in the
    // class counts, so training is exact: the sufficient statistics
    // (Σ squared class counts left/right of every candidate) are
    // integers from one histogram + one grid-sized cumulative window,
    // and candidates are ranked on a deterministic double with
    // (feature, threshold) tie-breaks. Top-3 candidates reported so
    // the oracle pins the full ranking, not just the argmax.
    QDef("q_tree_stump",
      s"""WITH ${stumpCtes("")},
         |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
         |SELECT r.feature,
         |  CAST(CASE WHEN r.feature = 'n_chars' THEN r.b * 16 + 15
         |            ELSE r.b * 4 + 3 END AS BIGINT) AS threshold,
         |  round(1.0 - r.s / n1.n, 6) + 0.0 AS gini,
         |  r.nl AS n_left, r.nr AS n_right, r.rn
         |FROM r CROSS JOIN n1 WHERE r.rn <= 3 ORDER BY rn
         |""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val cand = stumpCandidates(featHist(docs))
      val n1 = docs.agg(count(lit(1)).cast("long").as("n"))
      val wRank = Window.orderBy(col("s").desc, col("feature"), col("b"))
      cand.withColumn("rn", row_number().over(wRank).cast("long"))
        .filter(col("rn") <= 3)
        .crossJoin(broadcast(n1))
        .select(col("feature"),
          when(col("feature") === "n_chars", col("b") * 16 + 15)
            .otherwise(col("b") * 4 + 3).cast("long").as("threshold"),
          (round(lit(1.0) - col("s") / col("n"), 6) + lit(0.0)).as("gini"),
          col("nl").as("n_left"), col("nr").as("n_right"), col("rn"))
        .orderBy("rn")
    },

    // ---- held-out stump evaluation (confusion matrix) -------------------
    // The train/apply split of the same classifier: train the stump on
    // doc_id % 5 <> 0, label each side with its majority language
    // (count-desc, lang-asc tie-break), classify the held-out 20%, and
    // report the confusion counts — the accuracy gate a production
    // quality filter ships with. Everything after the two histogram
    // aggs is grid-sized; the test-set pass is one broadcast of the
    // 1-row model.
    QDef("q_tree_classify",
      s"""WITH ${stumpCtes("WHERE doc_id % 5 <> 0")},
         |best AS (SELECT feature, b FROM r WHERE rn = 1),
         |lmaj AS (SELECT lc.lang FROM lc JOIN best
         |    ON lc.feature = best.feature AND lc.b = best.b
         |  ORDER BY lc.lcnt DESC, lc.lang LIMIT 1),
         |rmaj AS (SELECT lc.lang FROM lc
         |  JOIN tot ON tot.feature = lc.feature AND tot.lang = lc.lang
         |  JOIN best ON lc.feature = best.feature AND lc.b = best.b
         |  ORDER BY tot.tcnt - lc.lcnt DESC, lc.lang LIMIT 1),
         |test AS (
         |  SELECT doc.lang,
         |    CASE WHEN best.feature = 'n_chars'
         |         THEN least(doc.n_chars // 16, 63)
         |         ELSE least(CAST(len(string_split(trim(doc.text), ' '))
         |                    AS BIGINT) // 4, 31) END AS bd,
         |    best.b AS bb
         |  FROM documents doc CROSS JOIN best WHERE doc.doc_id % 5 = 0)
         |SELECT t.lang AS actual,
         |  CASE WHEN t.bd <= t.bb THEN (SELECT lang FROM lmaj)
         |       ELSE (SELECT lang FROM rmaj) END AS predicted,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM test t GROUP BY 1, 2 ORDER BY actual, predicted
         |""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      // round-14: ONE corpus pass — the joint histogram keyed on the
      // holdout flag serves both the train-side stump and the test-side
      // confusion counts (grid-sized marginalizations; see jointHist)
      val joint = jointHist(
        docs.withColumn("istest", col("doc_id") % 5 === 0), Seq("istest"))
      val h = featHistFromJoint(joint.filter(!col("istest")))
      // per-candidate per-lang left counts (the lc CTE) — needed both
      // for ranking (via stumpCandidates) and the majority labels
      val (lc, tot) = cumAndTotals(h)
      // argmax via min_by over a tie-breaking struct — no global sort
      // window (the candidate table is grid-sized, so the win here is
      // JOB COUNT, not data); the candidate row already carries both
      // sides' majority labels, so the 1-row model is complete
      val best = stumpCandidatesFrom(lc, tot)
        .agg(min_by(
          struct(col("feature"), col("b"),
            col("left_lang"), col("right_lang")),
          struct((-col("s")).as("k1"), col("feature"), col("b"))).as("w"))
        .select(col("w.feature").as("bfeat"), col("w.b").as("bb"),
          col("w.left_lang").as("left_lang"),
          col("w.right_lang").as("right_lang"))
      joint.filter(col("istest"))
        .crossJoin(broadcast(best))
        .select(col("lang"),
          when(
            when(col("bfeat") === "n_chars", col("b1"))
              .otherwise(col("b2")) <= col("bb"),
            col("left_lang")).otherwise(col("right_lang")).as("predicted"),
          col("c"))
        .groupBy(col("lang").as("actual"), col("predicted"))
        .agg(sum(col("c")).cast("long").as("n"))
        .orderBy("actual", "predicted")
    },

    // ---- depth-2 decision tree (the algebra composes) -------------------
    // One more Gini-exact level: the root stump splits the corpus, and
    // each side trains its own stump CONDITIONED on the root — the
    // same cumAndTotals/candidates algebra with a `side` key prefixed
    // to every grouping. Two corpus passes total (root histogram,
    // side-keyed histogram); everything else is grid-sized. Per-node
    // weighted Gini = 1 − s/(nl+nr), exact integers under a
    // deterministic-double ranking as before. A pure or single-bucket
    // side would simply emit no child row (both engines agree).
    QDef("q_tree_depth2",
      s"""WITH ${stumpCtes("")},
         |best AS (SELECT feature, b, nl, nr, s FROM r WHERE rn = 1),
         |d2 AS (SELECT lang, CAST(n_chars AS BIGINT) AS f1,
         |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS f2
         |  FROM documents),
         |sided AS (SELECT
         |    CASE WHEN (CASE WHEN best.feature = 'n_chars'
         |               THEN least(d2.f1 // 16, 63)
         |               ELSE least(d2.f2 // 4, 31) END) <= best.b
         |         THEN 'L' ELSE 'R' END AS side,
         |    d2.lang, d2.f1, d2.f2
         |  FROM d2 CROSS JOIN best),
         |u2 AS (SELECT side, lang, 'n_chars' AS feature,
         |         least(f1 // 16, 63) AS b FROM sided
         |       UNION ALL
         |       SELECT side, lang, 'n_tokens', least(f2 // 4, 31) FROM sided),
         |h2 AS (SELECT side, feature, b, lang, CAST(count(*) AS BIGINT) AS c
         |       FROM u2 GROUP BY 1, 2, 3, 4),
         |grid2 AS (SELECT DISTINCT side, feature, b FROM h2),
         |langs2 AS (SELECT DISTINCT side, feature, lang FROM h2),
         |cells2 AS (SELECT g.side, g.feature, g.b, l.lang,
         |    coalesce(h2.c, 0) AS c
         |  FROM grid2 g JOIN langs2 l
         |    ON l.side = g.side AND l.feature = g.feature
         |  LEFT JOIN h2 ON h2.side = g.side AND h2.feature = g.feature
         |    AND h2.b = g.b AND h2.lang = l.lang),
         |lc2 AS (SELECT side, feature, b, lang,
         |    CAST(sum(c) OVER (PARTITION BY side, feature, lang ORDER BY b
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS lcnt
         |  FROM cells2),
         |tot2 AS (SELECT side, feature, lang, CAST(sum(c) AS BIGINT) AS tcnt
         |         FROM cells2 GROUP BY 1, 2, 3),
         |cand2 AS (SELECT lc2.side, lc2.feature, lc2.b,
         |    CAST(sum(lc2.lcnt) AS BIGINT) AS nl,
         |    CAST(sum(tot2.tcnt - lc2.lcnt) AS BIGINT) AS nr,
         |    CAST(sum(lc2.lcnt * lc2.lcnt) AS BIGINT) AS sl2,
         |    CAST(sum((tot2.tcnt - lc2.lcnt) * (tot2.tcnt - lc2.lcnt))
         |      AS BIGINT) AS sr2
         |  FROM lc2 JOIN tot2 ON tot2.side = lc2.side
         |    AND tot2.feature = lc2.feature AND tot2.lang = lc2.lang
         |  GROUP BY 1, 2, 3),
         |scored2 AS (SELECT side, feature, b, nl, nr,
         |    CAST(sl2 AS DOUBLE) / nl + CAST(sr2 AS DOUBLE) / nr AS s
         |  FROM cand2 WHERE nl > 0 AND nr > 0),
         |r2 AS (SELECT side, feature, b, nl, nr, s,
         |    ROW_NUMBER() OVER (PARTITION BY side
         |      ORDER BY s DESC, feature, b) AS rn
         |  FROM scored2),
         |nodes AS (
         |  SELECT 'root' AS node, feature, b, nl, nr, s FROM best
         |  UNION ALL
         |  SELECT side, feature, b, nl, nr, s FROM r2 WHERE rn = 1)
         |SELECT node, feature,
         |  CAST(CASE WHEN feature = 'n_chars' THEN b * 16 + 15
         |            ELSE b * 4 + 3 END AS BIGINT) AS threshold,
         |  round(1.0 - s / (nl + nr), 6) + 0.0 AS gini,
         |  nl AS n_left, nr AS n_right
         |FROM nodes ORDER BY node
         |""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      // round-14: ONE corpus pass — the joint (b1, b2, lang) histogram
      // serves both the root stump and the side-conditioned children
      // (the side indicator is a function of the bucket pair, so the
      // per-side histograms are exact grid-sized marginalizations)
      val joint = jointHist(docs)
      val (lcR, totR) = cumAndTotals(featHistFromJoint(joint))
      val root = stumpCandidatesFrom(lcR, totR)
        .agg(min_by(
          struct(col("feature"), col("b"), col("nl"), col("nr"), col("s")),
          struct((-col("s")).as("k1"), col("feature"), col("b"))).as("w"))
        .select(col("w.feature").as("bfeat"), col("w.b").as("bb"),
          col("w.nl").as("rnl"), col("w.nr").as("rnr"), col("w.s").as("rs"))
      val sided = joint.crossJoin(broadcast(root))
        .withColumn("side",
          when(
            when(col("bfeat") === "n_chars", col("b1"))
              .otherwise(col("b2")) <= col("bb"), "L").otherwise("R"))
      val (lc2, tot2) = cumAndTotals(featHistFromJoint(sided, Seq("side")),
        Seq("side"))
      val children = stumpCandidatesFrom(lc2, tot2, Seq("side"))
        .groupBy("side")
        .agg(min_by(
          struct(col("feature"), col("b"), col("nl"), col("nr"), col("s")),
          struct((-col("s")).as("k1"), col("feature"), col("b"))).as("w"))
        .select(col("side").as("node"), col("w.feature").as("feature"),
          col("w.b").as("b"), col("w.nl").as("nl"), col("w.nr").as("nr"),
          col("w.s").as("s"))
      val rootRow = root.select(lit("root").as("node"),
        col("bfeat").as("feature"), col("bb").as("b"),
        col("rnl").as("nl"), col("rnr").as("nr"), col("rs").as("s"))
      rootRow.unionAll(children)
        .select(col("node"), col("feature"),
          when(col("feature") === "n_chars", col("b") * 16 + 15)
            .otherwise(col("b") * 4 + 3).cast("long").as("threshold"),
          (round(lit(1.0) - col("s") / (col("nl") + col("nr")), 6)
            + lit(0.0)).as("gini"),
          col("nl").as("n_left"), col("nr").as("n_right"))
        .orderBy("node")
    },

    // ---- temperature-mixed token budgets (the data-mixing recipe) -------
    // The DoReMi-shaped composition: per-source token budgets set by
    // TEMPERATURE-flattened source mass (α = 0.5 — small sources get
    // relatively more budget than proportional sampling gives), then
    // the deterministic per-source greedy selection (q_token_budget's
    // md5-ordered prefix sum) fills each budget. Arithmetic: sqrt is
    // CORRECTLY ROUNDED by IEEE-754 (unlike ln/exp), so √n_s is
    // engine-exact; the weight sum uses the fixed-point floor
    // reduction (q_chisq_drift's lesson — never decimal-sum arbitrary
    // doubles cross-engine), and each budget is one exact integer
    // multiply-divide. Selected docs per source = the longest md5
    // prefix whose token total stays under the source's budget.
    QDef("q_mixture_budget",
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks,
        |    md5(CAST(doc_id AS VARCHAR)) AS ord
        |  FROM documents),
        |ns AS (SELECT source, CAST(sum(toks) AS BIGINT) AS n_toks
        |       FROM t GROUP BY source),
        |w AS (SELECT source, n_toks,
        |        CAST(floor(sqrt(CAST(n_toks AS DOUBLE)) * 1000000)
        |          AS BIGINT) AS wfp
        |      FROM ns),
        |wt AS (SELECT CAST(sum(wfp) AS BIGINT) AS wtot FROM w),
        |b AS (SELECT w.source, w.n_toks,
        |        (12000 * w.wfp) // wt.wtot AS budget
        |      FROM w CROSS JOIN wt),
        |c AS (SELECT t.doc_id, t.source, t.toks,
        |    sum(t.toks) OVER (PARTITION BY t.source ORDER BY t.ord, t.doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT c.doc_id, c.source, c.toks,
        |  CAST(c.cum AS BIGINT) AS cum_tokens, CAST(b.budget AS BIGINT) AS budget
        |FROM c JOIN b ON b.source = c.source
        |WHERE c.cum - c.toks < b.budget
        |""".stripMargin) { (s, dir) =>
      val t = table(s, dir, "documents").select(
        col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      val ns = t.groupBy("source").agg(sum(col("toks")).cast("long").as("n_toks"))
      val w = ns.withColumn("wfp",
        floor(sqrt(col("n_toks").cast("double")) * 1000000).cast("long"))
      val wt = w.agg(sum(col("wfp")).cast("long").as("wtot"))
      val budgets = w.crossJoin(broadcast(wt))
        .select(col("source"), expr("(12000 * wfp) div wtot").as("budget"))
      graft.plans.PrefixSum.perKey(t, "source",
          md5(col("doc_id").cast("string").cast("binary")), "doc_id",
          col("toks"), "cum")
        .join(broadcast(budgets), "source")
        .filter(col("cum") - col("toks") < col("budget"))
        .select(col("doc_id"), col("source"), col("toks"),
          col("cum").as("cum_tokens"), col("budget"))
    },

    // ---- corpus prep, mixed edition (the session's flagship) ------------
    // The training-set recipe END TO END in one declarative plan:
    // quality filter (bottom-quartile alpha cut) → LEAKAGE-SAFE train
    // split (hash on the dedup-cluster canonical — computed over the
    // FULL corpus, so the split of a surviving doc never depends on
    // which of its near-dups the quality cut kept) → sqrt-temperature
    // per-source token budgets over the survivors → deterministic
    // md5-prefix fill. Each stage's standalone twin is its own oracle
    // row (q_quality_filter, q_split_leakage_safe, q_mixture_budget);
    // this row pins the COMPOSITION, like q_corpus_prep does for the
    // dedup pipeline. Data-sized work: the corpus scan, the LSH/CC
    // label attach (keyed join), and the PrefixSum rank — budgets and
    // cutoffs ride 1-row/`|sources|`-row broadcasts.
    //
    // The quality cut is RANK-BASED (round-12 advice): alpha is floored
    // into 1e-6 fixed-point, the cut value is the ceil(n/4)-th smallest
    // afp read off a grid-sized histogram (smallest afp whose cumulative
    // count reaches the threshold — integer arithmetic end to end), and
    // survivors are strictly above it. The standalone twin's
    // `alpha > quantile_cont(alpha, 0.25)` relies on Spark `percentile`
    // and DuckDB `quantile_cont` producing bit-identical interpolated
    // doubles — mathematically equal but expressed differently, one ulp
    // from a boundary flip; the rank cut has no interpolated double
    // anywhere. The split coin is the md5-prefix idiom
    // (q_train_test_split — the Knuth multiply overflows int64 for
    // canonicals ≥ ~3.47e9, routine at 100 TB).
    QDef("q_corpus_prep_mixed",
      s"""WITH RECURSIVE
        |${DedupOps.shingleOracleCtes},
        |${DedupOps.reachOracleCtes},
        |cc AS (SELECT id AS doc_id, min(r) AS canonical FROM reach GROUP BY id),
        |m AS (SELECT doc_id, source, text,
        |    CAST(floor(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |      / length(text) * 1000000) AS BIGINT) AS afp
        |  FROM documents),
        |hist AS (SELECT afp, CAST(count(*) AS BIGINT) AS c FROM m GROUP BY afp),
        |kk AS (SELECT (sum(c) + 3) // 4 AS k FROM hist),
        |cut AS (SELECT min(afp) AS cutfp FROM
        |         (SELECT afp, sum(c) OVER (ORDER BY afp) AS cum FROM hist) h
        |         CROSS JOIN kk WHERE h.cum >= kk.k),
        |q AS (SELECT doc_id, source, text FROM m CROSS JOIN cut
        |      WHERE m.afp > cut.cutfp),
        |tr AS (SELECT q.doc_id, q.source, q.text
        |       FROM q LEFT JOIN cc USING (doc_id)
        |       WHERE substring(md5(CAST(coalesce(cc.canonical, q.doc_id) AS VARCHAR)), 1, 8) < 'cccccccc'),
        |t AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS toks,
        |    md5(CAST(doc_id AS VARCHAR)) AS ord
        |  FROM tr),
        |ns AS (SELECT source, CAST(sum(toks) AS BIGINT) AS n_toks
        |       FROM t GROUP BY source),
        |w AS (SELECT source,
        |        CAST(floor(sqrt(CAST(n_toks AS DOUBLE)) * 1000000)
        |          AS BIGINT) AS wfp
        |      FROM ns),
        |wt AS (SELECT CAST(sum(wfp) AS BIGINT) AS wtot FROM w),
        |b AS (SELECT w.source, (9600 * w.wfp) // wt.wtot AS budget
        |      FROM w CROSS JOIN wt),
        |c AS (SELECT t.doc_id, t.source, t.toks,
        |    sum(t.toks) OVER (PARTITION BY t.source ORDER BY t.ord, t.doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT c.doc_id, c.source, c.toks,
        |  CAST(c.cum AS BIGINT) AS cum_tokens, CAST(b.budget AS BIGINT) AS budget
        |FROM c JOIN b ON b.source = c.source
        |WHERE c.cum - c.toks < b.budget
        |""".stripMargin) { (s, dir) =>
      val m = table(s, dir, "documents").select(
        col("doc_id"), col("source"), col("text"),
        floor(length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
          / length(col("text")) * 1000000).cast("long").as("afp"))
      // the cut rides a GRID-sized histogram (≤1e6+1 fixed-point cells
      // at any corpus size), so the single-partition cumulative window
      // is bounded — the q_grid_percentile shape, never a corpus sort
      val hist = m.groupBy("afp").agg(count(lit(1)).as("c"))
      val kk = hist.agg(expr("(sum(c) + 3) div 4").as("k"))
      val cut = hist.withColumn("cum",
          sum(col("c")).over(Window.orderBy("afp")))
        .crossJoin(broadcast(kk)).filter(col("cum") >= col("k"))
        .agg(min(col("afp")).as("cutfp"))
      val q = m.crossJoin(broadcast(cut)).filter(col("afp") > col("cutfp"))
      val cc = DedupOps.clusterLabelsFor(s, dir, 0.8)
      val tr = q.join(cc, Seq("doc_id"), "left")
        .filter(substring(md5(coalesce(col("canonical"), col("doc_id"))
          .cast("string").cast("binary")), 1, 8) < "cccccccc")
      val t = tr.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      val ns = t.groupBy("source").agg(sum(col("toks")).cast("long").as("n_toks"))
      val w = ns.withColumn("wfp",
        floor(sqrt(col("n_toks").cast("double")) * 1000000).cast("long"))
      val wt = w.agg(sum(col("wfp")).cast("long").as("wtot"))
      val budgets = w.crossJoin(broadcast(wt))
        .select(col("source"), expr("(9600 * wfp) div wtot").as("budget"))
      graft.plans.PrefixSum.perKey(t, "source",
          md5(col("doc_id").cast("string").cast("binary")), "doc_id",
          col("toks"), "cum")
        .join(broadcast(budgets), "source")
        .filter(col("cum") - col("toks") < col("budget"))
        .select(col("doc_id"), col("source"), col("toks"),
          col("cum").as("cum_tokens"), col("budget"))
    }
  )
}
