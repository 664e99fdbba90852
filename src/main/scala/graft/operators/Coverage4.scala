package graft.operators

import graft._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage: range join (binned equi-join formulation), the
  * remaining analytic window forms (first/last/nth value, percent_rank/
  * cume_dist), time-series gap-fill, bigram language-model counts,
  * bloom-prefiltered decontamination, a k-means centroid update step,
  * and per-group z-score anomaly flagging.
  *
  * Scale notes are per-query; the common thread is that nothing here
  * introduces a new shuffle shape — range joins become bounded
  * equi-joins on bin keys, rankings stay partitioned windows, and the
  * statistical passes are two-round aggregate + broadcast-back joins.
  */
object Coverage4 {

  /** Exact heavy-hitter oracle — shared VERBATIM with
    * q_heavy_hitters_sketch (Coverage5): the sketch→exact-confirm
    * pipeline is bit-identical to the exact formulation by the
    * Misra-Gries guarantee, so both queries carry one oracle string. */
  private[operators] val heavyHittersOracleSql =
    """WITH toks AS (
      |  SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents),
      |t AS (SELECT term, count(*) AS cnt FROM toks WHERE term <> '' GROUP BY 1),
      |n AS (SELECT sum(cnt) AS total FROM t)
      |SELECT term, CAST(cnt AS BIGINT) AS cnt
      |FROM t, n WHERE cnt * 1000 >= total
      |""".stripMargin

  val defs: Seq[QDef] = Seq(

    // Range (interval) join: lineitems whose price falls within ±5 of a
    // part's retail price — no equality key exists. The naive plan is a
    // broadcast-nested-loop over |part|×|lineitem| (1.2e10 comparisons
    // at sf0.1); instead both sides are binned at the span width (10)
    // so a matching pair is guaranteed to share the probe's bin or the
    // one above it: the part side fans out to the ≤2 covering bins (one
    // explode of a 2-element sequence), the join is a plain equi-join
    // on the 8-byte bin id, and the exact BETWEEN predicate filters the
    // survivors. floor() is monotone, so r-5 ≤ l ≤ r+5 implies
    // floor((r-5)/10) ≤ floor(l/10) ≤ floor((r+5)/10) — no candidate
    // pair is ever missed. The oracle runs the inequality join
    // directly (DuckDB plans an IEJoin); Spark gets the formulation
    // that scales: shuffle keyed on bins, per-bin candidate sets
    // bounded by value density rather than table size.
    QDef("q_range_join",
      """SELECT p.p_partkey,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sum_price
        |FROM part p JOIN lineitem l
        |  ON l.l_extendedprice >= p.p_retailprice - 5
        | AND l.l_extendedprice <= p.p_retailprice + 5
        |GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val width = 10.0
      val li = table(s, dir, "lineitem")
        .select(col("l_extendedprice"),
          floor(col("l_extendedprice") / width).as("bin"))
      val pt = table(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          explode(sequence(floor((col("p_retailprice") - 5) / width),
            floor((col("p_retailprice") + 5) / width))).as("bin"))
      pt.join(li, "bin")
        .filter(col("l_extendedprice") >= col("p_retailprice") - 5 &&
          col("l_extendedprice") <= col("p_retailprice") + 5)
        .groupBy("p_partkey")
        .agg(count(lit(1)).as("n_items"), sumExact(col("l_extendedprice")).as("sum_price"))
    },

    // first_value / last_value / nth_value over an explicit full frame
    // (the default frame ends at CURRENT ROW, which makes last_value a
    // self-reference — both engines agree once the frame is pinned to
    // UNBOUNDED..UNBOUNDED). Partitioned by customer: no global sort.
    QDef("q_win_firstlast",
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  FIRST_VALUE(o_totalprice) OVER w AS first_price,
        |  LAST_VALUE(o_totalprice) OVER w AS last_price,
        |  NTH_VALUE(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
    },

    // percent_rank / cume_dist — exact rational ranks (integer rank and
    // count divided once in IEEE double, so the engines agree bit-for-
    // bit). The ordering carries the key tie-break that makes the rank
    // deterministic under any partitioning.
    QDef("q_win_percentrank",
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
    },

    // Time-series gap-fill: the (event_type × day) grid from the
    // corpus' own min/max day, missing cells zero-filled. The grid is
    // a broadcast cross of two tiny derived dimensions (≤types × days
    // rows); only the left join against the aggregated counts shuffles,
    // and it shuffles post-aggregation counts, not events. GapFillSpec
    // proves the zero-fill on a synthetic gappy frame.
    QDef("q_gapfill",
      """WITH counts AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |         FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events)
        |SELECT t.event_type, d.day, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
        |FROM types t CROSS JOIN days d
        |LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day
        |""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val counts = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val days = ev.agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val types = ev.select(col("event_type")).distinct()
      broadcast(types).crossJoin(broadcast(days))
        .join(counts, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("cnt"), lit(0L)).cast("long").as("cnt"))
    },

    // Bigram language-model counts: c(w1,w2) and the conditional
    // probability p(w2|w1) = c(w1,w2) / c(w1,·) — both counts are exact
    // integers and the single division is one correctly-rounded IEEE
    // op, so the engines agree exactly. One aggregation keyed on the
    // bigram plus a window-free self-aggregation for the denominator
    // (sum over the bigram counts — cheaper than re-scanning tokens).
    // Low-count bigrams are cut at ≥3 to keep the emitted model bounded.
    QDef("q_bigram_lm",
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |f AS (SELECT doc_id, w FROM toks WHERE len(w) >= 2),
        |idx AS (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM f),
        |bg AS (SELECT w[i] AS w1, w[i+1] AS w2 FROM idx WHERE i < len(w) AND w[i] <> '' AND w[i+1] <> ''),
        |c12 AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(cnt) AS tot FROM c12 GROUP BY 1)
        |SELECT c12.w1, c12.w2, CAST(c12.cnt AS BIGINT) AS cnt,
        |       CAST(c12.cnt AS DOUBLE) / c1.tot AS p
        |FROM c12 JOIN c1 USING (w1) WHERE c12.cnt >= 3
        |""".stripMargin) { (s, dir) =>
      val bg = table(s, dir, "documents")
        .select(split(trim(col("text")), " ").as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "filter(transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i+1] AS w2))," +
            " s -> s.w1 <> '' AND s.w2 <> '')")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      val c1 = c12.groupBy("w1").agg(sum(col("cnt")).as("tot"))
      c12.join(c1, "w1")
        .filter(col("cnt") >= 3)
        .select(col("w1"), col("w2"), col("cnt"),
          (col("cnt").cast("double") / col("tot")).as("p"))
    },

    // Bloom-prefiltered decontamination — the same contract as
    // q_decontaminate (shared oracle: the bloom filter admits false
    // positives only, and the exact STRING join after it removes them —
    // including any 64-bit hash collisions, which the birthday bound
    // makes expected at ~2^32 distinct grams — so the output is
    // bit-identical to the unfiltered join at any scale). The point is
    // the 100 TB shape: the eval side's gram hashes are folded into a
    // fixed-size bloom filter (driver-built over the eval set — the side
    // that is genuinely small in production), broadcast to every train
    // partition, and the train grams that cannot match are dropped AT
    // THE SCAN, before they ever reach the exchange. The shuffle then
    // carries only the ~fpp false-positive overhead above the true
    // matches instead of every training gram on the cluster.
    QDef("q_decontaminate_bloom",
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |f AS (SELECT doc_id, w FROM toks WHERE len(w) >= 8),
        |idx AS (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM f),
        |g AS (SELECT DISTINCT doc_id,
        |        w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
        |        w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] AS g
        |      FROM idx WHERE i <= len(w) - 7),
        |ev AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id AS train_id, g FROM g WHERE doc_id % 10 <> 0)
        |SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS shared_ngrams
        |FROM tr JOIN ev USING (g) GROUP BY 1, 2
        |""".stripMargin) { (s, dir) =>
      val grams = table(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(w) - 8), i -> concat_ws(' ', " +
            (0 until 8).map(k => s"w[i + $k]").mkString(", ") + "))"
        ))).as("g"))
        .withColumn("gh", xxhash64(col("g")))
      val ev = grams.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("eval_id"), col("g"), col("gh"))
      val tr = grams.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("train_id"), col("g"), col("gh"))
      // Build the filter over the eval gram hashes (one pass; the
      // sketch merges associatively so this distributes) and ship it
      // once per executor via broadcast. Capacity is a FIXED bound, not
      // a counted one: sizing from ev.count() cost an extra eager
      // corpus scan at plan-construction time (round-4 advice) for no
      // accuracy the fpp math needs — an over-provisioned filter only
      // wastes a few MB of broadcast, and a production eval suite has a
      // known size to plug in here. 4M grams @ 1% fpp ≈ 4.8 MB.
      val bloom = ev.stat.bloomFilter("gh", 4L * 1024 * 1024, 0.01)
      // prefilter on the 8-byte hash (cheap, scan-side); JOIN on the
      // gram string (exact — hash collisions die here, not in the
      // output). The hash is dropped before the exchange on BOTH sides:
      // it exists only for the scan-side filter. The probe is the
      // codegen'd BloomMightContain expression (no per-row boxing, the
      // whole-stage span over the scan stays intact); the serialized
      // filter rides the plan, which Spark ships once per executor via
      // the broadcast task binary.
      tr.filter(graft.functions.BloomExpressions.probe(s, bloom, col("gh")))
        .select("train_id", "g")
        .join(ev.drop("gh"), "g")
        .groupBy("train_id", "eval_id")
        .agg(count(lit(1)).as("shared_ngrams"))
    },

    // One Lloyd (k-means) centroid-update step over the embedding
    // corpus, seeded with the same deterministic vec_id % 97 sample the
    // IVF index uses: assign every vector to its nearest seed (map-side
    // argmax_by — one row per vector crosses the exchange), then emit
    // the per-centroid component means. Means shuffle as (cid, pos)
    // partial sums — map-side combined, so the exchange carries
    // k × dim rows per partition, not N × dim. The full iterative
    // trainer (KMeansOps.lloyd) reuses this step with a vector-sum
    // aggregate that never explodes components; this query pins one
    // step's arithmetic cross-engine.
    QDef("q_kmeans_update",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0),
        |ax AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS a, unnest(c.cv) AS b
        |       FROM embeddings e CROSS JOIN c),
        |ad AS (SELECT vec_id, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM ax GROUP BY 1, 2),
        |asg AS (SELECT vec_id, cid,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id
        |            ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid) AS rn
        |        FROM ad),
        |assigned AS (SELECT a.vec_id, a.cid AS centroid_id, e.embedding
        |             FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id WHERE a.rn = 1),
        |comp AS (SELECT centroid_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |                unnest(embedding) AS v
        |         FROM assigned)
        |SELECT centroid_id, CAST(pos AS BIGINT) AS pos,
        |       round(sum(CAST(v AS DOUBLE)) / count(*), 6) AS mean,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM comp GROUP BY 1, 2
        |""".stripMargin) { (s, dir) =>
      val assigned = SimilarityOps.ivfAssign(table(s, dir, "embeddings"), 97)
      assigned
        .select(col("centroid_id"), posexplode(col("embedding")))
        .select(col("centroid_id"), col("pos").cast("long").as("pos"),
          col("col").cast("double").as("v"))
        .groupBy("centroid_id", "pos")
        .agg(round(sum(col("v")) / count(lit(1)), 6).as("mean"),
          count(lit(1)).as("n"))
    },

    // Exact heavy hitters: tokens covering ≥ 0.1% of the corpus token
    // stream. One hash aggregation (map-side combined) over the token
    // explode, a 1-row total, and an integer cross-multiplied threshold
    // (no division — exact in both engines). This is the verification
    // dual of the bounded-memory freq_sketch aggregate
    // (functions.FreqSketch, spec-driven against this query): at 100 TB
    // the sketch finds candidates with fixed memory, and this exact
    // count confirms them with one semi-join.
    QDef("q_heavy_hitters",
      heavyHittersOracleSql) { (s, dir) =>
      val toks = table(s, dir, "documents")
        .select(explode(split(trim(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
      val counts = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      counts.crossJoin(broadcast(total))
        .filter(col("cnt") * 1000 >= col("total"))
        .select(col("term"), col("cnt"))
    },

    // Per-group z-score outlier flagging: two-pass — exact decimal
    // moment sums per event_type (order-independent, so the flags are
    // identical on any partitioning), broadcast back, flag |z| > 3.
    // The moments aggregate map-side; the join back is a broadcast of
    // #groups rows against the scan.
    QDef("q_anomaly_zscore",
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - s1 / n) / sqrt((s2 / n - (s1 / n) * (s1 / n)) * n / (n - 1)), 6) AS z
        |FROM events e JOIN m USING (event_type)
        |WHERE abs(round((e.value - s1 / n) / sqrt((s2 / n - (s1 / n) * (s1 / n)) * n / (n - 1)), 6)) > 3
        |""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val m = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("s1"),
        sum(dec(col("value") * col("value"))).cast("double").as("s2"))
      val mean = col("s1") / col("n")
      val variance = (col("s2") / col("n") - mean * mean) * col("n") / (col("n") - 1)
      val z = round((col("value") - mean) / sqrt(variance), 6)
      ev.join(broadcast(m), "event_type")
        .withColumn("z", z)
        .filter(abs(col("z")) > 3)
        .select(col("event_id"), col("event_type"), col("value"), col("z"))
    },
  )
}
