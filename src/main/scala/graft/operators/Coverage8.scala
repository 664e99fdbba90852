package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Round-5 extension batch 3: cumulative distinct counting without a
  * distinct-over-window (the first-seen reduction), the map-type
  * function surface, and T5-style span corruption (the denoising-
  * objective preprocessing step of an LLM training pipeline).
  */
object Coverage8 {

  private def oSum(x: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(38,10))) AS STRING) AS DOUBLE)"

  /** One SQL text for both engines (q_win_time_range). */
  private val timeRangeSql: String =
    """SELECT user_id, event_id, ts,
      |  count(*) OVER w AS n_7d,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER w AS STRING) AS DOUBLE)
      |    AS sum_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |             RANGE BETWEEN INTERVAL '7' DAY PRECEDING AND CURRENT ROW)
      |""".stripMargin

  val defs: Seq[QDef] = Seq(

    // ---- TPC-H Q14: promo revenue share ------------------------------------
    // Conditional share of a filtered join: one month of lineitem
    // (pushed to the scan) joins broadcast part; both sums come from
    // the same partial-agg pass. The ratio divides two identical exact
    // doubles, so it is cross-engine stable without rounding.
    QDef("q_tpch_q14",
      s"""SELECT
         |  ${oSum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} AS promo_rev,
         |  ${oSum("l_extendedprice * (1 - l_discount)")} AS total_rev,
         |  ${oSum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
         |    / ${oSum("l_extendedprice * (1 - l_discount)")} AS promo_share
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
         |  AND l_shipdate < TIMESTAMP '1996-10-01'
         |""".stripMargin) { (s, dir) =>
      val net = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val promo = when(col("p_type").like("PROMO%"), net).otherwise(lit(0))
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(broadcast(table(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .agg(sumExact(promo).as("promo_rev"), sumExact(net).as("total_rev"))
        .select(col("promo_rev"), col("total_rev"),
          (col("promo_rev") / col("total_rev")).as("promo_share"))
    },

    // ---- TPC-H Q19: disjunctive join predicates ----------------------------
    // OR-of-ANDs across both join sides: the planner keeps the
    // p_partkey equi-join as the join key and evaluates the disjunction
    // as a post-join filter, while the per-side conjuncts that CAN be
    // derived (p_size lower bounds, brand IN-list) still prune the
    // broadcast side. The classic shape that breaks naive pushdown.
    QDef("q_tpch_q19",
      s"""SELECT ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)
         |""".stripMargin) { (s, dir) =>
      val cond =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
          && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
            && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)
            && col("l_quantity").between(20, 30))
      table(s, dir, "lineitem")
        .join(broadcast(table(s, dir, "part")),
          col("p_partkey") === col("l_partkey"))
        .filter(cond)
        .agg(sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n"))
    },

    // ---- time-interval window frame: 7-day trailing stats ------------------
    // RANGE BETWEEN INTERVAL ... PRECEDING over event time — the real
    // trailing-window pattern (rows-frames break on irregular event
    // spacing). The windowed sum accumulates in DECIMAL so frame-peer
    // ordering ties can't wiggle the double; one SQL text serves both
    // engines.
    QDef("q_win_time_range", timeRangeSql) { (s, dir) =>
      views(s, dir, "events")
      s.sql(timeRangeSql)
    },

    // ---- ROLLUP with grouping indicators ------------------------------------
    // grouping() disambiguates "NULL because subtotal" from "NULL in the
    // data" — cast to BIGINT on both engines (their native widths
    // differ).
    QDef("q_grouping_id",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
        |  count(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"),
          count(lit(1)).as("n"))
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n")
    },

    // ---- LOCF forward fill (IGNORE NULLS window) ---------------------------
    // Last-observation-carried-forward: the sparse-sensor gap fill.
    // last_value IGNORE NULLS over a running frame — one window per
    // key, no self-join, no explode; leading nulls (no observation yet)
    // stay null on both engines. Nulls are synthesized from a real
    // predicate so the fill is visible in the output. The streaming
    // twin is streaming.IncrementalLocf (one carried value per key in
    // the state store; row-identical under in-order delivery).
    QDef("q_locf",
      """WITH base AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN value < 10 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT user_id, event_id, ts, v,
        |  last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM base
        |""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      table(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          when(col("value") < 10, lit(null)).otherwise(col("value")).as("v"))
        .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
    },

    // ---- blocked fuzzy match (edit distance ≤ 1) ---------------------------
    // The entity-resolution shape: a cheap BLOCKING key (shared 7-digit
    // prefix → blocks of ~100) bounds the candidate pairs, and the
    // expensive levenshtein verify runs once per candidate inside
    // blocks — the string twin of LSH-then-verify (DedupOps). The block
    // size is CONSTANT, so candidates grow linearly with the corpus,
    // never corpus² (a 6-digit prefix — blocks of 1000 — measured 44 s
    // at sf0.1; 10× smaller blocks make it sub-second with the same
    // linear shape at any scale). levenshtein returns an exact integer,
    // so the engines agree with no float convention.
    QDef("q_fuzzy_match",
      """WITH c AS (
        |  SELECT c_custkey, c_name, substr(c_name, 10, 7) AS blk
        |  FROM customer)
        |SELECT id1, id2, dist FROM (
        |  SELECT a.c_custkey AS id1, b.c_custkey AS id2,
        |    CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |  FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey)
        |WHERE dist <= 1
        |""".stripMargin) { (s, dir) =>
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          substring(col("c_name"), 10, 7).as("blk"))
      // distribute the probe side by block at an EXPLICIT width: the
      // broadcast join otherwise inherits the scan's partitioning (one
      // task on a one-file input), and a bare repartition(col) gets
      // AQE-coalesced back to one partition because the shuffled BYTES
      // are tiny — the verify cost is per-ROW (levenshtein), which
      // AQE's size heuristic cannot see. Blocks are the natural work
      // unit of blocked entity resolution.
      val width = s.conf.get("spark.sql.shuffle.partitions").toInt
      c.repartition(width, col("blk")).alias("a").join(c.alias("b"),
          col("a.blk") === col("b.blk")
            && col("a.c_custkey") < col("b.c_custkey"))
        // threshold variant: early-exits the DP at distance > 1 and
        // returns -1 — exact for every surviving row, ~10x cheaper per
        // candidate than the full distance matrix
        .select(col("a.c_custkey").as("id1"), col("b.c_custkey").as("id2"),
          levenshtein(col("a.c_name"), col("b.c_name"), 1).cast("long").as("dist"))
        .filter(col("dist") >= 0)
    },

    // ---- LM-based quality scoring (transcendental-free) --------------------
    // The perplexity-filter stage of a data pipeline without the
    // cross-engine log: a document's quality signal is the FRACTION of
    // its bigrams that are rare under the corpus bigram LM (p < 1%).
    // Every probability is one integer division (engines agree
    // exactly), counts are integers, and the final fraction divides two
    // identical integers — no rounding convention needed. Shape: the LM
    // is a corpus aggregate (bounded by observed vocab²); scoring is
    // one keyed join from doc-bigrams to the LM and a per-doc
    // partial-agg.
    QDef("q_lm_score",
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |f AS (SELECT doc_id, w FROM toks WHERE len(w) >= 2),
        |idx AS (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM f),
        |bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM idx
        |       WHERE i < len(w) AND w[i] <> '' AND w[i+1] <> ''),
        |c12 AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(cnt) AS tot FROM c12 GROUP BY 1),
        |lm AS (SELECT w1, w2, CAST(cnt AS DOUBLE) / tot AS p
        |       FROM c12 JOIN c1 USING (w1))
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |  count(*) FILTER (WHERE lm.p < 0.01) AS n_rare,
        |  CAST(count(*) FILTER (WHERE lm.p < 0.01) AS DOUBLE) / count(*)
        |    AS rare_frac
        |FROM bg JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
        |GROUP BY bg.doc_id
        |""".stripMargin) { (s, dir) =>
      val bg = table(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(expr(
          "filter(transform(sequence(0, size(w) - 2)," +
            " i -> struct(w[i] AS w1, w[i+1] AS w2))," +
            " s -> s.w1 <> '' AND s.w2 <> '')")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      val lm = c12.join(c12.groupBy("w1").agg(sum(col("cnt")).as("tot")), "w1")
        .select(col("w1"), col("w2"),
          (col("cnt").cast("double") / col("tot")).as("p"))
      bg.join(lm, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          count(when(col("p") < 0.01, 1)).as("n_rare"))
        .select(col("doc_id"), col("n_bigrams"), col("n_rare"),
          (col("n_rare").cast("double") / col("n_bigrams")).as("rare_frac"))
    },

    // ---- cumulative distinct users per event type -------------------------
    // COUNT(DISTINCT) OVER a running window is unsupported (and
    // inherently O(n·window) done naively). The distributed answer:
    // reduce each (type, user) to its FIRST day, count new users per
    // day, and a running SUM of new users IS the running distinct
    // count. Two partial-agg exchanges plus a window over the tiny
    // per-day table — never the fact table.
    QDef("q_cume_distinct",
      """WITH fs AS (
        |  SELECT event_type, user_id, min(CAST(ts AS DATE)) AS first_day
        |  FROM events GROUP BY event_type, user_id),
        |byday AS (
        |  SELECT event_type, first_day AS day, count(*) AS new_users
        |  FROM fs GROUP BY event_type, first_day)
        |SELECT event_type, day, new_users,
        |  CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day)
        |    AS BIGINT) AS cume_users
        |FROM byday
        |""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
      table(s, dir, "events")
        .groupBy("event_type", "user_id")
        .agg(min(to_date(col("ts"))).as("day"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("new_users"))
        .withColumn("cume_users", sum(col("new_users")).over(w))
    },

    // ---- map-type function surface ----------------------------------------
    // Per-user event-type→count maps built with map_from_entries, then
    // map_keys / map_filter / map_entries over them. Map cells can't be
    // hash-compared across engines (and crash the driver's
    // canonicalizer), so the output serializes the filtered map in
    // canonical sorted "k:v" form — the oracle builds the identical
    // string relationally, without a map type.
    QDef("q_map_funcs",
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id, count(*) AS n_types,
        |  coalesce(string_agg(
        |    CASE WHEN cnt >= 2 THEN event_type || ':' || cnt END,
        |    ',' ORDER BY event_type), '') AS frequent
        |FROM c GROUP BY user_id
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"),
          size(map_keys(col("m"))).cast("long").as("n_types"),
          // Entries were inserted key-sorted (sort_array on the struct list
          // above), and map_filter/map_entries preserve that order — so the
          // serialized list is already in key order. Sorting the "k:v"
          // STRINGS instead would diverge from the oracle's ORDER BY
          // event_type whenever one key is a proper prefix of another and
          // the next char sorts below ':' (e.g. "view" vs "view2").
          array_join(expr(
            "transform(map_entries(map_filter(m, (k, v) -> v >= 2))," +
              " e -> concat(e.key, ':', e.value))"), ",").as("frequent"))
    },

    // ---- T5-style span corruption (denoising objective) --------------------
    // The masked-span pretraining prep: deterministic spans (token
    // index i with i mod 10 < 3) are replaced by one sentinel per span
    // in the INPUT; the TARGET lists each sentinel followed by the
    // tokens it hides. Pure per-row transforms (no shuffle at all —
    // embarrassingly parallel at any corpus size); determinism comes
    // from position, not RNG, so replays and both engines agree
    // exactly. Spark's lambda index is 0-based, DuckDB's 1-based — the
    // oracle shifts accordingly.
    QDef("q_span_corrupt",
      """SELECT doc_id,
        |  array_to_string(list_filter(list_transform(
        |    string_split(trim(text), ' '), (t, i) ->
        |      CASE WHEN (i-1) % 10 = 0 THEN '<x' || ((i-1) // 10) || '>'
        |           WHEN (i-1) % 10 < 3 THEN NULL ELSE t END),
        |    x -> x IS NOT NULL), ' ') AS input,
        |  array_to_string(list_filter(list_transform(
        |    string_split(trim(text), ' '), (t, i) ->
        |      CASE WHEN (i-1) % 10 = 0 THEN '<x' || ((i-1) // 10) || '>' || ' ' || t
        |           WHEN (i-1) % 10 < 3 THEN t ELSE NULL END),
        |    x -> x IS NOT NULL), ' ') AS target
        |FROM documents
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .select(col("doc_id"),
          array_join(expr(
            """filter(transform(w, (t, i) ->
              |  CASE WHEN i % 10 = 0 THEN concat('<x', i div 10, '>')
              |       WHEN i % 10 < 3 THEN NULL ELSE t END),
              |  x -> x IS NOT NULL)""".stripMargin), " ").as("input"),
          array_join(expr(
            """filter(transform(w, (t, i) ->
              |  CASE WHEN i % 10 = 0 THEN concat('<x', i div 10, '> ', t)
              |       WHEN i % 10 < 3 THEN t ELSE NULL END),
              |  x -> x IS NOT NULL)""".stripMargin), " ").as("target"))
    }
  )
}
