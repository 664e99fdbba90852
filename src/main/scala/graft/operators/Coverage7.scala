package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Round-5 extension batch 2: TPC-H Q18 (large-volume customers — the
  * classic agg-then-semi-join shape), per-entity EWMA via an ordered
  * exact fold, a pairwise correlation matrix, and one BPE-style merge
  * step (the tokenizer-training primitive: corpus-wide adjacent-pair
  * frequencies).
  *
  * Reference scope: SURVEY.md §2-B analytics surface over the
  * CDC-materialized tables plus the LLM-pipeline operator family.
  */
object Coverage7 {

  private def oSum(x: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(38,10))) AS STRING) AS DOUBLE)"

  /** One SQL text for both engines (q_recursive_spine). */
  private val recursiveSpineSql: String =
    """WITH RECURSIVE spine(mon) AS (
      |  SELECT DATE '1995-01-01'
      |  UNION ALL
      |  SELECT CAST(mon + INTERVAL '1' MONTH AS DATE) FROM spine
      |  WHERE mon < DATE '2001-08-01'
      |)
      |SELECT mon, count(o_orderkey) AS n_orders
      |FROM spine LEFT JOIN orders
      |  ON CAST(date_trunc('month', o_orderdate) AS DATE) = mon
      |GROUP BY mon
      |""".stripMargin

  val defs: Seq[QDef] = Seq(

    // ---- TPC-H Q18: large-volume customers ------------------------------
    // The HAVING subquery computes the per-order quantity ONCE and its
    // survivors drive everything else: orders joins the (small) big-order
    // table, customer attaches as a broadcast dimension. At 100 TB the
    // lineitem table is touched exactly once (one partial-agg exchange on
    // orderkey) — the textbook formulation's second lineitem scan is
    // avoided because the aggregate is already the needed sum_qty.
    // Decimal-accumulated HAVING bound: quantities are integral, but the
    // decimal compare stays partitioning-independent at any scale.
    QDef("q_tpch_q18",
      s"""WITH big AS (
         |  SELECT l_orderkey, ${oSum("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING SUM(CAST(l_quantity AS DECIMAL(38,10))) > 220)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
         |FROM big JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
         |""".stripMargin) { (s, dir) =>
      val big = table(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("q"))
        .filter(col("q") > 220)
        .select(col("l_orderkey"), col("q").cast("double").as("sum_qty"))
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      big.join(o, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(c), col("c_custkey") === col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "o_totalprice", "sum_qty")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // ---- per-user EWMA via an ordered exact fold -------------------------
    // EWMA is inherently sequential (acc' = α·x + (1−α)·acc), so the
    // engine folds each user's time-ordered value array — one groupBy,
    // no window, no self-join; the fold order is pinned by (ts,
    // event_id), so the IEEE arithmetic is bit-identical on both engines
    // and under any partitioning (same exact-fold convention as
    // q_text_rollhash). Scale shape: per-user sequences are bounded
    // (session-scale); an unbounded stream runs the same fold
    // incrementally via mapGroupsWithState — streaming.IncrementalEwma
    // is that twin, pinned bit-identical by IncrementalEwmaSpec.
    QDef("q_ewma",
      """SELECT user_id, count(*) AS n_events,
        |  list_reduce(
        |    list_prepend(CAST(0.0 AS DOUBLE), list(value ORDER BY ts, event_id)),
        |    (acc, x) -> CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * acc)
        |    AS ewma
        |FROM events GROUP BY user_id
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "events").groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          expr("""aggregate(
                 |  transform(array_sort(collect_list(struct(ts, event_id, value))),
                 |            x -> x.value),
                 |  CAST(0.0 AS DOUBLE),
                 |  (acc, x) -> CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * acc)
                 |""".stripMargin).as("ewma"))
    },

    // ---- pairwise correlation matrix (long form) -------------------------
    // All six correlations come from ONE scan (a single partial-agg
    // exchange produces the 1-row moment table; stack pivots it long).
    // corr agrees across engines to ~4 digits (package.scala) — rounded
    // accordingly.
    QDef("q_corr_matrix",
      """SELECT 'l_quantity' AS v1, 'l_extendedprice' AS v2,
        |       round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr FROM lineitem
        |UNION ALL SELECT 'l_quantity', 'l_discount',
        |       round(corr(l_quantity, l_discount), 4) + 0.0 FROM lineitem
        |UNION ALL SELECT 'l_quantity', 'l_tax',
        |       round(corr(l_quantity, l_tax), 4) + 0.0 FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', 'l_discount',
        |       round(corr(l_extendedprice, l_discount), 4) + 0.0 FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', 'l_tax',
        |       round(corr(l_extendedprice, l_tax), 4) + 0.0 FROM lineitem
        |UNION ALL SELECT 'l_discount', 'l_tax',
        |       round(corr(l_discount, l_tax), 4) + 0.0 FROM lineitem
        |""".stripMargin) { (s, dir) =>
      def c(a: String, b: String) =
        (round(corr(col(a), col(b)), 4) + lit(0.0)).as(s"${a}__$b")
      table(s, dir, "lineitem")
        .agg(c("l_quantity", "l_extendedprice"), c("l_quantity", "l_discount"),
          c("l_quantity", "l_tax"), c("l_extendedprice", "l_discount"),
          c("l_extendedprice", "l_tax"), c("l_discount", "l_tax"))
        .select(expr(
          """stack(6,
            |  'l_quantity', 'l_extendedprice', l_quantity__l_extendedprice,
            |  'l_quantity', 'l_discount',      l_quantity__l_discount,
            |  'l_quantity', 'l_tax',           l_quantity__l_tax,
            |  'l_extendedprice', 'l_discount', l_extendedprice__l_discount,
            |  'l_extendedprice', 'l_tax',      l_extendedprice__l_tax,
            |  'l_discount', 'l_tax',           l_discount__l_tax
            |) AS (v1, v2, corr)""".stripMargin))
    },

    // ---- one BPE merge step: top adjacent character pairs ---------------
    // The tokenizer-training primitive: count every adjacent character
    // pair inside every token corpus-wide; the top pair is the next BPE
    // merge. One explode → partial-agg — the pair key space is tiny
    // (alphabet²), so map-side combine collapses the exchange to
    // ~|alphabet|² rows per partition regardless of corpus size. Top-20
    // with the (cnt DESC, pair) tiebreak keeps the LIMIT deterministic.
    QDef("q_bpe_merge",
      """WITH words AS (
        |  SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents),
        |pairs AS (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |                i -> substr(w, CAST(i AS INT), 2))) AS pair
        |  FROM words WHERE length(w) >= 2)
        |SELECT pair, count(*) AS cnt FROM pairs
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .select(explode(split(trim(col("text")), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20)
    },

    // ---- correlated LATERAL join: top-2 orders per customer ---------------
    // The modern SQL spelling of per-key top-k. Spark decorrelates the
    // LIMIT-ed lateral subquery into a window under the hood — the same
    // physical shape as q_topk_pergroup — so declaring it laterally
    // costs nothing at scale; this entry pins that the SQL surface works.
    QDef("q_join_lateral",
      """SELECT c_custkey, c_name, t.o_orderkey, t.o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_mktsegment = 'BUILDING'
        |""".stripMargin) { (s, dir) =>
      views(s, dir, "customer", "orders")
      s.sql(
        """SELECT c_custkey, c_name, t.o_orderkey, t.o_totalprice
          |FROM customer,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
          |         WHERE o_custkey = c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |WHERE c_mktsegment = 'BUILDING'
          |""".stripMargin)
    },

    // ---- exact discrete percentiles per group -----------------------------
    // percentile_disc("smallest value with cume_dist ≥ p") spelled with
    // the window definition itself, so both engines share one semantics
    // (their native quantile_disc interpolation rules differ). One
    // window sort per group — the exact-percentile cost floor; the
    // approx_percentile sketch (q_agg_approx_percentile) is the scale
    // path when a t-digest-grade answer suffices.
    QDef("q_percentile_disc",
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    cume_dist() OVER (PARTITION BY l_returnflag
        |                      ORDER BY l_extendedprice) AS cd
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  min(l_extendedprice) FILTER (WHERE cd >= 0.25) AS p25,
        |  min(l_extendedprice) FILTER (WHERE cd >= 0.5) AS p50,
        |  min(l_extendedprice) FILTER (WHERE cd >= 0.75) AS p75
        |FROM r GROUP BY l_returnflag
        |""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("l_extendedprice")
      table(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"),
          cume_dist().over(w).as("cd"))
        .groupBy("l_returnflag")
        .agg(
          min(when(col("cd") >= 0.25, col("l_extendedprice"))).as("p25"),
          min(when(col("cd") >= 0.5, col("l_extendedprice"))).as("p50"),
          min(when(col("cd") >= 0.75, col("l_extendedprice"))).as("p75"))
    },

    // ---- null-safe equality join -------------------------------------------
    // `<=>` / IS NOT DISTINCT FROM as a JOIN key: the null group joins
    // the null group (a plain equi-join silently drops it — the classic
    // dimension-with-unknown-member bug). Null keys are synthesized by
    // nullif over a real column so the semantics are visible in the
    // output row count. <=> is an ordinary hash-join key in Spark — no
    // plan penalty vs =.
    QDef("q_join_nullsafe",
      """WITH l AS (
        |  SELECT nullif(o_orderpriority, '1-URGENT') AS k, o_totalprice
        |  FROM orders),
        |d AS (SELECT DISTINCT nullif(o_orderpriority, '1-URGENT') AS k
        |      FROM orders)
        |SELECT d.k, count(l.o_totalprice) AS n
        |FROM d JOIN l ON d.k IS NOT DISTINCT FROM l.k
        |GROUP BY d.k
        |""".stripMargin) { (s, dir) =>
      val o = table(s, dir, "orders")
      val l = o.select(nullif(col("o_orderpriority"), lit("1-URGENT")).as("lk"),
        col("o_totalprice"))
      val d = o.select(nullif(col("o_orderpriority"), lit("1-URGENT")).as("k"))
        .distinct()
      d.join(l, col("k") <=> col("lk"))
        .groupBy("k").agg(count(col("o_totalprice")).as("n"))
    },

    // ---- VALUES literal dimension join -------------------------------------
    // The inline lookup-table pattern (code-to-rank mappings that live
    // in the query, not in storage). A VALUES relation is driver-literal
    // → always broadcast; the fact side never shuffles for it.
    QDef("q_values_join",
      s"""SELECT v.rnk, count(*) AS n, ${oSum("o_totalprice")} AS rev
         |FROM orders JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2),
         |    ('3-MEDIUM', 3), ('4-NOT SPECIFIED', 4), ('5-LOW', 5))
         |  AS v(pri, rnk) ON o_orderpriority = v.pri
         |GROUP BY v.rnk
         |""".stripMargin) { (s, dir) =>
      views(s, dir, "orders")
      s.sql(
        """SELECT v.rnk, count(*) AS n,
          |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS rev
          |FROM orders JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2),
          |    ('3-MEDIUM', 3), ('4-NOT SPECIFIED', 4), ('5-LOW', 5))
          |  AS v(pri, rnk) ON o_orderpriority = v.pri
          |GROUP BY v.rnk
          |""".stripMargin)
    },

    // ---- recursive CTE: month spine + per-month order counts --------------
    // Spark 4's WITH RECURSIVE (UnionLoop) generating the date spine a
    // reporting query left-joins against — months with no orders appear
    // as zero instead of vanishing (the recursive dual of q_gapfill's
    // grid fill). One SQL text serves both engines; the casts pin the
    // cross-engine type gotchas (date+interval and date_trunc widths
    // differ between them). Recursion depth = months, not data size.
    QDef("q_recursive_spine", recursiveSpineSql) { (s, dir) =>
      views(s, dir, "orders")
      s.sql(recursiveSpineSql)
    },

    // ---- triangle counting on the strong co-purchase graph ----------------
    // Edges: part pairs co-ordered in ≥ 2 DISTINCT orders (the classic
    // market-basket support threshold — raw single-co-occurrence edges
    // are coincidence, and keeping them makes the 2-path stage Σ deg²
    // over a near-complete random graph: measured 57 s at sf0.1 before
    // the threshold, sub-second after). Triangles: the ordered 2-path
    // join (e1.p2 = e2.p1) closed by a third edge lookup — each
    // triangle enumerated exactly once, all keyed hash joins. The
    // 2-path stage runs over the DEGREE-ORIENTED edge table
    // (plans.OrientedTriangles: each edge toward its higher-(deg, id)
    // endpoint), which caps the fan-out at O(m^1.5) even when the
    // graph stays dense after thresholding — an id-ordered orientation
    // has no such bound (a mid-id hub keeps indeg·outdeg ≈ deg²/4;
    // OrientedTrianglesSpec plants that graph and measures the gap).
    // The count is orientation-invariant, so the id-ordered SQL
    // self-join stays the cross-engine oracle.
    QDef("q_triangle_count",
      """WITH e AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY p1, p2 HAVING count(DISTINCT a.l_orderkey) >= 2)
        |SELECT count(*) AS n_tri
        |FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
        |  JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
        |""".stripMargin) { (s, dir) =>
      // pair generation from per-order part SETS, not a fact self-join
      // (one groupBy, pairs explode from the sorted array, support a
      // plain count) — served from the SHARED memoized co-purchase
      // edge table (Coverage16.copurchaseEdges), which the k-core and
      // degree-distribution queries also read: one derivation per
      // corpus snapshot, the 100 TB materialize-once posture. The
      // oracle's self-join formulation stays the cross-engine anchor.
      // the memoized edge table is already checkpoint-materialized —
      // the degree agg + three oriented-join legs all read that one
      // materialization (no second checkpoint layered on top)
      graft.plans.OrientedTriangles.triangleCount(
        Coverage16.copurchaseEdges(s, dir))
    }
  )
}
