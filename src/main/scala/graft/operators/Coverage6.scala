package graft.operators

import graft._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 extension batch: the classic TPC-H analytics quartet
  * (Q1/Q3/Q6/Q10 re-shaped to the driver corpus's columns), closed-form
  * regression aggregates, deterministic per-group mode, gaps-and-islands,
  * a 2-D skyline (Pareto frontier), filtered aggregates, passage-level
  * corpus dedup (the RefinedWeb-style repeated-span removal an LLM data
  * pipeline runs after document-level dedup), and an iterative PageRank
  * over the event-type transition graph.
  *
  * Reference scope: SURVEY.md §2-B analytics surface. The reference reads
  * its materialized sink with plain SQL (reference README verification
  * queries); everything here is the analytics a user of that sink runs,
  * expressed Spark-first.
  *
  * Scale notes follow each query; the shared conventions (decimal-summed
  * doubles, broadcast-hinted dimensions, deterministic tiebreaks before
  * every LIMIT) are the ones package.scala documents.
  */
object Coverage6 {

  /** Oracle spelling of sumExact — exact decimal accumulation surfaced
    * as DOUBLE through the same string path the engine's cast takes. */
  private def oSum(x: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(38,10))) AS STRING) AS DOUBLE)"

  val defs: Seq[QDef] = Seq(

    // ---- TPC-H Q1: pricing summary report ------------------------------
    // Pure scan→partial-agg→4-group exchange: the canonical map-side
    // combine shape. At 100 TB only 4×|grouping| rows cross the wire;
    // the shipdate filter pushes to the parquet scan.
    QDef("q_tpch_q1",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oSum("l_quantity")} AS sum_qty,
         |  ${oSum("l_extendedprice")} AS sum_base,
         |  ${oSum("l_extendedprice * (1 - l_discount)")} AS sum_disc,
         |  ${oSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${oSum("l_quantity")} / COUNT(l_quantity) AS avg_qty,
         |  ${oSum("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
         |  ${oSum("l_discount")} / COUNT(l_discount) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |""".stripMargin) { (s, dir) =>
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumExact(col("l_quantity")).as("sum_qty"),
          sumExact(col("l_extendedprice")).as("sum_base"),
          sumExact(disc).as("sum_disc"),
          sumExact(disc * (lit(1) + col("l_tax"))).as("sum_charge"),
          avgExact(col("l_quantity")).as("avg_qty"),
          avgExact(col("l_extendedprice")).as("avg_price"),
          avgExact(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // ---- TPC-H Q3: shipping priority -----------------------------------
    // Fact⋈fact (orders⋈lineitem) shuffles on orderkey; the filtered
    // customer side is a broadcast dimension, so the 100 TB plan has
    // exactly one exchange before the group-by. LIMIT is made
    // deterministic by the unique l_orderkey tiebreak.
    QDef("q_tpch_q3",
      """SELECT l_orderkey,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10
        |""".stripMargin) { (s, dir) =>
      val c = table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = table(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- TPC-H Q6: forecasting revenue change --------------------------
    // The pushdown showcase: every predicate reaches the parquet scan
    // (PushedFilters), one partial-agg per partition, a single row out.
    QDef("q_tpch_q6",
      s"""SELECT ${oSum("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.03 AND 0.07
         |  AND l_quantity < 24
         |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.03, 0.07)
          && col("l_quantity") < 24)
        .agg(sumExact(col("l_extendedprice") * col("l_discount")).as("revenue"))
    },

    // ---- TPC-H Q10: returned item reporting ----------------------------
    // lineitem('R')⋈orders shuffles on orderkey; customer⋈nation is a
    // broadcast dimension attached after the fact-side reduction.
    QDef("q_tpch_q10",
      """SELECT c_custkey, c_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20
        |""".stripMargin) { (s, dir) =>
      val o = table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = table(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val cn = table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ---- closed-form linear regression per group -----------------------
    // regr_slope/intercept/r2 are single-pass partial-aggregatable
    // moments (sums of x, y, xy, x², y²) — the distributed-friendly way
    // to fit a line, no iteration. Rounded to the engine's float-parity
    // convention (the moments are order-dependent in the last ~12 of 16
    // digits; round-4/6 is ~8 digits above that noise floor).
    QDef("q_regression",
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) + 0.0 AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) + 0.0 AS icept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) + 0.0 AS r2,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          (round(expr("regr_slope(l_extendedprice, l_quantity)"), 4) + lit(0.0)).as("slope"),
          (round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4) + lit(0.0)).as("icept"),
          (round(expr("regr_r2(l_extendedprice, l_quantity)"), 6) + lit(0.0)).as("r2"),
          count(lit(1)).as("n"))
    },

    // ---- deterministic per-group mode ----------------------------------
    // mode() is tie-nondeterministic in both engines, so the engine
    // computes it explicitly: count per (group, value), then the
    // rank-1 row under (count DESC, value ASC) — reproducible under any
    // partitioning. The window runs over the REDUCED count table
    // (|groups|×|distinct values| rows), never the fact table.
    QDef("q_agg_mode",
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |        ORDER BY cnt DESC, o_orderpriority) AS rn FROM c)
        |WHERE rn = 1
        |""".stripMargin) { (s, dir) =>
      val c = table(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("cnt").desc, col("o_orderpriority"))
      c.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
          col("cnt"))
    },

    // ---- gaps-and-islands: consecutive same-event runs per user --------
    // The classic double-row_number difference: both windows partition by
    // user (and user×type), so one exchange on user_id serves both and
    // the island group-by. Run length ≥ 3 keeps the output focused.
    QDef("q_islands",
      """WITH e AS (
        |  SELECT user_id, event_type, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    - row_number() OVER (PARTITION BY user_id, event_type
        |                         ORDER BY ts, event_id) AS grp
        |  FROM events)
        |SELECT user_id, event_type, min(ts) AS start_ts, max(ts) AS end_ts,
        |  count(*) AS run_len
        |FROM e GROUP BY user_id, event_type, grp
        |HAVING count(*) >= 3
        |""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val byUserType = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .withColumn("grp",
          row_number().over(byUser) - row_number().over(byUserType))
        .groupBy("user_id", "event_type", "grp")
        .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
          count(lit(1)).as("run_len"))
        .filter(col("run_len") >= 3)
        .select("user_id", "event_type", "start_ts", "end_ts", "run_len")
    },

    // ---- 2-D skyline (Pareto frontier) ----------------------------------
    // An order is dominated if some other order has (price ≥, date ≥)
    // with one strict. The naive formulation is the O(n²) NOT EXISTS the
    // oracle runs; the engine computes the strictly-higher-price running
    // max(date) as a TWO-PHASE segmented prefix max, because o_totalprice
    // is near-continuous: distinct prices ≈ row count, so a single
    // unpartitioned Window would funnel the whole reduction into one task.
    // Phase 1 range-buckets the distinct prices (value buckets from a
    // broadcast min/max — no sampling pass) and runs the strict prefix max
    // WITHIN each bucket in parallel; phase 2 prefix-maxes the per-bucket
    // summaries (≤ shuffle-partition count of rows — bounded, not
    // data-sized) and broadcasts them back. best_higher = the later of the
    // two. The fact table itself never sorts and never hits a global window.
    QDef("q_skyline",
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders o
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders x
        |  WHERE x.o_totalprice >= o.o_totalprice
        |    AND x.o_orderdate >= o.o_orderdate
        |    AND (x.o_totalprice > o.o_totalprice
        |         OR x.o_orderdate > o.o_orderdate))
        |""".stripMargin) { (s, dir) =>
      val o = table(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      val nB = s.conf.get("spark.sql.shuffle.partitions").toInt.max(1)
      graft.plans.SegmentedSkyline.skyline(o, nB)
    },

    // ---- filtered aggregates (FILTER clause surface) --------------------
    // Conditional aggregation without self-joins or CASE pyramids; each
    // FILTER aggregate stays partial-agg-friendly (one combined pass).
    QDef("q_agg_filtered",
      s"""SELECT o_orderstatus,
         |  count(*) AS n,
         |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
         |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
         |    FILTER (WHERE o_orderpriority LIKE '1%') AS STRING) AS DOUBLE) AS pri1_rev,
         |  min(o_orderdate) FILTER (WHERE o_totalprice <= 50000) AS mn_small
         |FROM orders GROUP BY o_orderstatus
         |""".stripMargin) { (s, dir) =>
      table(s, dir, "orders").groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
          sum(when(col("o_orderpriority").like("1%"), dec(col("o_totalprice"))))
            .cast("double").as("pri1_rev"),
          min(when(col("o_totalprice") <= 50000, col("o_orderdate")))
            .as("mn_small"))
    },

    // ---- passage-level corpus dedup (repeated-span removal) ------------
    // The RefinedWeb/CCNet step after document-level dedup: boilerplate
    // spans that recur ACROSS documents (nav bars, license headers) are
    // removed from every document while unique content stays. Documents
    // are segmented into fixed 8-word passages; a passage seen in ≥ 2
    // distinct documents is dropped; survivors reassemble in order.
    // Scale shape: the frequency pass is a partial-aggregatable
    // groupBy(passage) — at 100 TB the frequent-passage table is small
    // (boilerplate is by definition heavy-tailed) and broadcasts back as
    // an anti-join; no window, no per-doc sort (array_sort runs on each
    // doc's own ≤ dozens of segments).
    QDef("q_dedup_passages",
      """WITH docs AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |segs AS (
        |  SELECT doc_id, i AS seg_idx,
        |    array_to_string(w[(i*8+1):(i*8+8)], ' ') AS seg
        |  FROM docs, unnest(range(CAST(ceil(len(w)/8.0) AS BIGINT))) AS t(i)),
        |freq AS (
        |  SELECT seg FROM segs GROUP BY seg
        |  HAVING count(DISTINCT doc_id) >= 2),
        |kept AS (SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM freq)),
        |clean AS (
        |  SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text,
        |    count(*) AS kept_n
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(c.clean_text, '') AS clean_text,
        |  CAST(ceil(len(d.w)/8.0) AS BIGINT) - coalesce(c.kept_n, 0) AS n_removed
        |FROM docs d LEFT JOIN clean c USING (doc_id)
        |""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      val segs = docs.select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, cast(ceil(size(w)/8.0) as int) - 1)," +
            " i -> array_join(slice(w, i*8+1, 8), ' '))"))
          .as(Seq("seg_idx", "seg")))
      val freq = segs.groupBy("seg")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select("seg")
      val kept = segs.join(freq, Seq("seg"), "left_anti")
      val clean = kept.groupBy("doc_id")
        .agg(
          array_join(expr(
            "transform(array_sort(collect_list(struct(seg_idx, seg))), x -> x.seg)"),
            " ").as("clean_text"),
          count(lit(1)).as("kept_n"))
      docs
        .withColumn("nseg", ceil(size(col("w")) / 8.0).cast("long"))
        .join(clean, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          (col("nseg") - coalesce(col("kept_n"), lit(0L))).as("n_removed"))
    },

    // ---- PageRank over the event-type transition graph -----------------
    // Edges: consecutive events per user (deterministic ts, event_id
    // order); weights: out-edge counts normalized per source. 10 damped
    // iterations (d = 0.85), ranks rounded to 6 — the engine's
    // determinism convention (each iteration's inflow sum has ≤|nodes|
    // summands; the float noise is ~1e-15, 9 digits below the rounding).
    // Scale shape: each iteration is one keyed join + partial-agg on the
    // EDGE table — the rank vector rebroadcasts, the facts are touched
    // once to build edges. For graphs too large to iterate with joins,
    // the engine's pointer-doubling CC (DedupOps) is the precedent; the
    // oracle unrolls the same 10 steps as chained CTEs.
    // Round-14 optimization: the 10 iterations collapsed onto the
    // collected bounded event-type graph (RankLoops — one corpus pass
    // for the Spark-computed edge weights, driver-side loop, output
    // rounding back through Spark's round). The previous loop ran ~20
    // Spark jobs of ≤ |vocab|-row frames — pure job latency (guide
    // §1.2); PprLoopSpec pins exact equality with that shape.
    QDef("q_pagerank", pagerankOracle) { (s, dir) =>
      val (edges, nodes) = RankLoops.eventGraph(s, dir)
      val n = nodes.length
      val ranks = RankLoops.damped(edges, nodes,
        init = _ => 1.0 / n,
        restart = _ => 0.15 / n)
      RankLoops.rankedDf(s, ranks, "pr")
    }
  )

  /** Unrolled 10-iteration PageRank oracle (DuckDB lacks iterative
    * aggregation in recursive CTEs, so the loop unrolls as p1..p10). */
  private lazy val pagerankOracle: String = {
    val steps = (1 to 10).map { i =>
      s""", p$i AS (
         |  SELECT n.node,
         |    CAST(0.15 AS DOUBLE) / nn.n
         |      + CAST(0.85 AS DOUBLE)
         |        * coalesce(sum(p.r * w.w), CAST(0 AS DOUBLE)) AS r
         |  FROM nodes n CROSS JOIN nn
         |  LEFT JOIN w ON w.dst = n.node
         |  LEFT JOIN p${i - 1} p ON p.node = w.src
         |  GROUP BY n.node, nn.n)""".stripMargin
    }.mkString
    s"""WITH nx AS (
       |  SELECT event_type AS src,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
       |  FROM events),
       |edges AS (
       |  SELECT src, dst, count(*) AS c FROM nx WHERE dst IS NOT NULL
       |  GROUP BY src, dst),
       |outd AS (SELECT src, sum(c) AS tot FROM edges GROUP BY src),
       |w AS (SELECT e.src, e.dst, e.c / o.tot AS w
       |      FROM edges e JOIN outd o USING (src)),
       |nodes AS (SELECT DISTINCT event_type AS node FROM events),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS r FROM nodes, nn)$steps
       |SELECT node, round(r, 6) + 0.0 AS pr FROM p10
       |""".stripMargin
  }
}
