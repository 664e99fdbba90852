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
    }
  )
}
