package graft.operators

import graft._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 extension: six TPC-H classic shapes (Q2, Q4, Q7, Q8, Q13,
  * Q21 — wave 2 continues in Coverage10) plus the round's pipeline and
  * scalar operators: normalized-title dedup, length-decile bucketing
  * (plans.DecileBuckets), nearest as-of join (plans.NearestAsOf),
  * winsorized aggregation, embedding-norm histogram, event-transition
  * matrix, deterministic class balancing, per-source duplication
  * report, JSON generation round-trip, and higher-order array
  * predicates.
  *
  * The synthetic corpus has no `partsupp` table and no
  * `l_receiptdate`/`l_commitdate` columns, so the TPC-H queries keep
  * the CLASSIC JOIN TOPOLOGY exactly (that is what the optimizer audit
  * exercises) with documented column adaptations:
  *   - Q2's partsupp := the distinct (l_partkey, l_suppkey) offers in
  *     lineitem, with ps_supplycost := min offer price — one exact
  *     double picked from the data, so the correlated min-equality is
  *     cross-engine stable (no derived arithmetic).
  *   - Q4's/Q21's "kept orders waiting" flag := l_returnflag = 'R' —
  *     like receipt>commit it is intra-lineitem-row, which is what
  *     makes Q21's EXISTS/NOT-EXISTS self-joins pure lineitem↔lineitem.
  *   - Q8's part filter := p_type = 'STANDARD'; Q13's comment NOT LIKE
  *     := o_orderpriority NOT LIKE '1%' (kept in the JOIN condition —
  *     the zero-order class is the shape's point).
  */
object Coverage9 {

  val defs: Seq[QDef] = Seq(

    // ---- TPC-H Q2: min-cost supplier (correlated scalar subquery) ---------
    // The classic decorrelation benchmark: a 4-way dim join whose filter
    // compares against a correlated per-part MIN over the SAME 4-way
    // join. The engine expresses the decorrelated plan directly — one
    // shared region-filtered offer relation, a per-part min aggregate,
    // and an equality join back — which is the plan Catalyst's
    // RewriteCorrelatedScalarSubquery produces from the SQL form. The
    // region/nation/supplier dims broadcast; the only data-sized
    // exchanges are the offer groupBy and the partkey min-join.
    QDef("q_tpch_q2",
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(l_extendedprice) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
        |FROM part, ps, supplier, nation, region
        |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |  AND p_size <= 15 AND p_type = 'STANDARD'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT min(ps2.ps_supplycost)
        |    FROM ps ps2, supplier s2, nation n2, region r2
        |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |""".stripMargin) { (s, dir) =>
      val ps = table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice")).as("ps_supplycost"))
      val natEu = table(s, dir, "nation")
        .join(broadcast(table(s, dir, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supEu = table(s, dir, "supplier")
        .join(broadcast(natEu), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      // every European offer for every part — shared by both the outer
      // query and the correlated min (computed once, not per part)
      val offers = ps.join(broadcast(supEu),
        col("ps_suppkey") === col("s_suppkey"))
      val minCost = offers.groupBy("ps_partkey")
        .agg(min(col("ps_supplycost")).as("min_cost"))
      offers
        .join(broadcast(table(s, dir, "part")
          .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")),
          col("p_partkey") === col("ps_partkey"))
        .join(minCost, Seq("ps_partkey"))
        .filter(col("ps_supplycost") === col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
          "ps_supplycost")
    },

    // ---- TPC-H Q21: suppliers who solely caused a problem -----------------
    // The multi-semi-anti self-join: a flagged lineitem qualifies when
    // ANOTHER supplier shipped in the same order (EXISTS → left-semi)
    // but NO other supplier's line in that order was flagged
    // (NOT EXISTS → left-anti). All three lineitem legs and the orders
    // filter join on l_orderkey, so one orderkey exchange serves the
    // semi, the anti, and the orders join; supplier/nation/region
    // broadcast. ORDER BY numwait DESC, s_name is a total order
    // (s_name unique), so the LIMIT is deterministic.
    QDef("q_tpch_q21",
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN region ON r_regionkey = n_regionkey AND r_name = 'ASIA'
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100
        |""".stripMargin) { (s, dir) =>
      val li = table(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
      val l1 = li.filter(col("l_returnflag") === "R")
      val others = li.select(col("l_orderkey").as("x_orderkey"),
        col("l_suppkey").as("x_suppkey"))
      val othersFlagged = l1.select(col("l_orderkey").as("y_orderkey"),
        col("l_suppkey").as("y_suppkey"))
      val supAsia = table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")
          .join(broadcast(table(s, dir, "region")
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      l1
        .join(table(s, dir, "orders")
          .filter(col("o_orderstatus") === "F").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(others,
          col("x_orderkey") === col("l_orderkey") &&
            col("x_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(othersFlagged,
          col("y_orderkey") === col("l_orderkey") &&
            col("y_suppkey") =!= col("l_suppkey"), "left_anti")
        .join(broadcast(supAsia), col("s_suppkey") === col("l_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // ---- TPC-H Q4: order priority checking (EXISTS semi join) -------------
    // One quarter of orders, kept only when some line of the order is
    // flagged (adaptation: returnflag 'R' for receipt>commit, as in
    // Q21). The EXISTS collapses to a left-semi join on orderkey — the
    // flag filter is pushed INTO the lineitem scan, so the semi side
    // carries only flagged lines into the exchange.
    QDef("q_tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .join(table(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R").select("l_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },

    // ---- TPC-H Q7: volume shipping between two nations --------------------
    // The two-nation-pair join: lineitem joins its supplier's nation
    // AND its order's customer's nation, keeping the (n1,n2)/(n2,n1)
    // pairs. Both nation dims broadcast with their aliases kept
    // distinct; revenue accumulates decimal-exact per (supp_nation,
    // cust_nation, year).
    QDef("q_tpch_q7",
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(CAST(SUM(CAST(volume AS DECIMAL(38,10))) AS STRING) AS DOUBLE)
        |    AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |  WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |     OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
        |GROUP BY supp_nation, cust_nation, l_year
        |""".stripMargin) { (s, dir) =>
      val n1 = table(s, dir, "nation")
        .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
      val n2 = table(s, dir, "nation")
        .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
      table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(table(s, dir, "customer")),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(table(s, dir, "supplier")),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("nk1") === col("s_nationkey"))
        .join(broadcast(n2), col("nk2") === col("c_nationkey"))
        .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19")
          || (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .select(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sumExact(col("volume")).as("revenue"))
    },

    // ---- TPC-H Q8: national market share ----------------------------------
    // Share-of-total inside each group: both the numerator (volume from
    // the target nation's suppliers) and the denominator come from ONE
    // partial-agg pass over the region's STANDARD-part order volume —
    // the conditional-aggregation alternative to a self-join. The final
    // share divides two exact decimal sums cast to identical doubles
    // (the q_tpch_q14 convention).
    QDef("q_tpch_q8",
      """SELECT o_year,
        |  CAST(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_1'
        |                          THEN volume ELSE 0 END AS DECIMAL(38,10)))
        |       AS STRING) AS DOUBLE) /
        |  CAST(CAST(SUM(CAST(volume AS DECIMAL(38,10))) AS STRING) AS DOUBLE)
        |    AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    l_extendedprice * (1 - l_discount) AS volume,
        |    n1.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey AND p_type = 'STANDARD'
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = n2.n_regionkey AND r_name = 'ASIA'
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation n1 ON n1.n_nationkey = s_nationkey)
        |GROUP BY o_year
        |""".stripMargin) { (s, dir) =>
      val n1 = table(s, dir, "nation")
        .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
      val custAsia = table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")
          .join(broadcast(table(s, dir, "region")
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val vol = table(s, dir, "lineitem")
        .join(broadcast(table(s, dir, "part")
          .filter(col("p_type") === "STANDARD")),
          col("p_partkey") === col("l_partkey"))
        .join(table(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(custAsia), col("c_custkey") === col("o_custkey"))
        .join(broadcast(table(s, dir, "supplier")),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("nk1") === col("s_nationkey"))
        .select(year(col("o_orderdate")).cast("long").as("o_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"),
          col("supp_nation"))
      vol.groupBy("o_year")
        .agg((sumExact(when(col("supp_nation") === "NATION_1", col("volume"))
          .otherwise(lit(0))) / sumExact(col("volume"))).as("mkt_share"))
    },

    // ---- TPC-H Q13: customer order-count distribution ---------------------
    // The double aggregation over a LEFT join: customers keep their
    // zero-order rows (count(o_orderkey) = 0), then the per-customer
    // counts histogram. The filtered join predicate (priority NOT LIKE,
    // standing in for the comment NOT LIKE) belongs to the JOIN
    // condition, not a WHERE — moving it would silently drop the
    // zero-order class.
    QDef("q_tpch_q13",
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders")
          .filter(!col("o_orderpriority").like("1%")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    },

    // ---- normalized-title dedup (soft duplicate detection) ----------------
    // The web-corpus stage between exact and MinHash dedup: documents
    // whose canonicalized leading span (lowercase, alphanumerics only,
    // collapsed whitespace) collides are near-certain duplicates —
    // re-crawls with different boilerplate tails, title-page copies.
    // One hash groupBy on the derived key: embarrassingly scalable,
    // no candidate join at all. Survivor = min doc_id (the repo's
    // dedup convention).
    QDef("q_dedup_title_norm",
      """WITH k AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(
        |      lower(substr(trim(text), 1, 48)), '[^a-z0-9 ]', '', 'g'),
        |      ' +', ' ', 'g')) AS title_key
        |  FROM documents)
        |SELECT title_key, count(*) AS n_docs, min(doc_id) AS keep_id
        |FROM k GROUP BY title_key HAVING count(*) > 1
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          trim(regexp_replace(regexp_replace(
            lower(substring(trim(col("text")), 1, 48)), "[^a-z0-9 ]", ""),
            " +", " ")).as("title_key"))
        .groupBy("title_key")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
        .filter(col("n_docs") > 1)
    },

    // ---- length-decile bucketing (curriculum / batch shaping) -------------
    // Assigning every document to an exact length decile WITHOUT a
    // global sort: lengths live in a BOUNDED domain (≤ max doc chars —
    // 523 distinct at sf0.1 and corpus-size independent, unlike
    // q_skyline's near-continuous prices), so the corpus reduces to a
    // per-length count table first and the cumulative runs over that
    // reduction only. Cutoff k = min length whose cumulative count
    // reaches k/10 of the corpus — all-integer arithmetic (cum*10 ≥
    // k*n), so both engines agree exactly. Docs then bucket against
    // the broadcast 9-element cutoff array: scan + broadcast, no
    // data-sized shuffle beyond the length groupBy.
    QDef("q_len_buckets",
      """WITH c AS (SELECT n_chars AS len, count(*) AS cnt
        |           FROM documents GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM documents),
        |cum AS (SELECT len, sum(cnt) OVER (ORDER BY len) AS cum FROM c),
        |ks AS (SELECT unnest(range(1, 10)) AS k),
        |cut AS (SELECT k, min(len) AS cutoff
        |        FROM cum, ks, tot WHERE cum * 10 >= k * n GROUP BY k)
        |SELECT bucket, count(*) AS n_docs,
        |  min(n_chars) AS mn_len, max(n_chars) AS mx_len
        |FROM (SELECT d.n_chars,
        |        CAST(1 + (SELECT count(*) FROM cut WHERE cutoff < d.n_chars)
        |             AS BIGINT) AS bucket
        |      FROM documents d)
        |GROUP BY bucket
        |""".stripMargin) { (s, dir) =>
      graft.plans.DecileBuckets.histogram(
        table(s, dir, "documents"), "n_chars", 10)
    },

    // ---- point-in-time state reconstruction (time travel) -----------------
    // The query a mirror user runs against CDC history: "what was every
    // key's state at time T?" — the temporal dual of q_scd2's interval
    // view and of the Materializer's latest-state compaction. One
    // T-filter + last-writer-wins per key, same (ts, event_id) order
    // the CDC compactor uses. NOTE on pushdown: in THIS corpus ts is
    // rebuilt from parquet nanos (Spark 4 rejects TIMESTAMP(NANOS)), so
    // the T-comparison runs post-decode — only IsNotNull reaches the
    // scan. On a normally-typed or time-partitioned history table the
    // same plan pushes the range to the scan / prunes partitions, which
    // is what makes this cheap at 100 TB.
    QDef("q_state_at",
      """WITH h AS (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |SELECT user_id, event_id, event_type, value
        |FROM h WHERE rn = 1
        |""".stripMargin) { (s, dir) =>
      PointInTime.stateAt(table(s, dir, "events"),
          "user_id", "ts", "event_id",
          lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
        .select("user_id", "event_id", "event_type", "value")
    },

    // ---- JSON generation + round-trip (to_json surface) -------------------
    // The write side of the JSON scalar family (q_json_funcs covers the
    // read side): rows serialize to canonical JSON objects/arrays and
    // parse back. Field order follows struct order on both engines and
    // every value is a string or integer, so the serialized text is
    // byte-identical cross-engine (doubles would not be — formatting
    // differs). Pure per-row work, no shuffle.
    QDef("q_json_funcs2",
      """SELECT event_id,
        |  to_json(struct_pack(t := event_type,
        |    k := CAST(json_extract_string(props, '$.k') AS BIGINT),
        |    u := user_id)) AS obj,
        |  CAST(json_array_length(to_json([user_id, event_id])) AS BIGINT)
        |    AS alen,
        |  CAST(json_extract_string(to_json(struct_pack(t := event_type,
        |    k := CAST(json_extract_string(props, '$.k') AS BIGINT),
        |    u := user_id)), '$.k') AS BIGINT) AS k_back
        |FROM events
        |""".stripMargin) { (s, dir) =>
      // ignoreNullFields=false: Spark's default OMITS null struct
      // fields while DuckDB serializes "k":null, so a corpus row
      // lacking $.k would silently break byte-parity (r6 advice) —
      // with nulls emitted, both engines agree on every input.
      val obj = to_json(struct(
        col("event_type").as("t"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("user_id").as("u")),
        Map("ignoreNullFields" -> "false"))
      table(s, dir, "events")
        .select(col("event_id"), obj.as("obj"),
          json_array_length(to_json(array(col("user_id"), col("event_id"))))
            .cast("long").as("alen"),
          get_json_object(obj, "$.k").cast("long").as("k_back"))
    },

    // ---- higher-order array predicates (exists / forall / filter) ---------
    // The lambda-predicate surface over array columns: per-row counts
    // and boolean folds on the embedding vectors. Float comparisons
    // against a literal are deterministic (identical floats both
    // engines); every output is an integer or boolean. Embarrassingly
    // parallel — no shuffle beyond the final projection.
    QDef("q_array_hof",
      """SELECT vec_id,
        |  CAST(len(list_filter(embedding, x -> x > 0.1)) AS BIGINT)
        |    AS n_big,
        |  len(list_filter(embedding, x -> x > 0.1)) > 0 AS any_big,
        |  len(list_filter(embedding, x -> x > -1)) = len(embedding)
        |    AS all_above_neg1,
        |  CAST(len(list_filter(embedding, x -> abs(x) <= 0.01)) AS BIGINT)
        |    AS n_near_zero
        |FROM embeddings
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("size(filter(embedding, x -> x > 0.1))").cast("long")
            .as("n_big"),
          expr("exists(embedding, x -> x > 0.1)").as("any_big"),
          expr("forall(embedding, x -> x > -1)").as("all_above_neg1"),
          expr("size(filter(embedding, x -> abs(x) <= 0.01))").cast("long")
            .as("n_near_zero"))
    },

    // ---- per-source duplication report (corpus triage) --------------------
    // The dashboard number dedup decisions are made from: for each
    // ingestion source, how much of it is exact-duplicate content, and
    // how much is REDUNDANT (removable — everything past each group's
    // min-doc_id survivor). Two hash groupBys (content hash, then
    // source); the ratio divides two identical integers, so both
    // engines emit the same double.
    QDef("q_dup_rate_by_source",
      """WITH h AS (SELECT doc_id, source, md5(text) AS hsh FROM documents),
        |g AS (SELECT hsh, count(*) AS n, min(doc_id) AS keep
        |      FROM h GROUP BY hsh)
        |SELECT source, count(*) AS n_docs,
        |  count(*) FILTER (WHERE g.n > 1) AS n_in_dup_groups,
        |  count(*) FILTER (WHERE g.n > 1 AND h.doc_id <> g.keep)
        |    AS n_redundant,
        |  CAST(count(*) FILTER (WHERE g.n > 1 AND h.doc_id <> g.keep)
        |       AS DOUBLE) / count(*) AS dup_ratio
        |FROM h JOIN g USING (hsh)
        |GROUP BY source
        |""".stripMargin) { (s, dir) =>
      val h = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          md5(col("text").cast("binary")).as("hsh"))
      val g = h.groupBy("hsh")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep"))
      h.join(g, "hsh")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("n") > 1, 1)).as("n_in_dup_groups"),
          count(when(col("n") > 1 && col("doc_id") =!= col("keep"), 1))
            .as("n_redundant"))
        .select(col("source"), col("n_docs"), col("n_in_dup_groups"),
          col("n_redundant"),
          (col("n_redundant").cast("double") / col("n_docs")).as("dup_ratio"))
    },

    // ---- deterministic class balancing (majority downsampling) ------------
    // Training-set prep: every label class downsampled to the SMALLEST
    // class's size, selection by md5(vec_id) rank — deterministic,
    // replayable, partitioning-independent (no rand()). The exact
    // per-class rank is the correctness anchor; at 100 TB the md5-
    // threshold coin (q_sample_stratified_det) is the rankless scale
    // path when an approximate per-class quota suffices.
    QDef("q_sample_balanced",
      """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        |m AS (SELECT min(n) AS target FROM c),
        |r AS (SELECT vec_id, label,
        |        row_number() OVER (PARTITION BY label
        |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        |      FROM embeddings)
        |SELECT vec_id, label, CAST(rk AS BIGINT) AS rk
        |FROM r, m WHERE rk <= target
        |""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val target = e.groupBy("label").agg(count(lit(1)).as("cn"))
        .groupBy().agg(min(col("cn")).as("target"))
      val w = Window.partitionBy("label")
        .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
      e.select(col("vec_id"), col("label"),
          row_number().over(w).cast("long").as("rk"))
        .crossJoin(broadcast(target))
        .filter(col("rk") <= col("target"))
        .select("vec_id", "label", "rk")
    },

    // ---- behavioral transition matrix (first-order Markov) ----------------
    // Sequence mining over the event stream: P(next event type | type),
    // per-user ordered. lead() needs one user_id exchange; both
    // aggregates after it are on the tiny type×type key space, and the
    // probability divides two identical integers (exact IEEE division,
    // no rounding convention needed) — the q_lm_score arrangement over
    // behavior instead of text.
    QDef("q_event_transitions",
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type AS from_type, next_type AS to_type,
        |        count(*) AS n
        |      FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT from_type, to_type, n, CAST(n AS DOUBLE) / tot AS p
        |FROM c JOIN t USING (from_type)
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val c = table(s, dir, "events")
        .select(col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      c.join(c.groupBy("from_type").agg(sum(col("n")).as("tot")), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") / col("tot")).as("p"))
    },

    // ---- winsorized aggregation (outlier clipping) ------------------------
    // The robust-statistics prep stage: per group, values clip to the
    // exact p05/p95 order statistics before summing. Clip bounds come
    // from the q_percentile_disc cume_dist construction (bounds are
    // CORPUS ELEMENTS — exact doubles both engines agree on, no
    // interpolation); the clipped sum follows the decimal-exact
    // convention. Exact per-group percentiles sort within each group
    // once — the documented exact-percentile cost floor; the
    // approx_percentile sketch is the 100 TB path when p05/p95 need
    // only t-digest accuracy.
    QDef("q_winsorize",
      """WITH r AS (
        |  SELECT event_type, value,
        |    cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
        |  FROM events),
        |b AS (
        |  SELECT event_type,
        |    min(value) FILTER (WHERE cd >= 0.05) AS lo,
        |    min(value) FILTER (WHERE cd >= 0.95) AS hi
        |  FROM r GROUP BY event_type)
        |SELECT e.event_type,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE value < lo) AS n_clip_low,
        |  count(*) FILTER (WHERE value > hi) AS n_clip_high,
        |  CAST(CAST(SUM(CAST(CASE WHEN value < lo THEN lo
        |                          WHEN value > hi THEN hi
        |                          ELSE value END AS DECIMAL(38,10)))
        |       AS STRING) AS DOUBLE) AS wsum
        |FROM events e JOIN b ON e.event_type = b.event_type
        |GROUP BY e.event_type
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("event_type").orderBy("value")
      val bounds = table(s, dir, "events")
        .select(col("event_type"), col("value"),
          cume_dist().over(w).as("cd"))
        .groupBy("event_type")
        .agg(min(when(col("cd") >= 0.05, col("value"))).as("lo"),
          min(when(col("cd") >= 0.95, col("value"))).as("hi"))
      val clipped = when(col("value") < col("lo"), col("lo"))
        .when(col("value") > col("hi"), col("hi")).otherwise(col("value"))
      table(s, dir, "events")
        .join(broadcast(bounds), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(when(col("value") < col("lo"), 1)).as("n_clip_low"),
          count(when(col("value") > col("hi"), 1)).as("n_clip_high"),
          sumExact(clipped).as("wsum"))
    },

    // ---- embedding L2-norm histogram --------------------------------------
    // Corpus-health check before similarity search: the distribution of
    // vector norms (un-normalized embeddings poison cosine thresholds).
    // The squared-norm fold runs in PINNED list order on both engines
    // (the q_ewma pattern: Spark aggregate() == DuckDB list_reduce with
    // a prepended init), float→double casts are exact, and IEEE sqrt is
    // correctly rounded — so the norms are bit-identical and the
    // histogram buckets can't wobble. Pure per-row work + one tiny
    // groupBy: embarrassingly parallel at any corpus size.
    QDef("q_embed_norm_stats",
      """WITH n AS (
        |  SELECT vec_id,
        |    sqrt(list_reduce(
        |      list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |      (a, b) -> a + b)) AS nrm
        |  FROM embeddings)
        |SELECT CAST(floor(nrm * 16) AS BIGINT) AS bucket,
        |  count(*) AS n_vecs, min(nrm) AS mn_norm, max(nrm) AS mx_norm
        |FROM n GROUP BY bucket
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "embeddings")
        .select(col("vec_id"), sqrt(expr(
          "aggregate(embedding, cast(0 as double)," +
            " (a, x) -> a + cast(x as double) * cast(x as double))"))
          .as("nrm"))
        .groupBy(floor(col("nrm") * 16).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("nrm")).as("mn_norm"), max(col("nrm")).as("mx_norm"))
    },

    // ---- nearest as-of join (bidirectional) -------------------------------
    // pandas merge_asof(direction='nearest') distributed: for every
    // purchase, the click by the same user closest in time, looking
    // BOTH ways. One merged event stream per user, two frame-bounded
    // window passes (running last click behind, running first click
    // ahead) — |purchases|+|clicks| rows through one user_id exchange,
    // never a time-band join. Ties break toward the earlier click; all
    // arithmetic is integer microseconds, so engines agree exactly.
    QDef("q_asof_nearest",
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |x AS (SELECT *,
        |  last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_us,
        |  first_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_us
        |  FROM ev)
        |SELECT event_id, user_id, us AS purchase_us,
        |  CASE WHEN next_us IS NULL
        |         OR (prev_us IS NOT NULL AND us - prev_us <= next_us - us)
        |       THEN prev_us ELSE next_us END AS nearest_click_us,
        |  abs(us - CASE WHEN next_us IS NULL
        |         OR (prev_us IS NOT NULL AND us - prev_us <= next_us - us)
        |       THEN prev_us ELSE next_us END) AS gap_us
        |FROM x WHERE event_type = 'purchase'
        |""".stripMargin) { (s, dir) =>
      graft.plans.NearestAsOf.nearest(
        table(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts").cast("timestamp")).as("us")),
        leftType = "purchase", rightType = "click")
    }
  )
}
