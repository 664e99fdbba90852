package graft.operators

import graft._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second coverage wave (SURVEY.md §2-B scalar/window rows): string functions II, analytic window
  * functions, fixed-width histograms, bitwise ops, unpivot, and date
  * parts — still all codegen'd built-ins.
  */
object Coverage2 {

  val defs: Seq[QDef] = Seq(

    QDef("q_str_funcs2",
      """SELECT c_custkey,
        |  left(c_name, 8) AS l8,
        |  right(c_name, 3) AS r3,
        |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  repeat(c_mktsegment, 2) AS twice,
        |  reverse(c_mktsegment) AS rev,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated
        |FROM customer
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer").select(
        col("c_custkey"),
        expr("left(c_name, 8)").as("l8"),
        expr("right(c_name, 3)").as("r3"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        repeat(col("c_mktsegment"), 2).as("twice"),
        reverse(col("c_mktsegment")).as("rev"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"))
    },

    // ntile quartiles — the last analytic window form not already
    // covered by q_win_analytic. The (o_totalprice, o_orderkey) order
    // is total, so bucket boundaries are engine-independent.
    QDef("q_win_ntile",
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
        |FROM orders
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      table(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast("long").as("quartile"))
    },

    QDef("q_win_analytic",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price,
        |  round(percent_rank() OVER w2, 6) AS pr,
        |  round(cume_dist() OVER w2, 6) AS cd
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |  w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val w2 = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      table(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
        round(percent_rank().over(w2), 6).as("pr"),
        round(cume_dist().over(w2), 6).as("cd"))
    },

    // Fixed-width histogram (width_bucket emulated with arithmetic —
    // identical on both engines).
    QDef("q_histogram",
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 25000.0).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    },

    QDef("q_bitwise",
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS lo_byte,
        |  o_orderkey | 1 AS force_odd,
        |  xor(o_orderkey, 21) AS xored,
        |  o_orderkey << 1 AS doubled,
        |  o_orderkey >> 3 AS eighth
        |FROM orders
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(255).as("lo_byte"),
        col("o_orderkey").bitwiseOR(1).as("force_odd"),
        col("o_orderkey").bitwiseXOR(21).as("xored"),
        shiftleft(col("o_orderkey"), 1).as("doubled"),
        shiftright(col("o_orderkey"), 3).as("eighth"))
    },

    // Unpivot (wide → long); metric names come from the source columns.
    QDef("q_unpivot",
      """SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS value FROM customer
        |UNION ALL
        |SELECT c_custkey, 'c_nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"),
          col("c_nationkey").cast("double").as("c_nationkey"))
        .unpivot(Array(col("c_custkey")),
          Array(col("c_acctbal"), col("c_nationkey")), "metric", "value")
    },

    // Sketch percentiles — mergeable fixed-size state, the 100 TB
    // variant of q_agg_percentiles. Approximate → rows-only driver
    // check; the spec bounds the error against the exact percentile.
    // Output is two scalar columns (not an array) so the driver's
    // pandas canonicalizer can sort/hash the rows (round-1 err).
    QDef.noOracle("q_agg_approx_percentile") { (s, dir) =>
      table(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)")
          .as("ps"))
        .select(col("l_returnflag"),
          element_at(col("ps"), 1).as("price_p50"),
          element_at(col("ps"), 2).as("price_p90"))
    },

    // Funnel: signup → first purchase conversion per user.
    QDef("q_funnel",
      """WITH f AS (
        |  SELECT user_id,
        |    min(ts) FILTER (WHERE event_type = 'signup') AS first_signup,
        |    min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  CAST(first_signup AS TIMESTAMP) AS first_signup,
        |  CAST(first_purchase AS TIMESTAMP) AS first_purchase,
        |  first_signup IS NOT NULL AND first_purchase IS NOT NULL
        |    AND first_purchase > first_signup AS converted
        |FROM f
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "events").groupBy("user_id")
        .agg(min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
          min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
        .select(col("user_id"), col("first_signup"), col("first_purchase"),
          (col("first_signup").isNotNull && col("first_purchase").isNotNull
            && col("first_purchase") > col("first_signup")).as("converted"))
    },

    // Bivariate statistics + argmin/argmax + boolean aggregates.
    QDef("q_agg_stats2",
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS qty_price_corr,
        |  round(covar_samp(l_discount, l_tax), 4) + 0.0 AS disc_tax_cov,
        |  max_by(l_orderkey, l_extendedprice) AS priciest_order,
        |  min_by(l_orderkey, l_extendedprice) AS cheapest_order,
        |  bool_or(l_quantity > 49.9) AS any_huge,
        |  bool_and(l_quantity > 0) AS all_positive
        |FROM lineitem GROUP BY l_returnflag
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem").groupBy("l_returnflag")
        // round at 4 digits, not 6: cross-engine double summation in the
        // corr/covar moments differs at ~1e-7 (round-1 hash-fail); +0.0
        // normalizes IEEE -0.0 to +0.0 (engines disagree on the sign of
        // a rounded-to-zero negative)
        .agg((round(corr(col("l_quantity"), col("l_extendedprice")), 4) + lit(0.0)).as("qty_price_corr"),
          (round(covar_samp(col("l_discount"), col("l_tax")), 4) + lit(0.0)).as("disc_tax_cov"),
          max_by(col("l_orderkey"), col("l_extendedprice")).as("priciest_order"),
          min_by(col("l_orderkey"), col("l_extendedprice")).as("cheapest_order"),
          bool_or(col("l_quantity") > 49.9).as("any_huge"),
          bool_and(col("l_quantity") > 0).as("all_positive"))
    },

    // Array outputs are joined to strings — the array ops (slice,
    // union, sort, flatten) still run; only the *output* is flattened
    // because the driver's canonicalizer can't hash array cells.
    QDef("q_array_funcs2",
      """WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
        |SELECT p_partkey,
        |  list_contains(w, 'widget') AS has_widget,
        |  array_to_string(list_slice(w, 1, 1), '_') AS first1,
        |  coalesce(CAST(list_position(w, 'widget') AS BIGINT), 0) AS widget_pos,
        |  array_to_string(list_sort(list_distinct(list_concat(w, ['bolt']))), '_') AS extended,
        |  array_to_string(w, '_') AS joined,
        |  array_to_string(flatten([w, ['x']]), '_') AS flat
        |FROM t
        |""".stripMargin) { (s, dir) =>
      val w = split(col("p_name"), " ")
      table(s, dir, "part").select(
        col("p_partkey"),
        array_contains(w, "widget").as("has_widget"),
        array_join(slice(w, 1, 1), "_").as("first1"),
        array_position(w, "widget").as("widget_pos"),
        array_join(array_sort(array_union(w, array(lit("bolt")))), "_").as("extended"),
        array_join(w, "_").as("joined"),
        array_join(flatten(array(w, array(lit("x")))), "_").as("flat"))
    },

    // Struct build + field access + JSON render. The struct itself is
    // exercised; outputs are scalar/string columns because the driver's
    // canonicalizer can't hash dict cells (round-1 err).
    QDef("q_struct_nested",
      """WITH t AS (
        |  SELECT n_nationkey, {'name': n_name, 'region': n_regionkey} AS info
        |  FROM nation)
        |SELECT n_nationkey,
        |  info.name AS info_name,
        |  info.region AS info_region,
        |  to_json(info) AS info_json
        |FROM t
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "nation")
        .select(col("n_nationkey"),
          struct(col("n_name").as("name"), col("n_regionkey").as("region")).as("info"))
        .select(col("n_nationkey"),
          col("info.name").as("info_name"),
          col("info.region").as("info_region"),
          to_json(col("info")).as("info_json"))
    },

    QDef("q_date_parts",
      """SELECT o_orderkey,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
        |FROM orders
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "orders").select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        weekofyear(col("o_orderdate")).cast("long").as("woy"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        last_day(col("o_orderdate").cast("date")).as("eom"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"))
    },
  )
}
