package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Scalar function surface: string, date/time, math, JSON, array.
  * All codegen'd built-ins (no UDFs) — these stay inside whole-stage
  * codegen, so at 100 TB they are pure per-row CPU with no boundary.
  *
  * Parity notes vs the DuckDB oracle: length/year/month/day/instr return
  * INT in Spark and BIGINT in DuckDB → cast to BIGINT; floor/ceil return
  * BIGINT in Spark and DOUBLE in DuckDB → cast both to BIGINT;
  * unix seconds = CAST(ts AS LONG) in Spark = floor(epoch(ts)) in DuckDB.
  */
object Scalars {

  val defs: Seq[QDef] = Seq(

    QDef("q_str_funcs",
      """SELECT c_custkey,
        |  lower(c_name) AS lname,
        |  upper(c_mktsegment) AS useg,
        |  concat(c_name, ':', c_mktsegment) AS joined,
        |  substring(c_name, 10, 9) AS digits,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS num_part,
        |  string_split(c_name, '#')[2] AS after_hash,
        |  replace(c_mktsegment, 'E', '_') AS repl,
        |  trim(concat('  ', c_mktsegment, '  ')) AS trimmed,
        |  c_name LIKE '%42' AS ends42
        |FROM customer
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer").select(
        col("c_custkey"),
        lower(col("c_name")).as("lname"),
        upper(col("c_mktsegment")).as("useg"),
        concat(col("c_name"), lit(":"), col("c_mktsegment")).as("joined"),
        substring(col("c_name"), 10, 9).as("digits"),
        length(col("c_name")).cast("long").as("name_len"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("num_part"),
        element_at(split(col("c_name"), "#"), 2).as("after_hash"),
        regexp_replace(col("c_mktsegment"), "E", "_").as("repl"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
        col("c_name").like("%42").as("ends42"))
    },

    QDef("q_date_funcs",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  CAST(o_orderdate AS DATE) AS od,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        |FROM orders
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
        unix_seconds(col("o_orderdate").cast("timestamp")).as("epoch_s"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
        col("o_orderdate").cast("date").as("od"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"))
    },

    QDef("q_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * l_discount, 4) AS disc_amt,
        |  abs(l_discount - 0.05) AS dev,
        |  CAST(floor(l_quantity) AS BIGINT) AS qf,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qc,
        |  greatest(l_quantity, 25.0) AS biggest,
        |  least(l_tax, l_discount) AS smallest,
        |  l_orderkey % 7 AS bucket,
        |  sqrt(l_quantity) AS root,
        |  round(ln(1 + l_extendedprice), 6) AS log_price
        |FROM lineitem
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        // scale 4 recovers the mathematically-exact 4-decimal product on
        // both engines; scale 2 would hit round-half ties they break
        // differently (Spark HALF_UP vs DuckDB half-even).
        round(col("l_extendedprice") * col("l_discount"), 4).as("disc_amt"),
        abs(col("l_discount") - 0.05).as("dev"),
        floor(col("l_quantity")).as("qf"),
        ceil(col("l_quantity")).as("qc"),
        greatest(col("l_quantity"), lit(25.0)).as("biggest"),
        least(col("l_tax"), col("l_discount")).as("smallest"),
        (col("l_orderkey") % 7).as("bucket"),
        sqrt(col("l_quantity")).as("root"),
        round(log(lit(1) + col("l_extendedprice")), 6).as("log_price"))
    },

    QDef("q_json_funcs",
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          get_json_object(col("props"), "$.missing").cast("long").as("missing"),
          // schema-first parse of the same field (from_json path)
          from_json(col("props"), "k BIGINT", Map.empty[String, String])
            .getField("k").as("k_struct"))
        .filter(col("k") > 50)
    },

    QDef("q_array_funcs",
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  embedding[1] AS first_val,
        |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)), 6) AS norm_sq,
        |  embedding[1] + embedding[1] AS zip_first
        |FROM embeddings
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "embeddings").select(
        col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")), 6).as("norm_sq"),
        element_at(zip_with(col("embedding"), col("embedding"), (a, b) => a + b), 1)
          .as("zip_first"))
    },
  )
}
