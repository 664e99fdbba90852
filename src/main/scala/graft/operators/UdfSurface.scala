package graft.operators

import graft._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** User-extension surface (SURVEY.md §2-B "UDF surface"): Scala UDF,
  * typed UDAF via Aggregator, and a table function (flatMap explosion).
  *
  * House rule demonstrated by the oracles themselves: each UDF here has
  * a pure-built-in equivalent — UDFs are the escape hatch, not the
  * default, because they break whole-stage codegen and predicate
  * pushdown around them.
  */
object UdfSurface {

  /** Typed UDAF: exact weighted mean. The buffer sums decimals at scale
    * 10 (same policy as the oracle's CAST(… AS DECIMAL(38,10))), so
    * merges are exact and order-independent — safe under any
    * partitioning, which is what makes it re-runnable at cluster scale.
    * Raw BigDecimal(double) carries the full binary expansion (scale up
    * to ~1e2), which overflows the DECIMAL(38,18) buffer encoder —
    * hence the explicit setScale. */
  object WeightedMean extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
    private def dec10(d: Double): BigDecimal =
      BigDecimal(d).setScale(10, scala.math.BigDecimal.RoundingMode.HALF_UP)
    def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) =
      (b._1 + dec10(a._1 * a._2), b._2 + dec10(a._2))
    def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (BigDecimal, BigDecimal)): Double =
      if (b._2 == 0) 0.0 else b._1.toDouble / b._2.toDouble
    def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      Encoders.product[(BigDecimal, BigDecimal)]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val defs: Seq[QDef] = Seq(

    // Scalar Scala UDF (price banding); oracle = the CASE it replaces.
    QDef("q_udf_scalar",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000 THEN 'small'
        |       WHEN o_totalprice < 150000 THEN 'medium' ELSE 'large' END AS band
        |FROM orders
        |""".stripMargin) { (s, dir) =>
      val band = udf((p: Double) =>
        if (p < 50000) "small" else if (p < 150000) "medium" else "large")
      table(s, dir, "orders")
        .select(col("o_orderkey"), band(col("o_totalprice")).as("band"))
    },

    // Typed Aggregator UDAF; oracle = exact decimal sums ratio.
    QDef("q_udaf_weighted_mean",
      """SELECT l_returnflag,
        |  round(CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,10))) AS STRING) AS DOUBLE)
        |    / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS STRING) AS DOUBLE), 6) AS w_avg_price
        |FROM lineitem GROUP BY l_returnflag
        |""".stripMargin) { (s, dir) =>
      import s.implicits._
      val wm = udaf(WeightedMean)
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        // round(6): decimal→double conversion differs by ~1 ulp between
        // engines (Java BigDecimal.doubleValue is correctly rounded,
        // DuckDB's int128-scaled conversion isn't guaranteed to be)
        .agg(round(wm(col("l_extendedprice"), col("l_quantity")), 6).as("w_avg_price"))
    },

    // Table function: one part row → one row per name token (posexplode).
    QDef("q_tablefunc_posexplode",
      """WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part),
        |x AS (SELECT p_partkey, toks, generate_subscripts(toks, 1) AS i FROM w)
        |SELECT p_partkey, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS word FROM x
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "part")
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
    },
  )
}
