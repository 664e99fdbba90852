import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core helpers shared by every query module.
  *
  * Oracle-parity conventions (the driver hash-compares our parquet output
  * against DuckDB running `SparkEntry.oracleSql` on the same tables):
  *
  *  - Double SUMs are order-dependent under parallel aggregation, so any
  *    summed double is cast to DECIMAL(38,10) *before* the sum on both
  *    engines — decimal addition is exact and order-independent, which is
  *    also what makes the result stable on a 1000-executor cluster.
  *  - AVG is derived from the exact decimal sum (sum/count), not the
  *    engine's native order-dependent double avg.
  *  - Functions whose return width differs between engines (length, year,
  *    row_number → INT in Spark, BIGINT in DuckDB) are cast to BIGINT.
  */
package object graft {
  /** A named engine query: (session, sfDir) => result. */
  type Q = (SparkSession, String) => DataFrame

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    // Corpus generations differ in how they store events.ts: older ones
    // used parquet TIMESTAMP(NANOS) — which Spark 4 rejects outright, so
    // it's read as long nanos and rebuilt — newer ones a plain µs
    // TIMESTAMP. Dispatch on the type actually read so either corpus
    // loads; both paths normalize to TIMESTAMP_NTZ (the oracle reads the
    // same file as a wall-clock timestamp, no zone).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        case _ => df.withColumn("ts", col("ts").cast("timestamp_ntz"))
      }
    else df
  }

  /** Register the given tables as temp views (for spark.sql entries). */
  def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => table(s, dir, n).createOrReplaceTempView(n))

  /** Exact, order-independent accumulator type for double sums. */
  def dec(c: Column): Column = c.cast(DecimalType(38, 10))

  /** Order-independent exact mean: decimal sum cast to double / count. */
  def avgExact(c: Column): Column = sum(dec(c)).cast("double") / count(c)

  /** Exact decimal sum surfaced as DOUBLE. Accumulation stays decimal
    * (order-independent, cluster-reproducible); only the *output* is
    * double, because the driver's canonicalizer hashes DECIMAL and
    * DOUBLE columns differently across engines (round-1 verdict). The
    * oracle side mirrors with CAST(SUM(CAST(x AS DECIMAL(38,10))) AS
    * DOUBLE) — the same exact decimal rounds to the same double in
    * both engines.
    */
  def sumExact(c: Column): Column = sum(dec(c)).cast("double")
}
