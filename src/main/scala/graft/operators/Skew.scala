package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join splitting handles most hot-key joins at runtime
  * (enabled in the engine's sessions); salting is the explicit tool for
  * the cases AQE can't fix — e.g. a single key holding >executor-memory
  * rows in an aggregation, or a skewed shuffle feeding a window.
  *
  * Salting an aggregation = two-phase: aggregate on (key, salt) first
  * (spreads the hot key over `buckets` reducers), then merge the
  * partials. Works for any algebraic aggregate; results are identical
  * to the direct aggregation (asserted in SkewSpec).
  */
object Skew {

  /** Add a deterministic salt in [0, buckets): spreads rows of a hot key
    * across reducers while keeping replay determinism (hash of a
    * discriminator column, not rand()). */
  def withSalt(df: DataFrame, discriminator: Column, buckets: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(discriminator), lit(buckets)))

  /** Two-phase salted sum/count aggregation over `key`. */
  def saltedAgg(df: DataFrame, key: String, valueCol: Column,
      discriminator: Column, buckets: Int): DataFrame =
    withSalt(df, discriminator, buckets)
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))

  /** Salted broadcast-side replication for joining a skewed fact against
    * a small dimension: fact gets a salt, the dim is exploded once per
    * salt value, join on (key, salt). Equivalent rows to the plain join.
    */
  def saltedBroadcastJoin(fact: DataFrame, dim: DataFrame, key: String,
      discriminator: Column, buckets: Int): DataFrame = {
    val saltedFact = withSalt(fact, discriminator, buckets)
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<long>")))
    saltedFact.join(broadcast(replicatedDim), Seq(key, "_salt")).drop("_salt")
  }
}
