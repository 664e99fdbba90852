package graft.tools

import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the dedup family's cost ceiling — the
  * [[DedupOps.connectedComponentsWithRounds]] fixpoint — on PLANTED
  * pathological cluster shapes at ~1M pairs, the way SubstringStress
  * measures the occurrence-vs-pair asymmetry:
  *
  *  - `chain`: one path component — maximal diameter, the adversarial
  *    case for label propagation. Plain min-label propagation needs
  *    O(diameter) rounds (a million-round death sentence at 1M pairs);
  *    the loop's pointer doubling must hold it to O(log₂ diameter).
  *  - `chain×2`: the growth probe. Doubling the diameter must add
  *    ~ONE round (log), not double the rounds (linear) — the printed
  *    `round_growth` is the measurement, asserted ≤ +3 (slack for the
  *    doubling interacting with the seed round).
  *  - `star`: maximal degree, diameter 2 — must converge in O(1)
  *    rounds straight from the min-neighbor seed; per-round cost is
  *    where the hub's 1M edges land, not in extra rounds.
  *  - `clusters`: 10k chain-shaped components of 100 nodes — the shape
  *    real near-dup corpora actually produce (many small clusters);
  *    rounds follow the LARGEST diameter (log₂ 100 ≈ 7), not the
  *    cluster count — rounds are a corpus-wide max, so a 100 TB corpus
  *    of small clusters pays single-digit rounds regardless of how
  *    many clusters it holds.
  *
  * Every leg asserts its planted labels exactly (all-zero canonicals
  * for chain/star, per-cluster base for clusters) — a converged-but-
  * wrong fixpoint would otherwise read as a fast run.
  */
object CcStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cc-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nPairs = sys.env.getOrElse("SPARK_GRAFT_CC_PAIRS", "1000000").toLong

    def chain(n: Long): DataFrame =
      spark.range(n).select(col("id").as("d1"), (col("id") + 1).as("d2"))
    def star(n: Long): DataFrame =
      spark.range(1, n + 1).select(lit(0L).as("d1"), col("id").as("d2"))
    def clusters(k: Long, size: Long): DataFrame =
      spark.range(k * size).filter((col("id") + 1) % size =!= 0)
        .select(col("id").as("d1"), (col("id") + 1).as("d2"))

    /** Run one leg; returns (rounds, seconds). `check` must hold for
      * EVERY label row (planted-shape exactness). */
    def leg(name: String, pairs: DataFrame,
        check: org.apache.spark.sql.Column): (Int, Double) = {
      val p = pairs.cache(); val np = p.count()
      System.gc()
      val t0 = System.nanoTime()
      val (labels, rounds) =
        DedupOps.connectedComponentsWithRounds(p, knownPairCount = Some(np))
      // the fixpoint is fully materialized when the call returns (each
      // round's Σ-probe is an action) — stop the clock BEFORE the
      // verification scan, which is asserted, not measured
      val sec = (System.nanoTime() - t0) / 1e9
      val bad = labels.filter(!check).count()
      assert(bad == 0, s"$name: $bad mislabeled vertices")
      p.unpersist()
      DedupOps.clearMemos()
      println(f"""{"shape":"$name","pairs":$np,"rounds":$rounds,""" +
        f""""sec":$sec%.3f,"sec_per_round":${sec / rounds}%.3f}""")
      (rounds, sec)
    }

    val (rChain, _) = leg("chain", chain(nPairs), col("canonical") === 0L)
    val (rChain2, _) = leg("chain_2x", chain(nPairs * 2), col("canonical") === 0L)
    val (rStar, _) = leg("star", star(nPairs), col("canonical") === 0L)
    val clSize = 100L
    val (rClusters, _) = leg("clusters",
      clusters(nPairs / (clSize - 1), clSize),
      col("canonical") === col("doc_id") - pmod(col("doc_id"), lit(clSize)))

    val log2n = math.log(nPairs.toDouble) / math.log(2)
    assert(rChain <= log2n + 4,
      s"chain rounds $rChain vs log2 bound ${log2n.toInt} — doubling broken?")
    assert(rChain2 - rChain <= 3,
      s"2x diameter added ${rChain2 - rChain} rounds — growth is not log")
    assert(rStar <= 3, s"star took $rStar rounds — seed round broken?")
    println(f"""{"metric":"cc_stress","pairs":$nPairs,""" +
      f""""chain_rounds":$rChain,"chain2x_rounds":$rChain2,""" +
      f""""round_growth_at_2x_diameter":${rChain2 - rChain},""" +
      f""""star_rounds":$rStar,"clusters_rounds":$rClusters,""" +
      f""""log2_pairs":$log2n%.1f}""")
    spark.stop()
  }
}
