package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.DedupOps

/** Dev profiling harness: stage-level timings for the dedup/CC family
  * at a given SF dir (not part of the driver contract). */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // text path — first the uncached component costs, then the memo path
    time("shingle compute (no cache)") {
      DedupOps.shingleArrays(graft.table(spark, sfDir, "documents")).count()
    }
    time("signatures (no cache)") {
      DedupOps.minhashSignatures(
        DedupOps.shingleArrays(graft.table(spark, sfDir, "documents")), 32)
        .select(org.apache.spark.sql.functions.col("sig")).count()
    }
    time("band candidates (no cache)") {
      DedupOps.lshCandidates(DedupOps.minhashSignatures(
        DedupOps.shingleArrays(graft.table(spark, sfDir, "documents")), 32), 32, 2)
        .count()
    }
    val sh = time("shingleArrays+cache") {
      val s = DedupOps.shingleArrays(graft.table(spark, sfDir, "documents")).cache()
      s.count(); s
    }
    val pairs = time("lsh pairs (from cached sh)") {
      val p = DedupOps.lshVerifiedPairsFrom(sh, 0.8).cache()
      println(s"[profile]   pairs=${p.count()}")
      p
    }
    val (_, rounds) = time("CC over pairs") {
      val (l, r) = DedupOps.connectedComponentsWithRounds(pairs)
      l.count(); (l, r)
    }
    println(s"[profile]   cc rounds=$rounds")

    // embedding path
    val srpPairs = time("srp pairs") {
      val p = DedupOps.srpVerifiedPairsFor(spark, sfDir, 0.4)
      println(s"[profile]   srp pairs=${p.count()}")
      p
    }
    val (_, srpRounds) = time("CC over srp pairs") {
      val (l, r) = DedupOps.connectedComponentsWithRounds(
        srpPairs.select(srpPairs("v1").as("d1"), srpPairs("v2").as("d2")))
      l.count(); (l, r)
    }
    println(s"[profile]   srp cc rounds=$srpRounds")
    spark.stop()
  }
}
