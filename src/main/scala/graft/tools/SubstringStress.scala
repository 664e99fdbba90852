package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures WHY q_dedup_substring is an occurrence join and not a pair
  * join, on a planted boilerplate-heavy corpus: `df` documents share
  * one 12-token boilerplate span (5 duplicated 8-grams of document
  * frequency df each), every other token is unique.
  *
  * Two formulations of "find repeated-substring occurrences":
  *  - occurrence join (the shipped shape): gram → hash-agg
  *    (min first-occurrence, count) → join occurrences back — the
  *    duplicated-gram table carries ONE ROW PER OCCURRENCE, so hot
  *    grams cost O(df);
  *  - pair join (the naive candidate-pair shape borrowed from
  *    pair-dedup): self-join the duplicated grams on the gram — a hot
  *    gram produces C(df, 2) pairs, O(df²).
  *
  * Both run at df and 2·df on the SAME corpus size, with planted-count
  * assertions (dups = 5·(df−1), pairs = 5·C(df,2)); the printed growth
  * ratios are the measurement: occurrences double, pairs quadruple. At
  * corpus scale a boilerplate licence header reaches df ~ 10⁶⁺, where
  * O(df²) is 10¹² rows from ONE span — the shape, not the constant, is
  * what makes substring dedup feasible at 100 TB. (The containment
  * family handles the same blow-up differently: a df CAP that drops
  * hot shingles from the representation — valid for similarity, not
  * for exact substring removal, which must keep every occurrence.)
  */
object SubstringStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-substring-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SUB_DOCS", "400000").toLong
    val df0 = sys.env.getOrElse("SPARK_GRAFT_SUB_DF", "3000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")

    /** nDocs docs; ids ≡ 0 (mod nDocs/df) open with the boilerplate. */
    def corpus(df: Long): DataFrame = {
      val hotEvery = nDocs / df
      spark.range(nDocs).select(col("id").as("doc_id"),
        when(col("id") % hotEvery === 0,
          concat_ws(" ", lit(boiler), uniqueTail()))
          .otherwise(uniqueTail()).as("text"))
    }
    def uniqueTail() = concat_ws(" ",
      expr("transform(sequence(0, 9), j -> concat('u', id, '_', j))"))

    def grams(c: DataFrame): DataFrame = c
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 8)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(w) - 8)," +
          " i -> array_join(slice(w, i + 1, 8), ' '))")).as(Seq("pos", "g")))
      .select(col("g"), (col("doc_id") * lit(1L << 24) + col("pos")).as("enc"))

    def time(run: => Long): (Long, Double) = {
      val samples = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val rows = run
        (rows, (System.nanoTime() - t0) / 1e9)
      }
      (samples.head._1, samples.map(_._2).min)
    }

    def occurrenceLeg(df: Long): (Long, Double) = time {
      val g = grams(corpus(df))
      val firsts = g.groupBy("g")
        .agg(min(col("enc")).as("fe"), count(lit(1)).as("c"))
        .filter(col("c") >= 2).select("g", "fe")
      g.join(firsts, "g").filter(col("enc") =!= col("fe")).count()
    }

    // the pair leg does what candidate-pair dedup does downstream:
    // aggregate per DISTINCT pair (a bare count over the join would
    // stream pairs through codegen without ever paying their
    // materialization — the aggregation is where O(df²) rows hurt)
    def pairLeg(df: Long): (Long, Double) = time {
      val g = grams(corpus(df))
      val hot = g.join(
        g.groupBy("g").agg(count(lit(1)).as("c")).filter(col("c") >= 2)
          .select("g"), "g")
      hot.as("a").join(hot.as("b"),
        col("a.g") === col("b.g") && col("a.enc") < col("b.enc"))
        .groupBy(shiftright(col("a.enc"), 24).as("d1"),
          shiftright(col("b.enc"), 24).as("d2"))
        .agg(count(lit(1)).as("shared")).count()
    }

    val legs = for (df <- Seq(df0, df0 * 2)) yield {
      // ids ≡ 0 (mod ⌊nDocs/df⌋) — the integer stride makes the ACTUAL
      // planted frequency ⌈nDocs/stride⌉, slightly above the nominal df
      val actual = (nDocs + nDocs / df - 1) / (nDocs / df)
      val (occRows, occSec) = occurrenceLeg(df)
      val (pairRows, pairSec) = pairLeg(df)
      assert(occRows == 5 * (actual - 1),
        s"planting broke: occ=$occRows actual_df=$actual")
      assert(pairRows == actual * (actual - 1) / 2,
        s"planting broke: pairs=$pairRows actual_df=$actual")
      println(f"""{"df":$df,"occ_rows":$occRows,"occ_sec":$occSec%.3f,""" +
        f""""pair_rows":$pairRows,"pair_sec":$pairSec%.3f}""")
      (occRows, occSec, pairRows, pairSec)
    }
    val (o1, os1, p1, ps1) = legs(0); val (o2, os2, p2, ps2) = legs(1)
    println(f"""{"metric":"substring_stress","docs":$nDocs,""" +
      f""""occ_row_growth":${o2.toDouble / o1}%.2f,""" +
      f""""pair_row_growth":${p2.toDouble / p1}%.2f,""" +
      f""""occ_sec_growth":${os2 / os1}%.2f,"pair_sec_growth":${ps2 / ps1}%.2f,""" +
      f""""pair_over_occ_sec_at_2df":${ps2 / os2}%.2f}""")
    spark.stop()
  }
}
