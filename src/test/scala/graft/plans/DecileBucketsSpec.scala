package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-corpus correctness for the no-global-sort quantile
  * bucketing: corpora smaller than the bucket count, one value holding
  * most of the mass (cutoff collapse), all-equal values, and random
  * duplicate-heavy draws — each vs a local order-statistic oracle. */
class DecileBucketsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def local(values: Seq[Long], nB: Int): Map[Long, (Long, Long, Long)] = {
    val sorted = values.sorted
    val n = sorted.length
    val cutoffs = (1 until nB).map { k =>
      sorted(sorted.indices.find(i => (i + 1).toLong * nB >= k.toLong * n).get)
    }
    values.groupBy(v => 1L + cutoffs.count(_ < v)).view
      .mapValues(vs => (vs.length.toLong, vs.min, vs.max)).toMap
  }

  private def viaPlan(values: Seq[Long], nB: Int): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val df = values.toDF("n_chars")
    DecileBuckets.histogram(df, "n_chars", nB).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  private def check(values: Seq[Long], nB: Int, hint: String): Unit = {
    val got = viaPlan(values, nB)
    assert(got === local(values, nB), hint)
    assert(got.values.map(_._1).sum === values.length.toLong, s"$hint: total")
  }

  test("corpus smaller than the bucket count") {
    check(Seq(5L, 9L, 2L), 10, "3 docs, 10 buckets")
    check(Seq(42L), 10, "single doc")
  }

  test("one value holding 40% of the corpus collapses cutoffs") {
    val values = Seq.fill(40)(100L) ++ (1 to 60).map(i => 100L + i)
    check(values, 10, "heavy head")
  }

  test("all values equal") {
    check(Seq.fill(25)(7L), 10, "constant corpus")
  }

  test("random duplicate-heavy draws match the local oracle") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 5 + rnd.nextInt(300)
      val pool = 1 + rnd.nextInt(12) // small pool → heavy ties
      val values = Seq.fill(n)((rnd.nextInt(pool) + 1).toLong)
      check(values, 10, s"seed=$seed n=$n pool=$pool")
      check(values, 4, s"seed=$seed quartiles")
    }
  }
}
