package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The persisted IVF index must return exactly what the inline
  * assign+search pipeline returns, survive reopening from disk, and —
  * the reason it exists — prune unprobed buckets at the FILE level. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val Modulus = 97

  private def queries = graft.table(spark, sfDir, "embeddings")
    .filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  test("persisted index search == inline ivfAssign+ivfSearch; reopen is identical") {
    val corpus = graft.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val dir = Files.createTempDirectory("ivf-idx").toString
    val idx = IvfIndex.build(corpus, dir, Modulus)

    val inline = {
      val assigned = SimilarityOps.ivfAssign(corpus, Modulus)
      val cents = corpus.filter(col("vec_id") % Modulus === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      SimilarityOps.ivfSearch(assigned, cents, queries, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    }
    val persisted = idx.search(queries, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(persisted == inline)
    assert(persisted.nonEmpty)

    val reopened = new IvfIndex(spark, dir).search(queries, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(reopened == persisted)
  }

  test("probing reads only the probed centroid_id partitions (file-level pruning)") {
    val corpus = graft.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val dir = Files.createTempDirectory("ivf-prune").toString
    val idx = IvfIndex.build(corpus, dir, Modulus)
    val allBuckets = new java.io.File(s"$dir/assigned").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(allBuckets.nonEmpty && allBuckets.forall(_.startsWith("centroid_id=")))

    // the load-bearing check: the centroid_id filter search() applies
    // becomes a PARTITION filter on the scan (file-level pruning), not
    // a data filter over a full read
    val someCid = allBuckets.head.stripPrefix("centroid_id=").toLong
    val scan = idx.assigned.filter(col("centroid_id") === someCid)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scan.nonEmpty)
    assert(scan.head.partitionFilters.nonEmpty,
      s"centroid_id filter did not become a partition filter: ${scan.head}")
  }

  test("trained index: search == inline search over the lloyd assignment") {
    val corpus = graft.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val dir = Files.createTempDirectory("ivf-trained").toString
    val idx = IvfIndex.buildTrained(corpus, dir, Modulus, iters = 2)

    val inline = {
      val (cents, assigned) = KMeansOps.lloyd(corpus, Modulus, 2)
      SimilarityOps.ivfSearch(assigned, cents, queries, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    }
    val persisted = idx.search(queries, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(persisted == inline)
    assert(persisted.nonEmpty)
  }
}
