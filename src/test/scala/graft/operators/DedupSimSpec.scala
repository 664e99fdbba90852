package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sfDir = "/root/testdata/sf0.001"

  test("shingles: word 3-grams, distinct, short docs dropped") {
    val docs = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val sh = DedupOps.shingles(docs).as[(Long, String)].collect().toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("minhash LSH recovers every exact-Jaccard pair (planted near-dups)") {
    val exact = SparkEntry_jaccard()
    val lsh = graft.SparkEntry.queries("q_dedup_minhash_lsh")(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(exact.subsetOf(lsh), s"missed: ${exact -- lsh}")
  }

  private def SparkEntry_jaccard(): Set[(Long, Long)] =
    graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

  test("simhash: identical docs collide, near-identical docs are close") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words everywhere nothing shared at all here truly"))
      .toDF("doc_id", "text")
    val sig = DedupOps.simhash(docs).as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(2L)) == 0)
    assert(ham(sig(1L), sig(3L)) < ham(sig(1L), sig(4L)))
  }

  test("simhash query finds the planted near-dup pairs found by jaccard") {
    val exact = SparkEntry_jaccard()
    val sim = graft.SparkEntry.queries("q_dedup_simhash")(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val recall = exact.count(sim.contains).toDouble / math.max(1, exact.size)
    assert(recall >= 0.8, s"simhash recall $recall too low")
  }

  test("IVF ANN: high recall vs brute-force top-10") {
    val e = graft.table(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val brute = SimilarityOps.bruteForceTopK(e, q, 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = graft.SparkEntry.queries("q_sim_ann_ivf")(spark, sfDir)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall@10 $recall too low")
  }

  test("connected components: chains collapse to the min-id canonical") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("d1", "d2")
    val cc = DedupOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: empty pair set yields empty labels, no NPE") {
    val pairs = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(DedupOps.connectedComponents(pairs).count() == 0L)
  }

  test("connected components: 30-node chain converges (checkpointed lineage)") {
    // diameter-29 path: single-step min-label propagation needs ~29
    // rounds — catches both a too-small maxIter and lineage blowup
    // (pre-checkpoint, planning time doubled per round)
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("d1", "d2")
    val cc = DedupOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc.size == 30 && cc.values.forall(_ == 1L))
  }

  test("dedup clusters on the corpus match a union-find reference") {
    val pairs = SparkEntry_jaccardPairs()
    val got = graft.SparkEntry.queries("q_dedup_clusters")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    // union-find reference over the same pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
      .map { case (k, _) => k -> find(k) }
    assert(got == expected)
  }

  private def SparkEntry_jaccardPairs(): Seq[(Long, Long)] =
    graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sfDir)
      .select("d1", "d2").as[(Long, Long)].collect().toSeq

  test("rolling hash expression matches the HOF fold formulation") {
    val expr2 = graft.SparkEntry.queries("q_text_rollhash")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val hof = graft.table(spark, sfDir, "documents").select(
      col("doc_id"), expr(TextOps.rollingHashExpr).as("roll_hash"))
      .as[(Long, Long)].collect().toMap
    assert(expr2 == hof)
  }

  test("rolling hash matches a sequential reference implementation") {
    val got = graft.SparkEntry.queries("q_text_rollhash")(spark, sfDir)
      .filter(col("doc_id") < 5).as[(Long, Long)].collect().toMap
    val texts = graft.table(spark, sfDir, "documents")
      .filter(col("doc_id") < 5)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, ch) => math.floorMod(acc * 31 + ch.toInt, 1000000007L))
    texts.foreach { case (id, text) =>
      assert(got(id) == ref(text), s"doc $id")
    }
  }
}
