package graft.streaming

import graft.operators.{HybridRetrieval, IvfIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hybrid (lexical ⊕ vector) retrieval over the STREAM-MAINTAINED
  * indexes: the continuous-ingestion read path of q_hybrid_retrieval.
  * The lexical leg is [[IncrementalPostings.search]] (BM25 over the
  * term-bucket-pruned postings tree, tombstones applied, corpus stats
  * from the per-batch rows); the vector leg is
  * [[graft.operators.IvfIndex.searchSq8]] over the
  * [[IncrementalIvf]]-maintained PQ layout (probed centroid_id
  * partitions, int8 codes, exact re-rank); the fusion is
  * [[graft.operators.HybridRetrieval.fuse]] — the SAME integer RRF the
  * batch query runs, so stream==batch is one formula.
  *
  * Equality contract (IncrementalHybridSpec): after ingesting a corpus
  * in ANY micro-batch split, the fused top-k equals the one-shot batch
  * fusion over the same corpus — both legs are batch-split-invariant
  * by their own contracts (BM25 ingredients are per-doc/corpus sums;
  * IVF assignment is per-vector against fixed centroids), and fusion
  * is a deterministic function of the two rankings. TAKEDOWN PARITY:
  * tombstoning a document in both indexes (the compliance pass a
  * training corpus runs) makes the fused read equal a batch fusion
  * over the reduced corpus — each leg already proves its own takedown
  * parity; this pins the composition.
  */
object IncrementalHybrid {

  /** [[HybridRetrieval.fuse]]/[[HybridRetrieval.fuseN]] aggregate on
    * doc_id alone, so their legs must come from ONE query — a
    * multi-row queries frame would silently collapse per-query
    * rankings into doc-level best-rank (r13 advice). Multi-query reads
    * go through [[searchMulti]]. */
  private def requireSingleQuery(queries: DataFrame): Unit =
    require(queries.limit(2).count() == 1,
      "single-query fusion needs exactly one (qid, qv) row — " +
        "use searchMulti for a queries batch")

  /** Fused top-k over the two maintained indexes. `queries` is the
    * ANN leg's single-row (qid, qv) frame; `terms` the lexical query.
    * Leg depths and probe parameters mirror q_hybrid_retrieval's
    * defaults. */
  def search(spark: SparkSession, postingsDir: String, ivfDir: String,
      terms: Seq[String], queries: DataFrame, k: Int,
      kLex: Int = 20, kAnn: Int = 20, nprobe: Int = 8, refine: Int = 3)
      : DataFrame = {
    requireSingleQuery(queries)
    val lex = IncrementalPostings.search(spark, postingsDir, terms, kLex)
      .select(col("doc_id"), col("rnk").as("lex_rnk"))
    val ann = new IvfIndex(spark, ivfDir).searchSq8(queries, kAnn, nprobe, refine)
      .select(col("vec_id").as("doc_id"), col("rn").as("ann_rnk"))
    HybridRetrieval.fuse(lex, ann, k)
  }

  /** PER-QUERY fused read over the maintained indexes (the eval-batch
    * shape, q_hybrid_retrieval_multi's streaming twin): each entry of
    * `termsByQid` is one query's keyword vocabulary, `queries` the
    * matching (qid, qv) vector frame; the lexical leg runs one
    * term-bucket-pruned search per query (bounded — queries are a
    * driver-known batch), the ANN leg is the per-qid quantized search
    * unchanged, and the fusion is qid-keyed
    * [[HybridRetrieval.fuseByQuery]]. Returns (qid, doc_id, n_legs,
    * rrf_fp, rnk ≤ k). */
  def searchMulti(spark: SparkSession, postingsDir: String, ivfDir: String,
      termsByQid: Seq[(Long, Seq[String])], queries: DataFrame, k: Int,
      kLeg: Int = 20, nprobe: Int = 8, refine: Int = 3): DataFrame = {
    require(termsByQid.nonEmpty, "at least one keyword query")
    val lex = termsByQid.map { case (qid, terms) =>
      IncrementalPostings.search(spark, postingsDir, terms, kLeg)
        .select(lit(qid).as("qid"), col("doc_id"), col("rnk"))
    }.reduce(_.unionByName(_))
    val ann = new IvfIndex(spark, ivfDir).searchSq8(queries, kLeg, nprobe, refine)
      .select(col("qid"), col("vec_id").as("doc_id"), col("rn").as("rnk"))
    HybridRetrieval.fuseByQuery(Seq(lex, ann), k)
  }

  /** THREE-leg fused read (q_hybrid_retrieval_3way's streaming twin):
    * BM25 ⊕ exact-phrase ⊕ ANN, all three legs served by the
    * maintained indexes — the phrase leg rides the SAME positional
    * postings tree as the BM25 leg (one index, two ranking functions),
    * so a takedown applies to all three legs at once. Fusion is
    * [[graft.operators.HybridRetrieval.fuseN]]. */
  def search3(spark: SparkSession, postingsDir: String, ivfDir: String,
      terms: Seq[String], phrase: Seq[String], queries: DataFrame, k: Int,
      kLeg: Int = 20, nprobe: Int = 8, refine: Int = 3): DataFrame = {
    requireSingleQuery(queries)
    val lex = IncrementalPostings.search(spark, postingsDir, terms, kLeg)
      .select(col("doc_id"), col("rnk"))
    val phr = IncrementalPostings
      .phraseSearch(spark, postingsDir, phrase, kLeg)
      .select(col("doc_id"), col("rnk"))
    val ann = new IvfIndex(spark, ivfDir).searchSq8(queries, kLeg, nprobe, refine)
      .select(col("vec_id").as("doc_id"), col("rn").as("rnk"))
    HybridRetrieval.fuseN(Seq(lex, phr, ann), k)
  }

  /** Take a document down from BOTH halves of the hybrid read in one
    * call — the compliance pass (text tombstones via
    * [[IncrementalPostings.delete]], vector tombstones via
    * [[graft.operators.IvfIndex.delete]]; physical removal rides each
    * index's own consolidate). vec_id == doc_id is the id-domain
    * contract the fusion itself relies on. */
  def takedown(spark: SparkSession, postingsDir: String, ivfDir: String,
      docIds: Seq[Long], deleteId: Long): Unit = {
    IncrementalPostings.delete(spark, postingsDir, docIds, deleteId)
    new IvfIndex(spark, ivfDir).delete(docIds, deleteId)
  }
}
