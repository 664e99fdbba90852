package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate: converts each round's manual finalized-
  * plan audit (the judge's scale review) into enforced invariants, so a
  * future edit that silently degrades a headline plan — a broadcast
  * that becomes a sort-merge join, a pushed filter that stops reaching
  * the scan, an extra exchange sneaking into a dedup pipeline — fails
  * CI instead of surfacing in the next round's bench.
  *
  * Checks per audited query (finalized ADAPTIVE plan at sf0.001, the
  * same condition `Explain --summary` reports):
  *
  *  - NO `CartesianProduct` anywhere, ever (the round-7 audit found
  *    zero data-sized cartesians across all 219 — pinned here);
  *  - `SortMergeJoin` only where the audit justifies it (q_join_full:
  *    full-outer on a data-sized pair cannot broadcast) — everything
  *    else must keep resolving to broadcast-hash (or hashed-shuffle)
  *    joins at dimension-table sizes;
  *  - hash-exchange count stays within a pinned per-query budget
  *    (budgets are the audited r8 counts — a regression that ADDS a
  *    shuffle to these plans must be deliberate and re-pin);
  *  - no `ScalaUDF` in any audited plan (the codegen-span discipline:
  *    the only intentional UDFs live in q_udf_* which are not audited).
  *
  * Plan strings are AQE-finalized: the query is EXECUTED via its own
  * `queryExecution.toRdd` (a derivative action like count() would plan
  * a different tree and leave this one un-finalized — the
  * Explain.scala lesson), then the executedPlan rendered.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private case class Budget(maxExchanges: Int, allowSmj: Boolean = false)

  /** The audited set: the bench's expensive five, TPC-H's heaviest
    * topologies, one representative per major family, and the one
    * justified sort-merge join. Budgets = observed r8 counts. */
  private val audited: Seq[(String, Budget)] = Seq(
    "q_tpch_q1" -> Budget(maxExchanges = 1),
    "q_tpch_q3" -> Budget(maxExchanges = 1),
    "q_tpch_q9" -> Budget(maxExchanges = 2),
    "q_tpch_q21" -> Budget(maxExchanges = 1),
    "q_join_full" -> Budget(maxExchanges = 2, allowSmj = true),
    "q_dedup_minhash_lsh" -> Budget(maxExchanges = 1),
    "q_dedup_containment_capped" -> Budget(maxExchanges = 6),
    "q_dedup_threshold_curve" -> Budget(maxExchanges = 6),
    "q_triangle_count" -> Budget(maxExchanges = 5),
    // r9: OrderedPrefix.rankMulti — the three NTILE(5)s share ONE
    // sampling pass and one exploded bucket-count pass (both bounded
    // intermediates localCheckpoint'd), and the ranks chain instead of
    // assembling through customer joins: 10 observed (was 17); +2
    // reuse-rendering slack
    "q_rfm_segments" -> Budget(maxExchanges = 12),
    "q_corpus_prep" -> Budget(maxExchanges = 5),
    "q_sim_topk" -> Budget(maxExchanges = 0),
    "q_decontaminate_bloom" -> Budget(maxExchanges = 1),
    "q_state_at" -> Budget(maxExchanges = 1),
    // r8 additions: substring dedup must stay hash-aggregated (the
    // min-struct SortAggregate regression is the thing to catch — see
    // the SortAggregate check below); weighted sampling is one scan +
    // TakeOrdered, zero shuffles by design; bm25's 8 + reuse slack
    "q_dedup_substring" -> Budget(maxExchanges = 4),
    "q_dedup_substring_clean" -> Budget(maxExchanges = 6),
    "q_sample_weighted_det" -> Budget(maxExchanges = 0),
    "q_phrase_search" -> Budget(maxExchanges = 0),
    "q_attribution" -> Budget(maxExchanges = 2),
    "q_sample_temperature" -> Budget(maxExchanges = 10),
    "q_bm25" -> Budget(maxExchanges = 9),
    // r9 additions: the curation wave's observed counts (+1 reuse
    // slack on the multi-aggregation plans). q_kcore is iterative —
    // its per-round plans are constant-size by the loopInput
    // checkpoint discipline, which Coverage16Spec pins by equality,
    // so it is not in the static audit.
    "q_vocab_coverage" -> Budget(maxExchanges = 4),
    "q_ngram_novelty" -> Budget(maxExchanges = 6),
    "q_pii_flags" -> Budget(maxExchanges = 1),
    "q_decay_sum" -> Budget(maxExchanges = 3),
    "q_graph_degree_dist" -> Budget(maxExchanges = 5),
    "q_media_flac" -> Budget(maxExchanges = 0),
    "q_media_tiff" -> Budget(maxExchanges = 0),
    "q_win_countd" -> Budget(maxExchanges = 1),
    "q_win_median" -> Budget(maxExchanges = 1),
    "q_cusum_shift" -> Budget(maxExchanges = 4),
    // r9 third wave: session rollup is one session_window shuffle then
    // an AQE-coalesced regroup; conversion lag pays the OrderedPrefix
    // rank machinery (sample + bucket counts + rank) over one-row-per-
    // converted-user — 9 observed + 1 slack; mix drift is four small
    // aggregations (two broadcast) + the per-source re-agg
    "q_session_stats" -> Budget(maxExchanges = 2),
    "q_conversion_lag" -> Budget(maxExchanges = 10),
    "q_source_mix_drift" -> Budget(maxExchanges = 6),
    // graph wave 2 + funnel: triangle-triple consumers pay the edge
    // memo's degree/orient leg aggs (7 and 6 observed + 1 slack);
    // the funnel's three stage aggs + tagged-union regroup (no outer
    // joins — the union+max assembly keeps it SMJ-free by design)
    "q_graph_cluster_coeff" -> Budget(maxExchanges = 8),
    "q_graph_jaccard" -> Budget(maxExchanges = 7),
    "q_funnel_window" -> Budget(maxExchanges = 7),
    // two degree-join legs + the global agg over the memoized edges
    "q_graph_assortativity" -> Budget(maxExchanges = 4),
    // set-pair generation + two support joins + the top-k (6 + 1)
    "q_basket_lift" -> Budget(maxExchanges = 7),
    // one OrderedPrefix rank (events agg reused across all three legs;
    // every SinglePartition exchange is over ≤254 sampled/bucket rows)
    // + the global Σ agg
    "q_user_gini" -> Budget(maxExchanges = 9),
    // r12 statistical wave (observed counts + 1 reuse slack). All
    // post-histogram exchanges carry grid-sized rows (sources×lens,
    // features×buckets×langs); the BNL joins are crossJoin(broadcast(
    // 1-row totals/model)) — bounded by construction. hard_negatives
    // is one scan + broadcast probe + the topk_by partial agg.
    "q_chisq_drift" -> Budget(maxExchanges = 8),
    "q_grid_percentile" -> Budget(maxExchanges = 6),
    "q_tree_stump" -> Budget(maxExchanges = 7),
    "q_tree_classify" -> Budget(maxExchanges = 9),
    "q_hard_negatives" -> Budget(maxExchanges = 3),
    "q_split_leakage_safe" -> Budget(maxExchanges = 5),
    // two corpus passes (root + side-keyed histograms), the rest
    // grid-sized: 11 observed + 1 slack
    "q_tree_depth2" -> Budget(maxExchanges = 12),
    // sqrt-weight table is |sources|-sized (broadcast); the PrefixSum
    // rank machinery pays the rest: 9 observed + 1 slack
    "q_mixture_budget" -> Budget(maxExchanges = 10),
    // the composition flagship: quality cut + LSH/CC label attach
    // (cold plan includes the label pipeline; memoized runs fewer) +
    // budgets + PrefixSum: 18 observed cold + 2 slack
    // r13: the rank-based quality cut replaced the percentile scalar
    // with a grid-sized histogram + cumulative window + cut aggregate
    // (+2 small exchanges, all ≤1e6-cell): 22 observed cold + 2 slack
    "q_corpus_prep_mixed" -> Budget(maxExchanges = 24),
    // r13 hybrid retrieval: the two already-audited legs (BM25
    // postings agg + IVF-SQ8 assign/code/probe/shortlist/re-rank) plus
    // the RRF fuse — union of two ≤20-row lists into ONE hash
    // aggregate (no join: the full-outer formulation would SMJ) and
    // one TakeOrdered: 21 observed + 2 slack
    "q_hybrid_retrieval" -> Budget(maxExchanges = 23),
    // the 3-leg edition adds the phrase leg as one per-row codegen'd
    // pass + TakeOrdered, and r14's per-(doc, leg) MIN contract guard
    // adds one bounded-row agg: 22 observed + 1 slack
    "q_hybrid_retrieval_3way" -> Budget(maxExchanges = 23),
    // r14 per-query fusion: union-vocab BM25 ingredients once + the
    // qid-partitioned rank windows + qid-keyed RRF aggs — every
    // exchange carries matched postings or ≤Σk fused rows: 25 + 2
    "q_hybrid_retrieval_multi" -> Budget(maxExchanges = 27),
    // the eval adds brute-force qrels (one corpus scan, map-side
    // topk_by) + two bounded metric aggs over ≤60 ranked rows: 32 + 2
    "q_retrieval_eval" -> Budget(maxExchanges = 34),
    // r14 true PQ: every exchange carries bounded rows — N×m subvector
    // argmins (min_by partials: one row per subvector, never K scored),
    // m×K codebook aggs, per-query LUT builds, ≤k·refine shortlists.
    // The audited tree is the SEARCH after the assigned/books
    // localCheckpoints (the build fan-out nodes — uncheckpointed, each
    // of the 3 books consumers re-ran the training subtree, 27.8 s →
    // ~3 s at sf0.1): 10 observed + 2 slack
    "q_sim_ann_pq" -> Budget(maxExchanges = 12),
    // r14 second wave: MMR re-rank audits as the post-checkpoint
    // selection tree (candidates/pairs are bounded checkpointed
    // frames; the 4 unrolled argmax steps are grid-sized): 0 observed
    "q_retrieval_mmr" -> Budget(maxExchanges = 2),
    // fused-candidate MMR: same post-checkpoint selection tree (the
    // fused read's own cost is audited as q_hybrid_retrieval_multi)
    "q_hybrid_mmr" -> Budget(maxExchanges = 2),
    // recall curve: ONE probed-candidate scoring pass serves all 3
    // nprobe points (pr carried, filtered per point) + the brute-force
    // leg; exchanges carry probe rows, topk partials, 9 curve rows
    "q_sim_ann_recall_curve" -> Budget(maxExchanges = 13),
    // the funnel re-derives the flagship's stages and left-joins the
    // dispositions back over doc_id — every exchange key-partitioned,
    // output 4 rows; a diagnostic run next to the flagship, not ahead
    // of it: 17 observed + 2 slack
    "q_corpus_funnel" -> Budget(maxExchanges = 19),
    // TVD drift: one corpus-sized histogram agg, grid-sized everything
    // after (the KS/chi-square posture): 7 observed + 1
    "q_drift_tvd" -> Budget(maxExchanges = 8),
    // gap fill: daily agg (checkpointed leaf) + generated spine join +
    // keys×days LOCF window: 4 observed + 1
    "q_resample_locf" -> Budget(maxExchanges = 5),
    // one scan × 4 broadcast dims, map-side topk_by, 40-row overlap
    "q_sim_dim_curve" -> Budget(maxExchanges = 4),
    // cohort agg + join-side agg + the (cohort, age) rollup
    "q_cohort_ltv" -> Budget(maxExchanges = 3),
    // daily agg + bounded lag-join rollup + two 1-row stat aggs; every
    // join side is the broadcast ≤#days daily table
    "q_autocorr" -> Budget(maxExchanges = 6),
    // daily agg + per-lag error rollup; both join sides broadcast
    "q_seasonal_naive" -> Budget(maxExchanges = 5),
    // one user-partitioned window reused by the per-user moment agg
    // (same hash partitioning — no second exchange) + bucket histogram
    "q_burstiness" -> Budget(maxExchanges = 3),
    // digit agg + 1-row total broadcast; no sort anywhere
    "q_benford" -> Budget(maxExchanges = 3),
    // token explode feeds two aggs; cum window is over ≤64 bucket rows
    "q_vocab_growth" -> Budget(maxExchanges = 5),
    // 2-path join + distinct + three per-node aggs over the bounded
    // edge table (memoized checkpoint); top-20 is TakeOrdered
    "q_graph_two_hop" -> Budget(maxExchanges = 8),
    // r10: token frequencies off the trained-BPE vocab checkpoint —
    // one explode + hash agg + TakeOrdered (1 observed + 1 slack).
    // q_bpe_train itself is iterative (k-core posture): per-round
    // plans constant-size by loopInput; Coverage17Spec pins it by
    // reference-equality instead of a static audit.
    "q_bpe_apply" -> Budget(maxExchanges = 2),
    // r10: fertility histogram off the same vocab checkpoint — one
    // projection + hash agg + toks sort (2 observed + 1 slack)
    "q_bpe_fertility" -> Budget(maxExchanges = 3),
    // r10: the last two classic topologies. Q12 is filter-then-one-
    // orderkey-join + hash agg (2 observed + 1 slack); Q20's pair
    // distinct, year agg, pair join and final distinct (4 + 1) — the
    // part/nation dims ride broadcast semis, no SMJ anywhere
    "q_tpch_q12" -> Budget(maxExchanges = 3),
    "q_tpch_q20" -> Budget(maxExchanges = 5),
    // r10: the packed flagship — the redacted-prep chain (quartile
    // broadcast + dedup semi-join + PrefixSum) + the pack hash agg
    "q_corpus_prep_packed" -> Budget(maxExchanges = 9),
    // r10: quality verdict bitmap — per-row integer rules + one hash
    // agg over <= 8 verdict groups
    "q_quality_verdict" -> Budget(maxExchanges = 2),
    // r10: URL canonicalization dedup — per-row regex chain + one
    // hash agg + sort; no joins anywhere
    "q_dedup_urls" -> Budget(maxExchanges = 3),
    // r10: packing ledger — PrefixSum two-phase cumsum (bounded-domain
    // offset window, no key-sized window task) + one hash agg + sort
    "q_pack_sequences" -> Budget(maxExchanges = 7),
    // r11: the per-doc assignment dual (previously shadowed by the
    // ledger's name) — one per-shard window (32 bounded shards) + scan
    "q_pack_assignments" -> Budget(maxExchanges = 2),
    // r10: fingerprint dedups — decode rides mapPartitions (no
    // shuffle); the cost is the band self-join + distinct. Never an
    // all-pairs join: candidates are the band-bucket equi-join.
    "q_dedup_images" -> Budget(maxExchanges = 4),
    "q_dedup_audio" -> Budget(maxExchanges = 4),
    // r11: video fingerprint dedup — decode rides mapPartitions like
    // its image/audio siblings; the cost is the shared band self-join
    "q_dedup_video" -> Budget(maxExchanges = 4),
    // r11: the tokenize splice into the flagship (the PLANS.md
    // attribution table's stated +1): redacted-prep front (quality 1 +
    // dedup 2) + the per-doc BPE token agg (+1, map joins broadcast) +
    // PrefixSum budget 2 + pack agg 1 + output sort 1 = 8 observed
    // (+2 slack)
    "q_corpus_prep_tokenized" -> Budget(maxExchanges = 10),
    // r11: corpus tokenize — word explode + BROADCAST join against the
    // vocab-sized word→tokenization map (no shuffle on the corpus
    // side) + per-doc hash agg + sort (3 observed + 1 slack). The map
    // derivation off the trained checkpoint adds its own tiny agg.
    "q_bpe_tokenize" -> Budget(maxExchanges = 4),
    // r11: byte-fallback accounting — the q_bpe_tokenize shape with a
    // LEFT broadcast join (same corpus-never-shuffles property)
    "q_bpe_tokenize_bytes" -> Budget(maxExchanges = 4),
    // r11: per-source KS drift — ONE corpus-sized exchange (the
    // (source, len) histogram agg); the other ~9 exchanges all carry
    // GRID-sized rows (<= distinct lengths x sources): support-table
    // aggs off h, bounded-domain CDF windows, broadcast corpus CDF,
    // max agg + sort. Exchange COUNT is high, exchange MASS is tiny
    "q_ks_drift" -> Budget(maxExchanges = 13)
  )

  private def finalizedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.toRdd.count()
    // AdaptiveSparkPlan toString renders "Final Plan" AND "Initial
    // Plan" sections — cut at the initial marker or every pre-AQE node
    // (including SMJs that the runtime replaced with broadcasts) counts
    // as if it survived (the Explain.scala lesson).
    val full = df.queryExecution.executedPlan.toString
    full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
  }

  /** Pushdown dimension: for queries whose selectivity lives in scan
    * predicates, the parquet scan must carry non-empty PushedFilters —
    * a filter evaluated post-scan instead reads the whole column set
    * of the whole corpus at 100 TB. */
  // (not q_tpch_q19: its triple-brand predicate matches ZERO rows at
  // sf0.001 and AQE's EmptyRelation propagation erases the scans —
  // nothing left to audit; its OR-extraction pushdown is visible via
  // Explain at sf0.01)
  private val mustPushFilters = Seq("q_tpch_q6", "q_proj_filter", "q_filter_like")

  mustPushFilters.foreach { name =>
    test(s"$name: selective predicates reach the parquet scan") {
      val plan = finalizedPlan(name)
      // plan toString truncates long filter lists ("...", no closing
      // bracket) — only require a non-empty list start
      val pushed = "PushedFilters: \\[(?!\\])[^,\\n]+".r.findAllIn(plan).toList
      assert(pushed.nonEmpty,
        s"$name has no non-empty PushedFilters:\n${plan.take(2000)}")
      info(s"$name: ${pushed.head.take(140)}")
    }
  }

  test("q_tpch_q19: per-side OR-extraction reaches both scans (sf0.01)") {
    // the disjunctive-predicate showcase — Catalyst must extract the
    // per-side disjunctions from the OR-of-ANDs and push them to BOTH
    // scans (l_quantity range union to lineitem, brand/size union to
    // part). Run at sf0.01: at sf0.001 the predicate matches zero rows
    // and AQE's EmptyRelation propagation erases the scans.
    val df = SparkEntry.queries("q_tpch_q19")(spark, "/root/testdata/sf0.01")
    df.queryExecution.toRdd.count()
    val full = df.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    assert("PushedFilters: \\[[^\\n]*l_quantity".r.findAllIn(plan).nonEmpty,
      s"lineitem scan lost the extracted quantity disjunction:\n${plan.take(2000)}")
    assert("PushedFilters: \\[[^\\n]*p_brand".r.findAllIn(plan).nonEmpty,
      s"part scan lost the extracted brand/size disjunction:\n${plan.take(2000)}")
  }

  test("q_dedup_substring: first-occurrence aggregation stays hash-based") {
    // min(struct(doc_id, pos)) is not hash-aggregable and silently
    // degrades the gram-table aggregation to SortAggregate — an
    // external sort of the dominant intermediate. The encoded-long
    // form must keep every aggregate in Hash/ObjectHashAggregate.
    val plan = finalizedPlan("q_dedup_substring")
    assert(!plan.contains("SortAggregate"),
      s"gram aggregation degraded to SortAggregate:\n${plan.take(2000)}")
  }

  audited.foreach { case (name, budget) =>
    test(s"$name: finalized plan within audit budget") {
      val plan = finalizedPlan(name)
      val exchanges = "Exchange (hash|range|SinglePartition)".r
        .findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val cartesian = plan.contains("CartesianProduct")
      val scalaUdf = plan.contains("ScalaUDF")
      info(s"$name: exchanges=$exchanges smj=$smj")
      assert(!cartesian, s"$name grew a CartesianProduct:\n${plan.take(1500)}")
      assert(!scalaUdf, s"$name has a ScalaUDF in the hot path:\n${plan.take(1500)}")
      if (!budget.allowSmj)
        assert(smj == 0,
          s"$name fell back to SortMergeJoin ($smj):\n${plan.take(1500)}")
      assert(exchanges <= budget.maxExchanges,
        s"$name exchange count grew: $exchanges > ${budget.maxExchanges}\n" +
          plan.take(1500))
    }
  }
}
