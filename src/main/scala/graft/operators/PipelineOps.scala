package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Dataset-preparation operators (the training-data extension surface
  * declared alongside SURVEY.md §2-B) a training pipeline runs between raw
  * corpus and model input: quality filtering, deterministic train/test
  * splitting, label-distribution statistics, referential integrity
  * checks, and stratified sampling.
  */
object PipelineOps {

  val defs: Seq[QDef] = Seq(

    // Quality filter: keep documents whose alphabetic ratio is above
    // the corpus 25th percentile (scalar subquery over a derived
    // metric — the standard "drop the worst quartile" step).
    QDef("q_quality_filter",
      """WITH m AS (
        |  SELECT doc_id, lang,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS alpha_ratio
        |  FROM documents)
        |SELECT doc_id, lang, round(alpha_ratio, 6) AS alpha_ratio
        |FROM m
        |WHERE alpha_ratio > (SELECT quantile_cont(alpha_ratio, 0.25) FROM m)
        |""".stripMargin) { (s, dir) =>
      val m = table(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
          / length(col("text"))).as("alpha_ratio"))
      // the cutoff rides a 1-row broadcast instead of a driver-side
      // head() round-trip — the whole filter stays one plan
      val cutoff = m.agg(expr("percentile(alpha_ratio, 0.25)").as("_cut"))
      m.crossJoin(broadcast(cutoff)).filter(col("alpha_ratio") > col("_cut"))
        .select(col("doc_id"), col("lang"), round(col("alpha_ratio"), 6).as("alpha_ratio"))
    },

    // Deterministic train/validation/test split: the membership coin is
    // the doc id's md5 hex prefix (identical on any engine, stable
    // across runs and partitions — the property random() splits lack).
    // The md5-prefix idiom (q_sample_stratified_det's) is OVERFLOW-FREE
    // at any id domain; the previous Knuth multiply `id * 2654435761`
    // silently wraps int64 in Spark (non-ANSI) but RAISES in DuckDB for
    // ids ≥ ~3.47e9 — a >3.5B-doc corpus, routine at 100 TB.
    // Thresholds: 8 hex chars span 2³²; 0xCCCCCCCC/2³² = 80%,
    // 0xE6666666/2³² = 90% (lexicographic compare of lowercase hex ==
    // numeric compare of the 32-bit prefix).
    QDef("q_train_test_split",
      """SELECT split, COUNT(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
        |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'valid'
        |         ELSE 'test' END AS split
        |  FROM documents) t
        |GROUP BY split
        |""".stripMargin) { (s, dir) =>
      val bucket =
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8)
      table(s, dir, "documents")
        .select(col("doc_id"),
          when(bucket < "cccccccc", "train").when(bucket < "e6666666", "valid")
            .otherwise("test").as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    },

    // Label distribution + Shannon entropy (class-balance check).
    QDef("q_label_entropy",
      """WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
        |t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c)
        |SELECT round(-SUM((n / total) * ln(n / total)), 6) AS entropy,
        |       COUNT(*) AS n_classes,
        |       min(n) AS min_class, max(n) AS max_class
        |FROM c, t
        |""".stripMargin) { (s, dir) =>
      val c = table(s, dir, "embeddings").groupBy("label")
        .agg(count(lit(1)).as("n"))
      val t = c.agg(sum(col("n")).cast("double").as("total"))
      c.crossJoin(t)
        .agg(round(-sum((col("n") / col("total")) * log(col("n") / col("total"))), 6)
          .as("entropy"),
          count(lit(1)).as("n_classes"),
          min(col("n")).as("min_class"), max(col("n")).as("max_class"))
    },

    // Referential integrity audit: orphaned fact rows per relationship.
    QDef("q_integrity",
      """SELECT 'orders.custkey' AS relationship,
        |  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
        |    (SELECT c_custkey FROM customer)) AS orphans
        |UNION ALL
        |SELECT 'lineitem.orderkey',
        |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders))
        |UNION ALL
        |SELECT 'lineitem.suppkey',
        |  (SELECT COUNT(*) FROM lineitem WHERE l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier))
        |""".stripMargin) { (s, dir) =>
      def orphans(name: String, fact: String, fk: String,
          dim: String, pk: String) = {
        val n = table(s, dir, fact)
          .join(table(s, dir, dim), col(fk) === col(pk), "left_anti")
          .agg(count(lit(1)).as("orphans"))
        n.select(lit(name).as("relationship"), col("orphans"))
      }
      orphans("orders.custkey", "orders", "o_custkey", "customer", "c_custkey")
        .unionByName(orphans("lineitem.orderkey", "lineitem", "l_orderkey",
          "orders", "o_orderkey"))
        .unionByName(orphans("lineitem.suppkey", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"))
    },

    // Stratified sample: ~30% per language. Sampling is seeded but
    // engine-specific → rows-only check; PipelineOpsSpec bounds the
    // per-stratum proportions.
    QDef.noOracle("q_sample_stratified") { (s, dir) =>
      val fractions = table(s, dir, "documents").select("lang").distinct()
        .collect().map(_.getString(0) -> 0.3).toMap
      table(s, dir, "documents")
        .stat.sampleBy("lang", fractions, seed = 42L)
        .select("doc_id", "lang")
    },

    // Deterministic stratified sample: membership = md5(lang:doc_id)
    // below the fraction threshold, compared on the fixed-width hex
    // prefix (uniform, so lexicographic = numeric). This is the
    // scale-correct sampler — seeded sampleBy draws per-row randoms
    // whose assignment shifts with partitioning, while a key-hash
    // filter picks the same rows on any cluster, any engine — which is
    // also why it is fully oracle-checkable.
    QDef("q_sample_stratified_det",
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8) < '4ccccccd'
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .filter(substring(md5(concat_ws(":", col("lang"),
          col("doc_id").cast("string")).cast("binary")), 1, 8) < "4ccccccd")
        .select("doc_id", "lang")
    },

    // Benchmark decontamination: training docs sharing any word 8-gram
    // with the held-out eval sample (doc_id % 10 == 0 — deterministic,
    // engine-independent). The join is keyed on the gram STRING, like
    // the oracle's: a 64-bit-hash key would be cheaper to shuffle but
    // stops being exact once the corpus holds ~2^32 distinct grams
    // (birthday bound — and the hash partitioning routes any colliding
    // pair into the same bucket by construction), which is squarely
    // inside the 100 TB design point. The bloom variant
    // (q_decontaminate_bloom) shows where hashes DO belong: as a
    // scan-side prefilter whose false positives the string join then
    // removes. At 100 TB the eval side is tiny and broadcasts.
    QDef("q_decontaminate",
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |f AS (SELECT doc_id, w FROM toks WHERE len(w) >= 8),
        |idx AS (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM f),
        |g AS (SELECT DISTINCT doc_id,
        |        w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
        |        w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] AS g
        |      FROM idx WHERE i <= len(w) - 7),
        |ev AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id AS train_id, g FROM g WHERE doc_id % 10 <> 0)
        |SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS shared_ngrams
        |FROM tr JOIN ev USING (g) GROUP BY 1, 2
        |""".stripMargin) { (s, dir) =>
      val grams = table(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(w) - 8), i -> concat_ws(' ', " +
            (0 until 8).map(k => s"w[i + $k]").mkString(", ") + "))"
        ))).as("g"))
      val ev = grams.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("eval_id"), col("g"))
      val tr = grams.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("train_id"), col("g"))
      // No broadcast hint: a REAL eval suite is tiny and AQE will
      // broadcast it from stats, but this demo slices 10% of the corpus
      // as "eval" — forcing that side to broadcast would collect a
      // corpus-proportional gram set at 100 TB. The string-keyed shuffle
      // join is the shape that holds at any eval-set size.
      tr.join(ev, "g")
        .groupBy("train_id", "eval_id")
        .agg(count(lit(1)).as("shared_ngrams"))
    },

    // Sequence packing, per-doc ASSIGNMENT view: greedy token-budget
    // binning of documents into training sequences. Docs are sharded
    // (doc_id % 32 — hundreds of independent shards at scale, so the
    // running sum parallelizes) and packed in id order within each
    // shard: seq_no = floor(prior tokens / budget). The
    // streaming-greedy shape every packing pipeline uses — a doc can
    // straddle a boundary, which real packers handle by splitting at
    // the consumer. (The per-(source, pack) LEDGER view is
    // q_pack_sequences in Coverage17; this row — previously shadowed
    // by that name collision — is the doc-grain dual the streaming
    // twin IncrementalPack reproduces.)
    QDef("q_pack_assignments",
      """WITH d AS (
        |  SELECT doc_id, doc_id % 32 AS shard,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(floor(coalesce(sum(n_tokens) OVER (
        |    PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048) AS BIGINT)
        |    AS seq_no
        |FROM d
        |""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = table(s, dir, "documents").select(
        col("doc_id"), (col("doc_id") % 32).as("shard"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      d.select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / 2048)
          .cast("long").as("seq_no"))
    },

    // Training-mixture sampling: per-language keep rates (downsample the
    // dominant language, keep low-resource ones) applied with the same
    // deterministic md5-prefix coin as q_sample_stratified_det — the
    // thresholds are rate·2^32 as 8 hex digits, the coin is a pure
    // function of (lang, doc_id), so the sample is reproducible on any
    // partitioning and any engine. Plan: a codegen'd filter on the
    // scan, no shuffle — the mixture costs one pass at any scale.
    QDef("q_sample_mixture",
      """SELECT doc_id, lang FROM documents
        |WHERE lang IS NOT NULL
        |  AND substring(md5('mix:' || lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8) <
        |  CASE lang WHEN 'en' THEN '59999999' WHEN 'zh' THEN 'f3333333'
        |    ELSE 'cccccccc' END
        |""".stripMargin) { (s, dir) =>
      // lang IS NOT NULL is explicit on BOTH sides: DuckDB's `||`
      // propagates NULL (excluding the row) while Spark's concat_ws
      // skips null args — without the guard the two engines would
      // sample null-lang rows differently.
      table(s, dir, "documents")
        .filter(col("lang").isNotNull &&
          substring(md5(concat_ws(":", lit("mix"), col("lang"),
            col("doc_id").cast("string")).cast("binary")), 1, 8) <
          when(col("lang") === "en", "59999999")
            .when(col("lang") === "zh", "f3333333")
            .otherwise("cccccccc"))
        .select("doc_id", "lang")
    },

    // Symmetric int8 quantization of the embedding column (the storage/
    // bandwidth prep step before ANN serving): per-vector scale =
    // 127/max|xᵢ|, qᵢ = floor(xᵢ·scale + 0.5). floor(x+0.5) instead of
    // round(): floor of a double is exact in every engine, while
    // half-even/half-up conventions differ. max|xᵢ| and the division
    // are order-independent IEEE ops, so the quantized bytes are
    // engine-identical. Per-row expressions only — no shuffle.
    QDef("q_embed_quantize",
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        |  FROM embeddings)
        |SELECT vec_id, round(127.0 / maxabs, 6) AS scale,
        |  array_to_string(list_transform(embedding,
        |    x -> CAST(CAST(floor(CAST(x AS DOUBLE) * (127.0 / maxabs) + 0.5) AS BIGINT)
        |      AS VARCHAR)), ',') AS q
        |FROM m WHERE maxabs > 0
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "embeddings")
        .withColumn("maxabs", expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))"))
        .filter(col("maxabs") > 0)
        .withColumn("sc", lit(127.0) / col("maxabs"))
        .select(col("vec_id"), round(col("sc"), 6).as("scale"),
          array_join(expr(
            "transform(embedding, x -> CAST(CAST(floor(CAST(x AS DOUBLE) * sc + 0.5D) AS BIGINT) AS STRING))"),
            ",").as("q"))
    },
  )
}
