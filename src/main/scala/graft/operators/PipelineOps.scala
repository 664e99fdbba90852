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
      val cutoff = m.agg(expr("percentile(alpha_ratio, 0.25)")).head().getDouble(0)
      m.filter(col("alpha_ratio") > cutoff)
        .select(col("doc_id"), col("lang"), round(col("alpha_ratio"), 6).as("alpha_ratio"))
    },

    // Deterministic train/validation/test split: pure arithmetic on the
    // id (identical on any engine, stable across runs and partitions —
    // the property random() splits lack).
    QDef("q_train_test_split",
      """SELECT split, COUNT(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
        |         WHEN (doc_id * 2654435761) % 100 < 90 THEN 'valid'
        |         ELSE 'test' END AS split
        |  FROM documents) t
        |GROUP BY split
        |""".stripMargin) { (s, dir) =>
      val bucket = (col("doc_id") * 2654435761L) % 100
      table(s, dir, "documents")
        .select(col("doc_id"),
          when(bucket < 80, "train").when(bucket < 90, "valid")
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
  )
}
