package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the newest pipeline operators — the oracle
  * gate proves cross-engine agreement; these prove the operators mean
  * what they claim. */
class PipelinePropsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("q_embed_quantize: dequantized values reconstruct within half a quantization step") {
    val q = SparkEntry.queries("q_embed_quantize")(spark, sfDir)
      .select(col("vec_id"), col("scale"), col("q")).as[(Long, Double, String)]
      .collect().map { case (id, sc, qs) => id -> (sc, qs.split(",").map(_.toInt)) }
      .toMap
    val raw = graft.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().toMap
    // the query deliberately excludes all-zero vectors (maxabs = 0)
    val quantizable = raw.filter(_._2.exists(_ != 0f)).keySet
    assert(q.nonEmpty && q.keySet == quantizable)
    q.foreach { case (id, (scale, ints)) =>
      assert(ints.forall(v => v >= -127 && v <= 127), s"vec $id out of int8 range")
      val x = raw(id)
      assert(ints.length == x.length)
      // qᵢ = floor(xᵢ·scale + 0.5) ⇒ |qᵢ/scale − xᵢ| ≤ (0.5 + ε)/scale.
      // scale is the 6-digit ROUNDED output, so allow a matching slack.
      val step = 0.5 / scale + 1e-4
      ints.zip(x).zipWithIndex.foreach { case ((qv, xv), i) =>
        assert(math.abs(qv / scale - xv) <= step,
          s"vec $id dim $i: q=$qv scale=$scale x=$xv")
      }
    }
  }

  test("q_chunk_docs: chunks cover every token, stride 24, full chunks are 32 tokens") {
    val chunks = SparkEntry.queries("q_chunk_docs")(spark, sfDir)
      .select("doc_id", "chunk_idx", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (d, cs) => d -> cs.sortBy(_._2) }
    val docs = graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .as[(Long, Seq[String])].collect().toMap
    assert(chunks.nonEmpty && chunks.keySet == docs.keySet.filter(docs(_).nonEmpty))
    chunks.foreach { case (d, cs) =>
      val w = docs(d)
      // chunk k covers tokens [k*24, k*24+32); the last chunk starts
      // below n, so every token index < n is inside some chunk
      assert(cs.head._2 == 0L)
      assert(cs.map(_._2).toSeq == (0L until cs.length.toLong).toSeq, s"doc $d gaps")
      val lastStart = (cs.length - 1) * 24
      assert(lastStart < w.length && (cs.length) * 24 >= w.length,
        s"doc $d: ${cs.length} chunks for ${w.length} tokens")
      cs.foreach { case (_, k, n, text) =>
        val expect = w.slice(k.toInt * 24, k.toInt * 24 + 32)
        assert(n == expect.length && text == expect.mkString(" "),
          s"doc $d chunk $k mismatch")
      }
    }
  }

  test("q_sample_mixture: empirical keep rates per language track the configured rates") {
    val sf01 = "/root/testdata/sf0.01"
    val kept = SparkEntry.queries("q_sample_mixture")(spark, sf01)
      .groupBy("lang").agg(count(lit(1)).as("k"))
      .as[(String, Long)].collect().toMap
    // null-lang docs are dropped by the operator (both engines), so
    // they are not part of any rate denominator
    val totals = graft.table(spark, sf01, "documents")
      .filter(col("lang").isNotNull)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val rates = Map("en" -> 0.35, "zh" -> 0.95).withDefaultValue(0.80)
    totals.foreach { case (lang, n) =>
      val rate = kept.getOrElse(lang, 0L).toDouble / n
      val want = rates(lang)
      // md5 coin at these corpus sizes: ±3.5σ binomial tolerance
      val tol = 3.5 * math.sqrt(want * (1 - want) / n)
      assert(math.abs(rate - want) <= tol,
        s"$lang: rate $rate vs $want (n=$n, tol $tol)")
    }
  }
}
