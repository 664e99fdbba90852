package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Coverage17 — BPE training loop. Independent brute-force derivation
  * (the Coverage16Spec pattern): a driver-side reference BPE trainer
  * over the collected word list must reproduce the distributed loop's
  * merge table exactly, and the learned tokenization must round-trip
  * (concat of a word's tokens == the word, for every vocab word). */
class Coverage17Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  /** Reference BPE: greedy leftmost non-overlapping merge application,
    * top pair by (count DESC, "a|b" ASC) — the exact contract the
    * distributed loop and the DuckDB oracle implement. */
  private def refBpe(freq: Map[String, Long], n: Int)
      : (Seq[(Long, String, String, Long)], Map[Seq[String], Long]) = {
    var vocab: Map[Seq[String], Long] =
      freq.map { case (w, c) => w.map(_.toString) -> c }
    val merges = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    (1 to n).foreach { step =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.lazyZip(syms.drop(1)).foreach { (a, b) =>
          counts((a, b)) = counts.getOrElse((a, b), 0L) + c
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.toSeq
          .sortBy { case ((x, y), c) => (-c, s"$x|$y") }.head
        merges += ((step.toLong, a, b, cnt))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toSeq
        }(_._2)(_ + _)
      }
    }
    (merges.toSeq, vocab)
  }

  private def wordFreqs: Map[String, Long] =
    graft.table(spark, sfDir, "documents")
      .selectExpr("explode(split(lower(trim(text)), ' ')) AS w")
      .filter($"w".rlike("^[a-z]{2,}$"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap

  test("the distributed training loop reproduces the reference BPE " +
      "merge table exactly") {
    val (refMerges, _) = refBpe(wordFreqs, Coverage17.BpeN)
    val (got, _) = Coverage17.trainBpe(spark, sfDir)
    assert(got == refMerges, s"\ngot      $got\nexpected $refMerges")
    // later rounds must have merged MERGED symbols at least once on
    // this corpus, or the loop never exercised the recursive case
    assert(refMerges.exists { case (_, a, b, _) =>
      a.length > 1 || b.length > 1 }, refMerges)
  }

  test("the learned tokenization round-trips: concat(tokens) == word, " +
      "and the final vocab state matches the reference") {
    val (_, refVocab) = refBpe(wordFreqs, Coverage17.BpeN)
    val (_, vocab) = Coverage17.trainBpe(spark, sfDir)
    val got = vocab
      .selectExpr("split(substring(w, 2, length(w) - 2), '\\\\)\\\\(') AS toks",
        "freq")
      .as[(Seq[String], Long)].collect()
    // round-trip: every tokenized word reassembles to a corpus word
    val words = wordFreqs
    got.foreach { case (toks, freq) =>
      val word = toks.mkString
      assert(words.contains(word), s"tokens $toks rebuild '$word', not a corpus word")
      assert(toks.forall(_.nonEmpty))
    }
    // and the full (tokens -> freq) state equals the reference's
    val gotState = got.groupMapReduce(_._1)(_._2)(_ + _)
    assert(gotState == refVocab,
      s"\ngot      ${gotState.toSeq.sortBy(_._1.mkString)}" +
        s"\nexpected ${refVocab.toSeq.sortBy(_._1.mkString)}")
  }

  test("q_bpe_tokenize round-trips against q_bpe_apply's frequencies: " +
      "doc-level token totals equal the vocab-level totals") {
    val byName = Coverage17.defs.map(d => d.name -> d.fn).toMap
    val docs = byName("q_bpe_tokenize")(spark, sfDir)
      .selectExpr("CAST(sum(n_words) AS BIGINT)",
        "CAST(sum(n_tokens) AS BIGINT)")
      .as[(Long, Long)].head()
    // the vocab side: Σ freq (word occurrences) and Σ freq·|tokens|
    val (_, vocab) = Coverage17.trainBpe(spark, sfDir)
    val fromVocab = vocab
      .selectExpr(
        "CAST(sum(freq) AS BIGINT)",
        "CAST(sum(freq * size(split(substring(w, 2, length(w) - 2), " +
          "'\\\\)\\\\('))) AS BIGINT)")
      .as[(Long, Long)].head()
    assert(docs == fromVocab,
      s"doc-level $docs != vocab-level $fromVocab — the broadcast " +
        "word→tokenization join dropped or double-counted words")
    // and the per-doc view is total over the filtered words: every
    // trainable word of every doc is tokenized (inner join lost none)
    val filteredWords = graft.table(spark, sfDir, "documents")
      .selectExpr("explode(split(lower(trim(text)), ' ')) AS w")
      .filter($"w".rlike("^[a-z]{2,}$")).count()
    assert(docs._1 == filteredWords)
  }
}
