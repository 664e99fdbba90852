package graft.operators

import graft._
import graft.functions.{FreqSketch, TopKBy, VecSum, VectorOps}
import org.apache.spark.sql.functions._

/** Round-5 coverage: driver-visible queries for the two round-4
  * headline components that previously lived at operator+spec level
  * only — the Misra-Gries `freq_sketch` aggregate (as the candidate
  * stage of a sketch→exact-confirm heavy-hitter pipeline) and the
  * k-means-trained IVF index (as a fully-lazy one-Lloyd-step train +
  * assign + probe search).
  *
  * Both reuse the "approximate structure, exact output" trick that
  * q_decontaminate_bloom established: the approximate component only
  * PREFILTERS or PLACES data, and an exact verification stage makes
  * the final rows bit-identical to a deterministic oracle — so the
  * driver hash-compares what is structurally a sketch/ANN plan.
  */
object Coverage5 {

  val defs: Seq[QDef] = Seq(

    // Heavy hitters via the bounded-memory sketch: freq_sketch(term,
    // 2000) nominates candidates, one broadcast semi-join computes
    // their EXACT counts, and the exact 0.1% threshold filters — the
    // output equals q_heavy_hitters row-for-row by the Misra-Gries
    // guarantee (every term with true count > N/(k+1) survives the
    // sketch, and the threshold N/1000 > N/2001 for every N ≥ 1), so
    // the oracle SQL is shared verbatim. The 100 TB shape this pins:
    // the full-stream groupBy shuffles every distinct term (unbounded
    // key space); the sketch pass shuffles ONE ≤2000-entry buffer per
    // map partition, and the exact pass only aggregates the ≤2000
    // nominated terms (broadcast semi-join at the scan).
    QDef("q_heavy_hitters_sketch",
      Coverage4.heavyHittersOracleSql) { (s, dir) =>
      FreqSketch.register(s)
      val toks = table(s, dir, "documents")
        .select(explode(split(trim(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
      // candidate nomination: a single global Misra-Gries buffer
      val cand = toks
        .agg(call_function("freq_sketch", col("term"), lit(2000)).as("sk"))
        .select(explode(expr("sk.term")).as("term"))
      // exact confirm: count ONLY the nominated terms...
      val exact = toks.join(broadcast(cand), "term")
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      // ...against the exact total of the whole stream (1 row)
      val total = toks.agg(count(lit(1)).as("total"))
      exact.crossJoin(broadcast(total))
        .filter(col("cnt") * 1000 >= col("total"))
        .select(col("term"), col("cnt"))
    },

    // ANN over a k-means-TRAINED IVF index: one Lloyd step moves the
    // deterministic %97 seed centroids to the data's density (the
    // vec_sum vector aggregate — k×dim buffers cross the exchange,
    // never N×dim exploded rows; means rounded to 6, the engine's
    // determinism convention), every vector is re-assigned to its
    // nearest trained centroid, and the standard probe search runs on
    // the trained buckets. Fully lazy (no driver-side collect — the
    // iterative trainer KMeansOps.lloyd collects its bounded k×dim
    // centroid table between steps; a single unrolled step doesn't
    // need to) and fully deterministic, so DuckDB recomputes train +
    // assign + probe + search exactly. Seeds that lose every member
    // keep their seed position (left join + coalesce — same rule as
    // the trainer).
    QDef("q_sim_ann_ivf_trained",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0),
        |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |ax AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS a, unnest(c.cv) AS b
        |       FROM embeddings e CROSS JOIN c),
        |ad AS (SELECT vec_id, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM ax GROUP BY 1, 2),
        |asg AS (SELECT vec_id, cid,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id
        |            ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid) AS rn
        |        FROM ad),
        |a0 AS (SELECT vec_id, cid AS centroid_id FROM asg WHERE rn = 1),
        |comp AS (SELECT a0.centroid_id, generate_subscripts(e.embedding, 1) AS pos,
        |                unnest(e.embedding) AS v
        |         FROM a0 JOIN embeddings e ON e.vec_id = a0.vec_id),
        |m AS (SELECT centroid_id, pos, round(sum(CAST(v AS DOUBLE)) / count(*), 6) AS mean
        |      FROM comp GROUP BY 1, 2),
        |upd AS (SELECT centroid_id AS cid, list(mean ORDER BY pos) AS cv1 FROM m GROUP BY 1),
        |tc AS (SELECT c.cid, coalesce(upd.cv1, CAST(c.cv AS DOUBLE[])) AS cv
        |       FROM c LEFT JOIN upd USING (cid)),
        |px AS (SELECT q.qid, t.cid, unnest(q.qv) AS a, unnest(t.cv) AS b
        |       FROM q CROSS JOIN tc t),
        |pd AS (SELECT qid, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM px GROUP BY 1, 2),
        |probes AS (SELECT qid, cid FROM (
        |    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid) AS pr
        |    FROM pd) WHERE pr <= 8),
        |bx AS (SELECT e.vec_id, t.cid, unnest(e.embedding) AS a, unnest(t.cv) AS b
        |       FROM embeddings e CROSS JOIN tc t),
        |bd AS (SELECT vec_id, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM bx GROUP BY 1, 2),
        |bsg AS (SELECT vec_id, cid,
        |          ROW_NUMBER() OVER (PARTITION BY vec_id
        |            ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid) AS rn
        |        FROM bd),
        |a1 AS (SELECT vec_id, cid AS centroid_id FROM bsg WHERE rn = 1),
        |cand AS (SELECT p.qid, a.vec_id FROM probes p
        |         JOIN a1 a ON a.centroid_id = p.cid WHERE a.vec_id <> p.qid),
        |cx AS (SELECT cand.qid, cand.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
        |       FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
        |       JOIN q ON q.qid = cand.qid),
        |cd AS (SELECT qid, vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM cx GROUP BY 1, 2),
        |sc AS (SELECT qid, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos FROM cd),
        |r AS (SELECT qid, vec_id, cos,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rn
        |      FROM sc)
        |SELECT qid, vec_id, cos, rn FROM r WHERE rn <= 10
        |""".stripMargin) { (s, dir) =>
      VectorOps.ensure(s)
      TopKBy.register(s)
      VecSum.register(s)
      val e = table(s, dir, "embeddings")
      val seeds = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      // one Lloyd step, unrolled and lazy
      val updated = SimilarityOps.ivfAssign(e, 97)
        .groupBy(col("centroid_id"))
        .agg(call_function("vec_sum", col("embedding")).as("vsum"),
          count(lit(1)).as("n"))
        .select(col("centroid_id").as("cid"),
          expr("transform(vsum, x -> round(x / n, 6))").as("cv1"))
      val trained = seeds
        .select(col("cid"), col("cv").cast("array<double>").as("cv0"))
        .join(updated, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cv1"), col("cv0")).as("cv"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      SimilarityOps.ivfSearch(
        SimilarityOps.ivfAssignTo(e, trained), trained, q, 10, 8)
    },

    // Cohort retention triangle: users grouped by first-activity day,
    // distinct-user counts per (cohort, days-since) cell. Three keyed
    // aggregations and one user-keyed join — every exchange carries
    // (user, day) pairs or post-aggregation counts, never raw events,
    // and the first-day aggregate partial-combines map-side. The
    // classic product-analytics operator the event surface was missing.
    QDef("q_retention",
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |first AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
        |SELECT f.cohort_day, a.day - f.cohort_day AS days_since,
        |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM act a JOIN first f USING (user_id)
        |GROUP BY 1, 2
        |""".stripMargin) { (s, dir) =>
      val act = table(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val first = act.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      act.join(first, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("days_since"))
        .agg(count_distinct(col("user_id")).as("n_users"))
    },

    // Heavy-hitter co-occurrence lift: document-frequency lift
    // n_ab·N / (n_a·n_b) for every pair of 0.1%-of-stream terms that
    // share a document (lift > 1 ⇒ the pair co-occurs more than
    // independence predicts — PMI's argument without the cross-engine
    // transcendental: all counts are exact integers and the single
    // division is one correctly-rounded IEEE op). The 100 TB shape:
    // the candidate vocabulary is the bounded heavy-hitter set (≤1000
    // terms by construction), broadcast to the scan, so the incidence
    // explode and the per-document pair join are bounded by |H|, not
    // by the corpus vocabulary.
    QDef("q_cooccur_lift",
      """WITH toks AS (
        |  SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents),
        |t AS (SELECT term, count(*) AS cnt FROM toks WHERE term <> '' GROUP BY 1),
        |n AS (SELECT sum(cnt) AS total FROM t),
        |hh AS (SELECT term FROM t, n WHERE cnt * 1000 >= total),
        |inc AS (SELECT DISTINCT u.doc_id, u.term
        |        FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        |              FROM documents) u
        |        JOIN hh ON hh.term = u.term),
        |df AS (SELECT term, count(*) AS n_t FROM inc GROUP BY 1),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |pairs AS (SELECT a.term AS t1, b.term AS t2, count(*) AS n_ab
        |          FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.term < b.term
        |          GROUP BY 1, 2)
        |SELECT t1, t2, CAST(n_ab AS BIGINT) AS n_ab,
        |       round(CAST(n_ab * n_docs AS DOUBLE) / (d1.n_t * d2.n_t), 6) AS lift
        |FROM pairs JOIN df d1 ON d1.term = t1 JOIN df d2 ON d2.term = t2
        |CROSS JOIN nd
        |""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val toks = docs
        .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
      val counts = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      val hh = counts.crossJoin(broadcast(total))
        .filter(col("cnt") * 1000 >= col("total")).select("term")
      val inc = toks.join(broadcast(hh), "term").distinct()
      val df = inc.groupBy("term").agg(count(lit(1)).as("n_t"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val pairs = inc.as("a")
        .join(inc.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
        .groupBy(col("a.term").as("t1"), col("b.term").as("t2"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(df.select(col("term").as("t1"), col("n_t").as("n1"))), "t1")
        .join(broadcast(df.select(col("term").as("t2"), col("n_t").as("n2"))), "t2")
        .crossJoin(broadcast(nDocs))
        .select(col("t1"), col("t2"), col("n_ab"),
          round((col("n_ab") * col("n_docs")).cast("double") /
            (col("n1") * col("n2")), 6).as("lift"))
    },

    // Robust outlier flagging via median absolute deviation — the
    // heavy-tail-safe dual of q_anomaly_zscore (a single extreme value
    // drags a mean/stddev fence, but not a median/MAD one). Two grouped
    // percentile passes (median, then median of |v − m|) and one
    // broadcast-back join; per-group state is two scalars, so the
    // flagging scan is a broadcast hash join at any corpus size. The
    // 1.4826 factor scales MAD to σ under normality — the conventional
    // robust z. Percentile parity across engines is already pinned by
    // q_agg_percentiles (Spark `percentile` == DuckDB `quantile_cont`).
    QDef("q_anomaly_mad",
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS m
        |  FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type, med.m,
        |         quantile_cont(abs(e.value - med.m), 0.5) AS mad
        |  FROM events e JOIN med USING (event_type) GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - mad.m) / (1.4826 * mad.mad), 6) AS rz
        |FROM events e JOIN mad USING (event_type)
        |WHERE abs(round((e.value - mad.m) / (1.4826 * mad.mad), 6)) > 3.5
        |""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("m"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy(col("event_type"), col("m"))
        .agg(expr("percentile(abs(value - m), 0.5)").as("mad"))
      val rz = round((col("value") - col("m")) / (lit(1.4826) * col("mad")), 6)
      ev.join(broadcast(mad), "event_type")
        .withColumn("rz", rz)
        .filter(abs(col("rz")) > 3.5)
        .select(col("event_id"), col("event_type"), col("value"), col("rz"))
    },

    // Asymmetric containment dedup: |A∩B| / min(|A|,|B|) ≥ 0.9 flags a
    // document whose shingle set is (almost) a SUBSET of another's —
    // the truncation/quotation duplicates Jaccard structurally misses
    // (a 50-shingle doc inside a 500-shingle doc has Jaccard ≤ 0.1 but
    // containment 1.0). Shares the shingle-hash-keyed join shape with
    // q_dedup_ngram_jaccard and, like it, is the documented ORACLE
    // ANCHOR: MinHash-LSH approximates Jaccard, not containment, so the
    // scale path for containment is the same banded join run over
    // size-stratified shingle SAMPLES of the larger side — out of scope
    // here; the anchor pins the semantics the sampled variant must hit.
    QDef("q_dedup_containment",
      s"""WITH ${DedupOps.shingleOracleCtes}
        |SELECT d1, d2,
        |       round(CAST(inter AS DOUBLE) / least(s1.n, s2.n), 6) AS containment
        |FROM pairs JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
        |WHERE round(CAST(inter AS DOUBLE) / least(s1.n, s2.n), 6) >= 0.9
        |""".stripMargin) { (s, dir) =>
      DedupOps.containmentPairs(
        DedupOps.shingles(table(s, dir, "documents"))
          .select(col("doc_id"), xxhash64(col("shingle")).as("shingle")), 0.9)
    },

    // Salted two-phase aggregation, driver-visible: aggregate on
    // (key, salt) first — spreading any hot key over `buckets` reducers
    // — then merge the partials. Decimal accumulation makes the result
    // BIT-IDENTICAL to the direct aggregation on any partitioning (so
    // the oracle is the plain GROUP BY), which is the whole point: the
    // skew tool changes the exchange layout, never the answer. This is
    // the explicit fix for the one skew case AQE can't split — a single
    // key whose aggregation state exceeds one reducer.
    QDef("q_agg_salted",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      Skew.saltedAgg(table(s, dir, "lineitem"),
          "l_returnflag", dec(col("l_quantity")), col("l_orderkey"), 16)
        .select(col("l_returnflag"),
          col("sum_value").cast("double").as("sum_qty"), col("n"))
    },

    // Salted replicated-dimension join, driver-visible: the fact side
    // takes a deterministic salt, the (small) dimension is exploded
    // once per salt value, and the join key becomes (key, salt) — a hot
    // key's rows spread over `buckets` join tasks instead of one.
    // Row-identical to the plain join (oracle = plain join + GROUP BY);
    // the replication factor costs buckets × |dim|, which is the trade
    // the technique is FOR when the dim is broadcast-small.
    QDef("q_join_salted",
      """SELECT n.n_name,
        |  CAST(count(*) AS BIGINT) AS n_suppliers,
        |  CAST(SUM(CAST(s.s_acctbal AS DECIMAL(38,10))) AS DOUBLE) AS total_bal
        |FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        |GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val fact = table(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_acctbal"),
          col("s_nationkey").as("nationkey"))
      val dim = table(s, dir, "nation")
        .select(col("n_nationkey").as("nationkey"), col("n_name"))
      Skew.saltedBroadcastJoin(fact, dim, "nationkey", col("s_suppkey"), 8)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_suppliers"),
          sumExact(col("s_acctbal")).as("total_bal"))
    },
  )
}
