package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-oriented triangle counting — the standard distributed-join
  * mitigation for dense graphs (Schank's forward algorithm; the
  * MapReduce formulation is Suri & Vassilvitskii's partition trick's
  * sibling): orient every undirected edge toward its higher-degree
  * endpoint under the TOTAL order (degree, id), then enumerate each
  * triangle exactly once as an oriented 2-path `a→b→c` closed by the
  * oriented edge `a→c`.
  *
  * Why it scales: under degree orientation every vertex's out-degree is
  * O(√m) (a vertex with out-degree d has d neighbors of degree ≥ its
  * own, so d² ≤ Σdeg = 2m), which caps the 2-path stage — the only
  * super-linear step — at Σ outdeg·indeg ≤ O(m^1.5), independent of the
  * degree distribution. An id-ordered orientation (p1 < p2) has no such
  * bound: a high-degree hub with mid-range id keeps indeg·outdeg ≈
  * deg²/4, and the 2-path join explodes quadratically in the hub degree
  * (OrientedTrianglesSpec plants exactly that graph and measures the
  * reduction). All steps are keyed joins/aggregations — no driver
  * state, no broadcast of data-sized tables.
  *
  * Counting is orientation-invariant by construction: each triangle
  * {x, y, z} has a unique (degree, id)-sorted labeling a < b < c and
  * contributes exactly the oriented edges a→b, b→c, a→c — one match in
  * the closure join, under ANY total order. So swapping orientations
  * changes the JOIN FAN-OUT, never the count — the reference-anchored
  * oracle (id-ordered SQL self-join) stays the cross-engine anchor.
  */
object OrientedTriangles {

  /** Per-vertex degree of an undirected edge list (columns p1, p2). */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("p1").as("v"))
      .unionAll(edges.select(col("p2").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))

  /** Orient each edge toward its higher-(degree, id) endpoint:
    * output columns (src, dst) with (deg(src), src) < (deg(dst), dst). */
  def orient(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    edges
      .join(deg.withColumnRenamed("v", "p1").withColumnRenamed("deg", "_d1"), "p1")
      .join(deg.withColumnRenamed("v", "p2").withColumnRenamed("deg", "_d2"), "p2")
      .select(
        when(col("_d1") < col("_d2") ||
             (col("_d1") === col("_d2") && col("p1") < col("p2")),
          struct(col("p1").as("src"), col("p2").as("dst")))
          .otherwise(struct(col("p2").as("src"), col("p1").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** Oriented 2-paths a→b→c — the stage whose cardinality degree
    * orientation bounds at O(m^1.5). Exposed so the spec can measure
    * the fan-out of competing orientations. */
  def twoPaths(oriented: DataFrame): DataFrame =
    oriented.alias("o1")
      .join(oriented.alias("o2"), col("o1.dst") === col("o2.src"))
      .select(col("o1.src").as("a"), col("o1.dst").as("b"), col("o2.dst").as("c"))

  /** Every triangle of the undirected edge list, enumerated exactly
    * once as (a, b, c) in the oriented order — the per-vertex /
    * per-edge analytics (clustering coefficient, common-neighbor
    * scores) consume the triples; `triangleCount` folds them. */
  def triangles(edges: DataFrame): DataFrame = {
    val o = orient(edges)
    twoPaths(o)
      .join(o.alias("o3"),
        col("a") === col("o3.src") && col("c") === col("o3.dst"))
      .select("a", "b", "c")
  }

  /** Total triangle count of the undirected edge list (p1 < p2 rows,
    * deduplicated) — single row `n_tri`. */
  def triangleCount(edges: DataFrame): DataFrame =
    triangles(edges).agg(count(lit(1)).as("n_tri"))
}
