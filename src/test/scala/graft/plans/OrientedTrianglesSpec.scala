package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degree orientation must (a) count exactly the brute-force triangle
  * set, and (b) collapse the 2-path fan-out on the id-orientation worst
  * case: a high-degree hub at MID-RANGE id, where p1 < p2 orientation
  * leaves indeg·outdeg ≈ deg²/4 2-paths flowing through the hub while
  * (degree, id) orientation gives the hub out-degree 0.
  */
class OrientedTrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = 400
  private val hub = 200L

  // planted post-threshold graph: hub adjacent to every vertex, plus a
  // leaf chain — every chain edge closes a triangle through the hub.
  private lazy val edgeList: Seq[(Long, Long)] = {
    val hubEdges = (0L until n.toLong).filter(_ != hub)
      .map(i => (math.min(i, hub), math.max(i, hub)))
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1))
    (hubEdges ++ chain).distinct
  }

  private def bruteTriangles: Long = {
    val adj = edgeList.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    edgeList.iterator.map { case (u, v) =>
      (adj(u) & adj(v)).count(w => w > v): Long
      // w > v (> u too since u < v) → each triangle counted at its
      // smallest-id edge exactly once
    }.sum
  }

  private lazy val edges = edgeList.toDF("p1", "p2")

  test("oriented count == brute-force triangle enumeration") {
    val got = OrientedTriangles.triangleCount(edges)
      .as[Long].collect().head
    assert(got == bruteTriangles)
    assert(got >= n - 3) // the planted chain triangles are all there
  }

  test("degree orientation collapses the hub's 2-path fan-out") {
    val idPaths = OrientedTriangles.twoPaths(
      edges.select(col("p1").as("src"), col("p2").as("dst"))).count()
    val degPaths = OrientedTriangles.twoPaths(
      OrientedTriangles.orient(edges)).count()
    // id orientation: ~deg²/4 ≈ 10k 2-paths through the hub alone;
    // degree orientation: hub out-degree 0, leaves bounded by their own
    // tiny degrees. The gap is the O(m^1.5) bound materializing.
    assert(idPaths >= 10000L, s"planted graph too easy: idPaths=$idPaths")
    assert(degPaths * 10 <= idPaths,
      s"degree orientation gave no reduction: $degPaths vs $idPaths")
  }

  test("orientation is a total order: every edge oriented exactly once") {
    val o = OrientedTriangles.orient(edges)
    assert(o.count() == edgeList.size)
    // no edge appears in both directions
    assert(o.alias("a").join(o.alias("b"),
      col("a.src") === col("b.dst") && col("a.dst") === col("b.src")).count() == 0)
  }
}
