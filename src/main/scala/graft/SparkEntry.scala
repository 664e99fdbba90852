package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one entry in
  * `queries`; SQL-expressible ones also register the DuckDB oracle in
  * `oracleSql` (column names aliased identically on both sides — the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  private[graft] def modules: Seq[QDef] =
    Relational.defs ++ Windows.defs ++ Scalars.defs ++
      TextOps.defs ++ DedupOps.defs ++ SimilarityOps.defs ++ Temporal.defs ++
      Multimodal.defs ++ UdfSurface.defs ++ Advanced.defs ++ PointInTime.defs ++ PipelineOps.defs ++
      Coverage2.defs ++ Coverage4.defs ++ Coverage5.defs ++ Coverage6.defs ++
      Coverage7.defs ++ Coverage8.defs ++ Coverage9.defs ++ Coverage10.defs ++
      Coverage11.defs ++ Coverage12.defs ++ Coverage13.defs ++
      Coverage14.defs ++ Coverage15.defs ++ Coverage16.defs ++
      Coverage17.defs ++ Coverage18.defs ++ Coverage19.defs ++
      Coverage20.defs ++ Coverage21.defs ++ Coverage22.defs ++
      ProductQuant.defs ++ Formats.defs

  /** Flagship query (TPC-H Q3 shape) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(d => d.name -> d.fn).toMap

  /** DuckDB-runnable oracle SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    modules.flatMap(d => d.sql.map(sql => d.name -> sql)).toMap
}
