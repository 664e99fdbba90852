package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: CSV, JSON-lines, and ORC.
  *
  * Each query round-trips a driver table through the format (write to a
  * temp dir, read back with the explicit schema) and then aggregates the
  * read-back data; the DuckDB oracle aggregates the ORIGINAL parquet, so
  * a green hash-match proves the round-trip is lossless — doubles survive
  * via Java's round-trip-exact Double.toString, dates/strings via the
  * format's canonical text form.
  *
  * Reference scope: the reference's sink is JDBC/Postgres (covered by
  * cdc.CdcSink); these are the additional file formats a Spark user of
  * the same tables reads and writes (SURVEY.md §2-B sources row).
  *
  * Scale notes: the write/read is the point here, not the aggregate —
  * all three writers are ordinary distributed datasource writes (one
  * file per partition, no driver funnel), and the explicit read schema
  * keeps the scan single-pass (no sampling-based inference job at
  * 100 TB; schema inference over CSV/JSON re-reads the corpus).
  */
object Formats {

  private def oSum(x: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(38,10))) AS STRING) AS DOUBLE)"

  /** Per-JVM scratch dir, fixed per format WITHIN a JVM (overwritten
    * each invocation — a fresh createTempDirectory per call would
    * accumulate one directory per bench run) but namespaced by pid so
    * two concurrent runs on one host (parallel suites, bench + verify
    * overlap, two checkouts) can't overwrite each other's round-trip
    * data mid-read. Cleanup (r6 advice — dirs otherwise accumulate one
    * per JVM forever): this JVM's dirs are removed by a shutdown hook,
    * and the first scratch() call sweeps dirs left by pids no longer
    * alive (a kill -9 skips hooks). */
  private def scratch(fmt: String): String = {
    registerCleanup()
    s"${System.getProperty("java.io.tmpdir")}/graft_${ProcessHandle.current().pid()}_roundtrip_$fmt"
  }

  private val ScratchName = "graft_(\\d+)_roundtrip_.*".r
  private val cleanupRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
    f.delete(); ()
  }
  private def registerCleanup(): Unit =
    if (cleanupRegistered.compareAndSet(false, true)) {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      val mine = ProcessHandle.current().pid()
      Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
        f.getName match {
          case ScratchName(pid) if pid.toLong != mine
              && !ProcessHandle.of(pid.toLong).isPresent => deleteRec(f)
          case _ => ()
        }
      }
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(_.getName.startsWith(s"graft_${mine}_roundtrip_"))
          .foreach(deleteRec)))
      ()
    }

  val defs: Seq[QDef] = Seq(

    QDef("q_source_csv",
      s"""SELECT s_nationkey, count(*) AS n, ${oSum("s_acctbal")} AS bal,
         |  min(s_name) AS first_name
         |FROM supplier GROUP BY s_nationkey
         |""".stripMargin) { (s, dir) =>
      val sup = table(s, dir, "supplier")
      val tmp = scratch("csv")
      sup.write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema(sup.schema).option("header", "true").csv(tmp)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sumExact(col("s_acctbal")).as("bal"),
          min(col("s_name")).as("first_name"))
    },

    QDef("q_source_json",
      s"""SELECT o_orderstatus, count(*) AS n, ${oSum("o_totalprice")} AS rev,
         |  max(CAST(o_orderdate AS DATE)) AS mx_date
         |FROM orders GROUP BY o_orderstatus
         |""".stripMargin) { (s, dir) =>
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate").cast("date").as("o_odate"))
      val tmp = scratch("json")
      o.write.mode("overwrite").json(tmp)
      s.read.schema(o.schema).json(tmp)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sumExact(col("o_totalprice")).as("rev"),
          max(col("o_odate")).as("mx_date"))
    },

    QDef("q_source_orc",
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  ${oSum("l_quantity")} AS qty, max(l_shipdate) AS mx_ship
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |""".stripMargin) { (s, dir) =>
      val l = table(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_shipdate")
      val tmp = scratch("orc")
      l.write.mode("overwrite").orc(tmp)
      s.read.schema(l.schema).orc(tmp)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sumExact(col("l_quantity")).as("qty"),
          max(col("l_shipdate")).as("mx_ship"))
    },

    // XML is a first-class Spark 4 datasource (the spark-xml donation,
    // SPARK-44265) — same lossless-round-trip contract as CSV/JSON:
    // doubles survive via Java's round-trip-exact Double.toString, and
    // the explicit read schema keeps the scan single-pass.
    QDef("q_source_xml",
      s"""SELECT p_brand, count(*) AS n, ${oSum("p_retailprice")} AS retail,
         |  min(p_name) AS first_name
         |FROM part GROUP BY p_brand
         |""".stripMargin) { (s, dir) =>
      val p = table(s, dir, "part")
      val tmp = scratch("xml")
      p.write.mode("overwrite").option("rowTag", "part").format("xml").save(tmp)
      s.read.schema(p.schema).option("rowTag", "part").format("xml").load(tmp)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sumExact(col("p_retailprice")).as("retail"),
          min(col("p_name")).as("first_name"))
    }
  )
}
