package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sfDir = "/root/testdata/sf0.001"

  test("salted aggregation equals direct aggregation") {
    val li = graft.table(spark, sfDir, "lineitem")
    val direct = li.groupBy("l_suppkey")
      .agg(sum(graft.dec(col("l_quantity"))).as("sum_value"), count(lit(1)).as("n"))
      .as[(Long, BigDecimal, Long)].collect().toSet
    val salted = Skew.saltedAgg(li, "l_suppkey", graft.dec(col("l_quantity")),
      col("l_orderkey"), buckets = 8)
      .as[(Long, BigDecimal, Long)].collect().toSet
    assert(salted == direct)
  }

  test("salted broadcast join returns the same rows as the plain join") {
    val li = graft.table(spark, sfDir, "lineitem")
      .withColumnRenamed("l_suppkey", "s_suppkey")
    val supp = graft.table(spark, sfDir, "supplier")
    val plain = li.join(supp, "s_suppkey")
      .select("l_orderkey", "l_linenumber", "s_name")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val salted = Skew.saltedBroadcastJoin(li, supp, "s_suppkey",
      col("l_orderkey"), buckets = 4)
      .select("l_orderkey", "l_linenumber", "s_name")
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("csv/json/orc round-trips preserve the data") {
    val src = graft.table(spark, sfDir, "nation")
    val base = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val expected = src.as[(Int, String, Int)].collect().sorted.toSeq

    src.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val csv = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$base/csv")
    assert(csv.as[(Int, String, Int)].collect().sorted.toSeq == expected)

    src.write.mode("overwrite").json(s"$base/json")
    val json = spark.read.schema(src.schema).json(s"$base/json")
    assert(json.as[(Int, String, Int)].collect().sorted.toSeq == expected)

    src.write.mode("overwrite").orc(s"$base/orc")
    val orc = spark.read.orc(s"$base/orc")
    assert(orc.as[(Int, String, Int)].collect().sorted.toSeq == expected)
  }

  test("partitioned parquet write prunes partitions on read") {
    val src = graft.table(spark, sfDir, "orders")
    val base = java.nio.file.Files.createTempDirectory("graft-part").toString
    src.withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(base)
    val pruned = spark.read.parquet(base).filter(col("status") === "O")
    val plan = pruned.queryExecution.executedPlan.toString
    val expected = src.filter(col("o_orderstatus") === "O").count()
    assert(pruned.count() == expected)
    // partition filter must be applied at scan, not post-filter
    assert(plan.contains("PartitionFilters") || !plan.contains("status = O"))
  }

  test("vec_dot is available through GraftExtensions-registered sessions") {
    // simulate the injected path by registering + invoking via SQL
    graft.functions.VectorExpressions.register(spark)
    graft.table(spark, sfDir, "embeddings").limit(5)
      .createOrReplaceTempView("emb_ext")
    val r = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS nsq FROM emb_ext")
      .as[(Long, Double)].collect()
    assert(r.forall { case (_, nsq) => nsq > 0.9 && nsq < 1.1 }) // unit norms
  }
}
