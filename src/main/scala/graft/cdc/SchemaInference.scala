package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema inference for tables with no registered StructType.
  *
  * The reference is schemaless: it re-infers every field's type from
  * JSON node kind on every record
  * (DebeziumToPostgresConsumer.java:255-274). Spark's `from_json` needs
  * a schema up front, so the engine formalizes the same policy — infer
  * once per (topic-table, micro-batch) from a bounded sample of
  * envelope values using Spark's JSON schema inference (numbers→long/
  * double, strings, booleans, nested→struct), then decode the whole
  * batch typed. Unknown tables therefore materialize with real types
  * instead of the all-strings dynamic fallback.
  */
object SchemaInference {

  /** Union row schema of the after/before images across sample values;
    * None if nothing parseable. */
  def inferRowSchema(spark: SparkSession, sampleValues: Seq[String]): Option[StructType] = {
    if (sampleValues.isEmpty) return None
    import spark.implicits._
    val parsed = spark.read.json(sampleValues.toDS())
    def imageOf(schema: StructType, field: String): Option[StructType] =
      schema.fields.find(_.name == field).map(_.dataType).collect {
        case st: StructType => st
      }
    val root = parsed.schema
    val payload = imageOf(root, "payload")
    val after = imageOf(root, "after").orElse(payload.flatMap(imageOf(_, "after")))
    val before = imageOf(root, "before").orElse(payload.flatMap(imageOf(_, "before")))
    (after, before) match {
      case (Some(a), Some(b)) => Some(merge(a, b))
      case (a, b) => a.orElse(b)
    }
  }

  /** Field-union merge (delete-only samples have richer `before`). */
  private def merge(a: StructType, b: StructType): StructType =
    StructType(a.fields ++ b.fields.filterNot(f => a.fieldNames.contains(f.name)))

  /** Sample up to `n` values of one topic-table sub-batch. */
  def sampleValues(sub: DataFrame, n: Int = 200): Seq[String] = {
    import org.apache.spark.sql.functions.col
    sub.select(col("value")).filter(col("value").isNotNull)
      .limit(n).collect().map(_.getString(0)).toSeq
  }
}
