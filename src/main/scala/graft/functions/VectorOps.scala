package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Vector math (SURVEY.md §2-B similarity row) over `ArrayType(FloatType)` embedding columns, backed by
  * the codegen'd `vec_dot` Catalyst expression (VectorExpressions) — a
  * tight primitive loop inside whole-stage codegen, no UDF and no
  * interpreted higher-order function in the hot path.
  *
  * Accumulation is in DOUBLE (floats widened per element, summed in
  * array order) so results are deterministic and match an oracle that
  * folds the same way.
  *
  * Callers must register the expression once per session:
  * `VectorOps.ensure(spark)` (idempotent, called by every query fn).
  */
object VectorOps {

  def ensure(spark: SparkSession): Unit = VectorExpressions.register(spark)

  /** Σ aᵢ·bᵢ accumulated in double, in array order. */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Σ aᵢ² in double. */
  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Squared L2 distance (codegen'd; bit-identical to the
    * zip_with-diff + dot formulation). */
  def l2sq(a: Column, b: Column): Column = call_function("vec_l2sq", a, b)

  /** Cosine similarity in double: dot / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
