package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorDot

/** Session extension point: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` (or
  * `--conf spark.sql.extensions=graft.GraftExtensions`) registers the
  * engine's native expressions in every session — no per-session
  * `VectorOps.ensure` needed when the engine is installed cluster-wide.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VectorDot(children(0), children(1))))
  }
}
