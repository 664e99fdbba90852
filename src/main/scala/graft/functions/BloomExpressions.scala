package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership probe for scan-side prefilters
  * (q_decontaminate_bloom): `bloom_might_contain(serializedFilter, hash)`.
  *
  * Why an expression and not a Scala UDF over a broadcast filter: a UDF
  * boxes every 8-byte hash to `java.lang.Long`, crosses the
  * codegen/interpreted boundary per row, and splits the whole-stage
  * codegen span right at the scan — the one place the probe is supposed
  * to be nearly free. This literal form follows Spark's own
  * runtime-filter shape (`BloomFilterMightContain`, SPARK-32268): the
  * filter travels as a FOLDABLE binary child, is deserialized once per
  * plan instance into a transient lazy field, and the per-row work is an
  * inlined `mightContainLong` — a few XXH64 rounds and bit tests, no
  * boxing. It exists for SQL callers (`bloom_might_contain(bytes, h)`);
  * the DataFrame path uses the broadcast-backed [[BloomProbe]] below,
  * which keeps multi-MB filters out of the task binary entirely.
  *
  * Null contract (mirrors Spark's): a null/invalid serialized filter or
  * a null probe value yields NULL (a `filter()` then drops the row —
  * same net behavior as the UDF returning false, but composable with
  * three-valued logic).
  */
case class BloomMightContain(filter: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = filter
  override def right: Expression = value
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (filter.dataType, value.dataType) match {
      case (BinaryType, LongType) if filter.foldable => TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a foldable (constant) serialized filter")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, bigint), got (${filter.dataType}, ${value.dataType})")
    }

  // Deserialized once per (deserialized) plan instance; the codegen path
  // pins the same object into the generated class's references array.
  @transient private lazy val bloom: BloomFilter =
    filter.eval(null) match {
      case bytes: Array[Byte] =>
        try BloomFilter.readFrom(new ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      case _ => null
    }

  override def eval(input: InternalRow): Any = {
    if (bloom == null) return null
    val v = value.eval(input)
    if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (bloom == null) {
      return ev.copy(
        code = code"""
          boolean ${ev.isNull} = true;
          boolean ${ev.value} = false;""",
        isNull = ev.isNull, value = ev.value)
    }
    val bloomRef =
      ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    val vEv = value.genCode(ctx)
    ev.copy(code = code"""
      ${vEv.code}
      boolean ${ev.isNull} = ${vEv.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = $bloomRef.mightContainLong(${vEv.value});
      }""", isNull = ev.isNull, value = ev.value)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(filter = newLeft, value = newRight)
}

/** Broadcast-backed variant — the DataFrame-API entry point
  * ([[BloomExpressions.probe]]) and the shape that actually scales.
  *
  * Ship semantics: [[BloomMightContain]] carries the serialized filter
  * INSIDE the plan, so every stage referencing it broadcasts a
  * filter-sized task binary AND every task re-deserializes it (task
  * closures are deserialized per task, broadcast values once per
  * executor). At a few MB × thousands of scan tasks that's real CPU.
  * Here the expression holds only the `Broadcast` handle (bytes on the
  * wire: a broadcast id); `value()` fetches and caches the deserialized
  * filter once per executor, and codegen pins it into a mutable slot at
  * generated-class init so the per-row probe is a direct
  * `mightContainLong` on a local field — no boxing, whole-stage span
  * intact. Not SQL-registrable (needs the driver-side handle); the
  * literal form above covers SQL.
  */
case class BloomProbe(child: Expression, bc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects bigint, got $t")
  }

  @transient private lazy val bloom: BloomFilter = bc.value

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc, classOf[Broadcast[_]].getName)
    val bloomVar = ctx.addMutableState(classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bloomVar.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomExpressions {
  /** Register `bloom_might_contain` in the session's function registry
    * (idempotent) — the repo's convention for invoking custom
    * expressions from the Column API and SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1)), "built-in")

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  private val probeSeq = new java.util.concurrent.atomic.AtomicLong()
  private val probeMemo = new java.util.IdentityHashMap[
    BloomFilter, (String, org.apache.spark.broadcast.Broadcast[BloomFilter])]()
  private val liveProbes = scala.collection.mutable.ListBuffer
    .empty[org.apache.spark.broadcast.Broadcast[BloomFilter]]

  /** Column-API entry point: broadcasts the filter (once per executor,
    * cached deserialized) and probes it via the codegen'd [[BloomProbe]].
    * Spark 4 exposes no public Expression→Column bridge, so this rides
    * the repo's registry convention: a uniquely-named temp function whose
    * builder closure carries the broadcast handle (unique so that two
    * probes with different filters in one session can never collide).
    * The SAME filter instance probed twice reuses its broadcast (a
    * multi-leg plan referencing one filter ships it once); broadcasts
    * for filters built per query run accumulate until [[clearProbes]] —
    * wired into the bench's per-run `DedupOps.clearMemos`, so repeated
    * runs don't stack multi-MB executor copies. */
  def probe(spark: SparkSession, bf: BloomFilter, value: Column): Column = {
    val (name, bc) = probeMemo.synchronized {
      Option(probeMemo.get(bf)).getOrElse {
        val bc = spark.sparkContext.broadcast(bf)
        liveProbes += bc
        val n = s"bloom_probe_${probeSeq.incrementAndGet()}"
        probeMemo.put(bf, (n, bc))
        (n, bc)
      }
    }
    // registered in the CALLING session on every call (idempotent,
    // registry-map cheap): the memo is process-global but a temp
    // function lives in one session's registry — a memo hit from a
    // second session (spark.newSession()) would otherwise resolve to
    // an undefined function at analysis
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BloomProbe(exprs(0), bc), "built-in")
    call_function(name, value)
  }

  /** Unpersist every probe broadcast and forget the memo — only safe
    * when no live plan still references a probe (the clearMemos
    * contract: memoized plans are dropped in the same sweep). */
  def clearProbes(): Unit = probeMemo.synchronized {
    liveProbes.foreach(bc => scala.util.Try(bc.unpersist(blocking = false)))
    liveProbes.clear()
    probeMemo.clear()
  }
}
