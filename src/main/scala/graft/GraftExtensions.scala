package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArgMaxBy, BloomMightContain, CompositeLowerBound, FreqSketch, MinHashSignature, RollingHash, SimHash64, SrpBuckets, TopKBy, TopKStrBy, VecSum, VectorDot, ZInterleave, ZInterleaveN}

/** Session extension point (SURVEY.md §2-B UDF-surface row): `SparkSession.builder()
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
    ext.injectFunction((
      new FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[graft.functions.VectorL2Sq].getName, "vec_l2sq"),
      (children: Seq[Expression]) =>
        graft.functions.VectorL2Sq(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) =>
        // shared strict builder — TextHashExpressions.register installs
        // the same one, so the argument contract can't fork between the
        // extension and per-session registration paths
        graft.functions.TextHashExpressions.simhash64Builder(children)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (children: Seq[Expression]) =>
        graft.functions.TextHashExpressions.minhashSigBuilder(children)))
    ext.injectFunction((
      new FunctionIdentifier("rollhash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rollhash"),
      (children: Seq[Expression]) => RollingHash(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("phrase_count"),
      new ExpressionInfo(classOf[graft.functions.PhraseCount].getName, "phrase_count"),
      (children: Seq[Expression]) =>
        graft.functions.PhraseExpressions.builder(children)))
    ext.injectFunction((
      new FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "topk_by"),
      (children: Seq[Expression]) => TopKBy(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("bottomk_dec"),
      new ExpressionInfo(classOf[graft.functions.BottomKDec].getName, "bottomk_dec"),
      (children: Seq[Expression]) =>
        graft.functions.BottomKDec(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("argmax_by"),
      new ExpressionInfo(classOf[ArgMaxBy].getName, "argmax_by"),
      (children: Seq[Expression]) => ArgMaxBy(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("topk_str_by"),
      new ExpressionInfo(classOf[TopKStrBy].getName, "topk_str_by"),
      (children: Seq[Expression]) => TopKStrBy(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("vec_sum"),
      new ExpressionInfo(classOf[VecSum].getName, "vec_sum"),
      (children: Seq[Expression]) => VecSum(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "freq_sketch"),
      (children: Seq[Expression]) => FreqSketch(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("z_interleave"),
      new ExpressionInfo(classOf[ZInterleave].getName, "z_interleave"),
      (children: Seq[Expression]) => ZInterleave(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("z_interleave_n"),
      new ExpressionInfo(classOf[ZInterleaveN].getName, "z_interleave_n"),
      (children: Seq[Expression]) => ZInterleaveN(children)))
    ext.injectFunction((
      new FunctionIdentifier("srp_buckets"),
      new ExpressionInfo(classOf[SrpBuckets].getName, "srp_buckets"),
      (children: Seq[Expression]) =>
        graft.functions.SrpExpressions.bucketsBuilder(children)))
    ext.injectFunction((
      new FunctionIdentifier("dhash64"),
      new ExpressionInfo(classOf[graft.functions.DHash64].getName, "dhash64"),
      (children: Seq[Expression]) =>
        graft.functions.ImageHashExpressions.builder(children)))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => BloomMightContain(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("zone_bloom"),
      new ExpressionInfo(classOf[graft.functions.BloomAgg].getName, "zone_bloom"),
      (children: Seq[Expression]) =>
        graft.functions.BloomAgg(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("composite_lower_bound"),
      new ExpressionInfo(classOf[CompositeLowerBound].getName,
        "composite_lower_bound"),
      (children: Seq[Expression]) =>
        CompositeLowerBound(children(0), children(1), children(2), children(3))))
  }
}
