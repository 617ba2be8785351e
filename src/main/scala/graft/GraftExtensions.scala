package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{FloatVectorDot, MinHashSignature, SimHash64}

/** The library's `SparkSessionExtensions` entry point — the idiomatic
  * way a deployment picks up graft's codegen expressions for pure-SQL
  * use, with no Scala call needed:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  *   ...
  *   SELECT vec_dot(a.embedding, b.embedding) FROM ...
  *   SELECT minhash_sig(shingles)      -- 64 hashes (default)
  *   SELECT minhash_sig(shingles, 128) -- explicit signature width
  *   SELECT simhash64(tokens)
  *   SELECT quality_features(text)     -- scorer signals, one byte walk
  *   SELECT span_hashes(text)          -- q76 windows (default W=20)
  *   SELECT span_hashes(text, 50)      -- explicit window width
  * }}}
  *
  * The per-query `register` helpers on each expression object stay for
  * sessions built without the config (the query modules call them
  * idempotently). `lang_guess` is deliberately NOT injected here: it
  * binds a driver-trained model (functions/LangModel.scala), so a
  * static, session-independent builder cannot construct it — training
  * registers it per corpus.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def numHashesOf(e: Expression): Int = intLiteralOf("minhash_sig", e)

  private def intLiteralOf(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name width must be an integer literal, got $other")
  }

  /** A clean arity message beats the IndexOutOfBoundsException a bare
    * exprs(n) would surface as an internal error. */
  private def arity(name: String, exprs: Seq[Expression], expected: Int*): Unit =
    if (!expected.contains(exprs.length))
      throw new IllegalArgumentException(
        s"$name expects ${expected.mkString(" or ")} argument(s), got ${exprs.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the engine's two optimizer rules over the rollup partial store:
    // partition-grain aggregates over a rollup-maintained lake are
    // SERVED from the metadata-sized partials (RollupMetadataAggregate,
    // see its scaladoc for the exact servable surface), and event-time
    // range filters SKIP partitions via the partials' zone bounds
    // (RollupPartitionSkip — lakehouse data skipping from statistics
    // the pipeline maintains exactly)
    ext.injectOptimizerRule(graft.plans.RollupMetadataAggregate.apply)
    ext.injectOptimizerRule(graft.plans.RollupPartitionSkip.apply)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        arity("vec_dot", exprs, 2)
        FloatVectorDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        arity("minhash_sig", exprs, 1, 2)
        MinHashSignature(exprs.head,
          if (exprs.lengthCompare(1) > 0) numHashesOf(exprs(1)) else 64)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        arity("simhash64", exprs, 1)
        SimHash64(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle3"),
      new ExpressionInfo(classOf[graft.functions.Shingle3].getName, "shingle3"),
      (exprs: Seq[Expression]) => {
        arity("shingle3", exprs, 1)
        graft.functions.Shingle3(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("quality_features"),
      new ExpressionInfo(classOf[graft.functions.QualityFeatures].getName, "quality_features"),
      (exprs: Seq[Expression]) => {
        arity("quality_features", exprs, 1)
        graft.functions.QualityFeatures(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("span_hashes"),
      new ExpressionInfo(classOf[graft.functions.SpanHashes].getName, "span_hashes"),
      (exprs: Seq[Expression]) => {
        arity("span_hashes", exprs, 1, 2)
        graft.functions.SpanHashes(exprs.head,
          if (exprs.lengthCompare(1) > 0) intLiteralOf("span_hashes", exprs(1))
          else graft.functions.SpanHashes.DefaultWindow)
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_quantize"),
      new ExpressionInfo(classOf[graft.functions.Vec8Quantize].getName, "vec_quantize"),
      (exprs: Seq[Expression]) => {
        arity("vec_quantize", exprs, 1)
        graft.functions.Vec8Quantize(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot_q8"),
      new ExpressionInfo(classOf[graft.functions.Vec8Dot].getName, "vec_dot_q8"),
      (exprs: Seq[Expression]) => {
        arity("vec_dot_q8", exprs, 4)
        graft.functions.Vec8Dot(exprs.head, exprs(1), exprs(2), exprs(3))
      }))
    // build AND probe (round 20): extension-built sessions could probe
    // sidecar filters but not construct them via SQL — asymmetric for a
    // pure-SQL deployment publishing its own bounds batches. Builders
    // are shared with the per-session registry path (arity-checked
    // there, once, for both).
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[graft.functions.BloomBuildAgg].getName,
        "graft_bloom_agg"),
      graft.functions.BloomExpressions.aggBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains_any"),
      new ExpressionInfo(classOf[graft.functions.BloomMightContainAny].getName,
        "graft_bloom_contains_any"),
      graft.functions.BloomExpressions.probeBuilder))
  }
}
