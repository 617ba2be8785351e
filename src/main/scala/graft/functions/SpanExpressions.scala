package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen sliding-window hashes — the q76 span-dedup scan pass.
  *
  * Element k of the result is a 64-bit hash of the W-token window
  * starting at token k (split on every 0x20, like `split(text,' ',-1)`);
  * the array is EMPTY for docs shorter than W tokens. The portable form
  * (`transform(sequence(0, n-W), i -> xxhash64(array_join(slice(...))))`)
  * materializes a W-element array slice plus a joined string per
  * window position and runs through interpreted higher-order
  * functions — O(n·W) allocation-heavy interpreted work on every
  * corpus byte.
  *
  * Here each window `concat_ws(' ', t(k)..t(k+W-1))` is byte-identical
  * to the source slice `[start(k), end(k+W-1))` (tokens are separated
  * by exactly one 0x20 in the source — the [[Shingle3]] argument), so
  * the walk hashes each slice IN PLACE with zero copies: one xxh64
  * over `W` tokens' bytes per position, no intermediate arrays or
  * strings at all.
  *
  * The hash value itself is internal to the operator: q76's output
  * depends only on the hash's EQUALITY CLASSES (the oracle joins the
  * window STRINGS), so this does not need to reproduce SQL
  * `xxhash64(string)` bit-for-bit — it needs to be collision-free in
  * practice (64-bit xxh64: ~3e-8 birthday probability at 27M windows).
  * SpanHashesSpec asserts hash↔string equivalence-class bijection on
  * the corpus, and the q76 oracle row re-proves the composed operator.
  */
case class SpanHashes(child: Expression, windowTokens: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"span_hashes expects string, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "span_hashes"

  override def nullSafeEval(v: Any): Any =
    SpanHashes.compute(v.asInstanceOf[UTF8String], windowTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SpanHashes.compute($a, $windowTokens);")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

object SpanHashes {
  /** Default sliding-window width in tokens — THE span-dedup window:
    * DedupOps.SpanWindow (the q76/q81 operators and their oracles) and
    * the GraftExtensions SQL default both alias this constant, so the
    * SQL surface can never silently diverge from the operator. */
  val DefaultWindow = 20

  private val Seed = 4242L
  private val Empty = new GenericArrayData(new Array[Long](0))

  /** Width each session's `span_hashes` was registered with — lets
    * [[register]] detect (and overwrite on) a width change instead of
    * silently keeping the first registration. */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Integer]())

  /** One byte walk: token boundaries → one in-place xxh64 per window. */
  def compute(text: UTF8String, w: Int): GenericArrayData = {
    val b = text.getBytes
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    if (n < w) return Empty
    val start = new Array[Int](n)
    val end = new Array[Int](n)
    var t = 0
    i = 0
    while (i < b.length) {
      if (b(i) == ' ') { end(t) = i; t += 1; start(t) = i + 1 }
      i += 1
    }
    end(t) = b.length
    val out = new Array[Long](n - w + 1)
    var k = 0
    while (k <= n - w) {
      out(k) = XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start(k),
        end(k + w - 1) - start(k), Seed)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Idempotently register `span_hashes` (fixed window) in the session.
    * Re-registers (overwrites) when the session's known width differs or
    * when the function came from elsewhere (the GraftExtensions
    * injection) — never silently keeps a registration whose width this
    * caller didn't pick. */
  def register(spark: SparkSession, windowTokens: Int): Unit = {
    val ident = FunctionIdentifier("span_hashes")
    val registry = spark.sessionState.functionRegistry
    val known = registered.get(spark)
    if (known == null || known.intValue() != windowTokens ||
        !registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[SpanHashes].getName, "span_hashes"),
        (exprs: Seq[Expression]) => SpanHashes(exprs.head, windowTokens))
      registered.put(spark, Integer.valueOf(windowTokens)): Unit
    }
  }
}
