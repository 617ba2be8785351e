package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen distinct token-3-shingles — the tokenize+shingle pass every
  * text-dedup operator starts from (q32/q33/q65/q74/q75, SURVEY.md
  * §2.10 X2/X6).
  *
  * The portable form —
  * `array_distinct(transform(sequence(0, n-3), i -> concat_ws(' ',
  * toks[i], toks[i+1], toks[i+2])))` over `split(text, ' ')` — builds
  * four intermediate arrays per document and, decisively, runs through
  * Spark's higher-order functions, which are NOT codegen'd: every lambda
  * element evaluation is interpreted. At 100 TB the shingle pass
  * touches every corpus byte, so it is the dedup family's scan cost.
  *
  * This expression does it in one compiled byte walk with ZERO token
  * materialization: after a split on single spaces, consecutive tokens
  * are separated by exactly one 0x20 byte in the source, so each 3-gram
  * `concat_ws(' ', t(i), t(i+1), t(i+2))` is byte-identical to the
  * source slice `[start(i), end(i+2))`. The walk records token
  * boundaries, emits each gram as a slice copy, and dedups with a
  * LinkedHashSet — preserving array_distinct's first-occurrence order.
  * Byte-splitting on 0x20 is exact for UTF-8: multi-byte sequences
  * never contain 0x20.
  *
  * Parity with the portable form (including empty tokens from repeated
  * spaces, trailing separators, and <3-token docs, where the result is
  * EMPTY — callers filter `size(sh) >= 1`, equivalent to the old
  * `size(toks) >= 3` doc filter) is asserted element-for-element in
  * ShingleSpec; the dedup oracles re-prove it end-to-end.
  */
case class Shingle3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle3 expects string, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle3"

  override def nullSafeEval(v: Any): Any =
    Shingle3.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Shingle3.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Shingle3 =
    copy(child = newChild)
}

object Shingle3 {
  private val Empty = new GenericArrayData(new Array[AnyRef](0))

  /** One byte walk: token boundaries → distinct source-slice 3-grams in
    * first-occurrence order. */
  def compute(text: UTF8String): GenericArrayData = {
    val b = text.getBytes
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    if (n < 3) return Empty
    // start(t)/end(t): byte range of token t (split on EVERY space —
    // empty tokens from consecutive spaces keep their zero-width slot,
    // exactly like split(text, ' ') with Java's limit -1)
    val start = new Array[Int](n)
    val end = new Array[Int](n)
    var t = 0
    i = 0
    while (i < b.length) {
      if (b(i) == ' ') { end(t) = i; t += 1; start(t) = i + 1 }
      i += 1
    }
    end(t) = b.length
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var k = 0
    while (k <= n - 3) {
      seen.add(UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(b, start(k), end(k + 2))))
      k += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Idempotently register `shingle3` in the session. */
  def register(spark: SparkSession): Unit = {
    val ident = FunctionIdentifier("shingle3")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[Shingle3].getName, "shingle3"),
        (exprs: Seq[Expression]) => Shingle3(exprs.head))
    }
  }
}
