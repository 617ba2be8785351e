package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen quality-signal extraction — the per-doc feature pass behind
  * the q77 scorer and the q70/q74 curation gates (SURVEY.md §2.10 X6).
  *
  * The portable form needs four independent interpreted passes over the
  * tokenized text (`size(split(...))`, a stopword `filter` lambda, a
  * bigram `transform` + `array_distinct`, a `regexp_replace` length) —
  * and because Spark's higher-order functions are CodegenFallback with
  * no common-subexpression elimination, a FILTER that references the
  * composed score re-evaluates `split(text)` for every feature term:
  * the q70 gate measured 0.27 s → 2.5 s warm at sf0.1 when the scorer
  * was first wired in through the portable expressions.
  *
  * This expression computes all four signals in ONE compiled byte walk
  * (the [[Shingle3]] construction):
  *
  *  - `n_tokens`: split-on-every-0x20 segment count (empty segments
  *    from repeated spaces keep their slot, exactly like
  *    `split(text, ' ', -1)`),
  *  - `n_stop`: segments byte-equal to one of the six stopwords
  *    ([[graft.queries.TextOps.Stopwords]], the q29 list),
  *  - `nospace`: CHARACTER length minus space count (byte-splitting is
  *    exact for UTF-8 — multi-byte sequences never contain 0x20 — but
  *    the length must match `length(regexp_replace(text, ' ', ''))`,
  *    which counts characters),
  *  - `bi_distinct`: distinct adjacent-bigram count; each bigram
  *    `concat_ws(' ', t(i), t(i+1))` is byte-identical to the source
  *    slice `[start(i), end(i+1))`, so distinctness is a HashSet of
  *    zero-copy slices.
  *
  * Element-for-element parity with the portable form is asserted in
  * QualityFeaturesSpec (corpus + adversarial spacing fixtures); the
  * q77/q70/q74 oracle rows re-prove the composed score end-to-end.
  */
case class QualityFeatures(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quality_features expects string, got ${t.sql}")
  }
  override def dataType: DataType = QualityFeatures.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quality_features"

  override def nullSafeEval(v: Any): Any =
    QualityFeatures.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.QualityFeatures.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): QualityFeatures =
    copy(child = newChild)
}

object QualityFeatures {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("nospace", LongType, nullable = false),
    StructField("bi_distinct", LongType, nullable = false)))

  private val StopBytes: Array[Array[Byte]] =
    graft.queries.TextOps.Stopwords.map(_.getBytes("UTF-8")).toArray

  private def isStop(b: Array[Byte], s: Int, e: Int): Boolean = {
    val len = e - s
    var j = 0
    while (j < StopBytes.length) {
      val w = StopBytes(j)
      if (w.length == len) {
        var k = 0
        while (k < len && b(s + k) == w(k)) k += 1
        if (k == len) return true
      }
      j += 1
    }
    false
  }

  /** One byte walk over the document: token boundaries, stopword hits,
    * space count, distinct adjacent bigrams (as zero-copy slices). */
  def compute(text: UTF8String): InternalRow = {
    val b = text.getBytes
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    val start = new Array[Int](n)
    val end = new Array[Int](n)
    var t = 0
    i = 0
    while (i < b.length) {
      if (b(i) == ' ') { end(t) = i; t += 1; start(t) = i + 1 }
      i += 1
    }
    end(t) = b.length
    var nStop = 0L
    t = 0
    while (t < n) {
      if (isStop(b, start(t), end(t))) nStop += 1
      t += 1
    }
    var biDistinct = 0L
    if (n >= 2) {
      val seen = new java.util.HashSet[UTF8String]()
      var k = 0
      while (k <= n - 2) {
        seen.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(b, start(k), end(k + 1)))): Unit
        k += 1
      }
      biDistinct = seen.size().toLong
    }
    new GenericInternalRow(Array[Any](
      n.toLong, nStop, text.numChars().toLong - (n - 1), biDistinct))
  }

  /** Idempotently register `quality_features` in the session. */
  def register(spark: SparkSession): Unit = {
    val ident = FunctionIdentifier("quality_features")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[QualityFeatures].getName, "quality_features"),
        (exprs: Seq[Expression]) => QualityFeatures(exprs.head))
    }
  }
}
