package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Int8 scalar quantization for embedding columns (north-star X3: the
  * storage path of a 100 TB vector corpus). `vec_quantize` maps an
  * array<float> to struct(scale float, q array<byte>) by symmetric
  * max-abs scaling — q[i] = round(e[i]/scale), scale = max|e|/127 — a
  * 4× smaller index whose approximate dot products rank candidates;
  * `vec_dot_q8` multiplies two quantized vectors back into float space
  * (int accumulate × both scales). The standard deployment (q64): scan
  * and rank on the int8 index, then exact-re-rank only the top
  * candidates from the float column. Both expressions are driver-logic-
  * free codegen calls into [[Quant8]], so they stay inside whole-stage
  * codegen like vec_dot/lsh_codes.
  */
object Quant8 {
  /** struct(scale, q) of one float vector; all-zero vectors get scale 0
    * and an all-zero q (dot with anything = 0, the right answer). */
  def quantize(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0f
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getFloat(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0f
    val q = new Array[Byte](n)
    if (scale > 0.0f) {
      i = 0
      while (i < n) {
        q(i) = math.round(arr.getFloat(i) / scale).toByte // |e|<=maxAbs -> [-127,127]
        i += 1
      }
    }
    InternalRow(scale, new GenericArrayData(q))
  }

  /** sa·sb·Σ qa[i]·qb[i] — int accumulation (max |q|=127, so 2^31/127²
    * ≈ 133k dims before overflow; use long beyond that). Null on length
    * mismatch is handled by the expression wrapper. */
  def dot(qa: ArrayData, sa: Float, qb: ArrayData, sb: Float): Double = {
    val n = qa.numElements()
    var acc = 0
    var i = 0
    while (i < n) {
      acc += qa.getByte(i) * qb.getByte(i)
      i += 1
    }
    acc.toDouble * sa * sb
  }
}

/** `vec_quantize(embedding)` → struct(scale: float, q: array<tinyint>). */
case class Vec8Quantize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_quantize expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_quantize"

  override def nullSafeEval(v: Any): Any = Quant8.quantize(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Quant8.quantize($a);")

  override protected def withNewChildInternal(newChild: Expression): Vec8Quantize =
    copy(child = newChild)
}

/** `vec_dot_q8(qa, sa, qb, sb)` → approximate float-space dot product.
  * NULL on length mismatch (same ragged-vector posture as vec_dot). */
case class Vec8Dot(qa: Expression, sa: Expression, qb: Expression, sb: Expression)
  extends QuaternaryExpression {

  override def first: Expression = qa
  override def second: Expression = sa
  override def third: Expression = qb
  override def fourth: Expression = sb

  override def checkInputDataTypes(): TypeCheckResult =
    (qa.dataType, sa.dataType, qb.dataType, sb.dataType) match {
      case (ArrayType(ByteType, _), FloatType, ArrayType(ByteType, _), FloatType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"vec_dot_q8 expects (array<tinyint>, float, array<tinyint>, float), got $t")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot_q8"

  override def nullSafeEval(a: Any, s1: Any, b: Any, s2: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else Quant8.dot(x, s1.asInstanceOf[Float], y, s2.asInstanceOf[Float])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s1, b, s2) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Quant8.dot($a, $s1, $b, $s2);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Vec8Dot =
    copy(qa = f, sa = s, qb = t, sb = q)
}

object QuantizeExpressions {
  /** Idempotently register both expressions in the session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val quantIdent = FunctionIdentifier("vec_quantize")
    if (!registry.functionExists(quantIdent)) {
      registry.registerFunction(quantIdent,
        new ExpressionInfo(classOf[Vec8Quantize].getName, "vec_quantize"),
        (exprs: Seq[Expression]) => Vec8Quantize(exprs.head))
    }
    val dotIdent = FunctionIdentifier("vec_dot_q8")
    if (!registry.functionExists(dotIdent)) {
      registry.registerFunction(dotIdent,
        new ExpressionInfo(classOf[Vec8Dot].getName, "vec_dot_q8"),
        (exprs: Seq[Expression]) => Vec8Dot(exprs.head, exprs(1), exprs(2), exprs(3)))
    }
  }
}
