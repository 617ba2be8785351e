package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The one custom-Catalyst piece the engine needs (SURVEY.md §4.2/§7.4):
  * a whole-stage-codegen dot product over `array<float>` embeddings.
  *
  * The portable form — `aggregate(zip_with(a, b, ...), ...)` — is correct
  * but runs on Catalyst's interpreted higher-order-function path: per
  * element it allocates lambda variables and boxes floats, and it sits
  * outside generated code. At 100 TB of 64-1024-dim vectors the dot
  * product IS the similarity workload, so it gets a native Expression:
  * `doGenCode` emits a primitive float loop straight into the generated
  * Java, and the interpreted `nullSafeEval` mirrors it for non-codegen
  * paths. Accumulation is in double, matching the HOF form bit-for-bit
  * (float widened to double per element, summed left-to-right), so
  * swapping implementations cannot change oracle hashes.
  */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullable: Boolean = true

  // Mismatched lengths yield NULL — the same answer the HOF form gives
  // (zip_with pads the short side with null, which nulls the sum), so a
  // ragged embedding is excluded from similarity instead of silently
  // scoring on a truncated prefix.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Idempotently register `vec_dot` in this session's function registry
    * so query code can use `expr("vec_dot(a, b)")`. (Registration rather
    * than a Column bridge keeps us off the Spark 4 internal Column
    * constructors; a production deployment would do exactly this via
    * `SparkSessionExtensions.injectFunction`.) */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier("vec_dot")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
        (exprs: Seq[Expression]) => FloatVectorDot(exprs.head, exprs(1)))
    }
  }
}
