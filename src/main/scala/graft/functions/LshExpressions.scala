package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All random-hyperplane LSH codes of one embedding in one pass
  * (SURVEY.md §2.10 X3; used by q36/q49's bucket coding).
  *
  * Semantically identical to the unrolled form it replaces — per (table,
  * bit): sign(Σᵢ emb[i] · h(t,j,i)) with h = ±1 from the same
  * murmur-fmix32 of (t, j, i), accumulated in double left-to-right
  * exactly like [[FloatVectorDot]] against a ±1f literal (e·(+1.0) = e
  * and e·(−1.0) = −e are exact in IEEE), so the produced codes are
  * BIT-IDENTICAL (asserted in VectorExpressionsSpec). The point of the
  * fusion is the generated code size: `tables × bits` separate vec_dot
  * loops against 64-float literals produce thousands of lines for Janino
  * + JIT per query, where this expression is one virtual call into a
  * tight loop — the cold-run compile cost was the dominant term of
  * q49/q36 at bench scale.
  *
  * An embedding whose length ≠ `dim` yields code 0 in every table — the
  * same result the literal form gives (vec_dot returns NULL on length
  * mismatch, so no bit ever sets).
  */
final class LshCoder(bits: Int, tables: Int, dim: Int) extends Serializable {
  // ±1 sign per (table·bits + bit, dimension); ~tables×bits×dim booleans
  @transient private lazy val signs: Array[Array[Boolean]] =
    Array.tabulate(tables * bits) { tj =>
      val t = tj / bits
      val j = tj % bits
      Array.tabulate(dim) { i =>
        var h = t * 0x9E3779B1 + j * 0x85EBCA77 + i * 0xC2B2AE3D
        h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13; h *= 0xC2B2AE35; h ^= h >>> 16
        (h & 1) == 0 // true -> +1f
      }
    }

  def codes(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](tables)
    if (n != dim) return new GenericArrayData(out)
    var t = 0
    while (t < tables) {
      var code = 0L
      var j = 0
      while (j < bits) {
        val sg = signs(t * bits + j)
        var s = 0.0
        var i = 0
        while (i < n) {
          val e = arr.getFloat(i).toDouble
          s += (if (sg(i)) e else -e)
          i += 1
        }
        if (s > 0.0) code |= 1L << j
        j += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `lsh_codes(embedding)` — array of `tables` sign codes, bound to a
  * (bits, tables, dim) configuration at registration (per corpus, like
  * `lang_guess`'s trained model). Stays inside whole-stage codegen: the
  * generated code is one call into the coder per row. */
case class LshCodesExpr(child: Expression, coder: LshCoder)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_codes expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_codes"

  override def nullSafeEval(v: Any): Any = coder.codes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.addReferenceObj("lshCoder", coder, classOf[LshCoder].getName)
      s"${ev.value} = $c.codes($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): LshCodesExpr =
    copy(child = newChild)
}

object LshCodesExpr {
  /** (Re-)register `lsh_codes` bound to this (bits, tables, dim) — each
    * query trains/binds its own corpus-adaptive width. */
  def register(spark: SparkSession, bits: Int, tables: Int, dim: Int): Unit = {
    val coder = new LshCoder(bits, tables, dim)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lsh_codes"),
      new ExpressionInfo(classOf[LshCodesExpr].getName, "lsh_codes"),
      (exprs: Seq[Expression]) => LshCodesExpr(exprs.head, coder))
  }
}
