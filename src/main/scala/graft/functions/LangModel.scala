package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Naive-Bayes character-trigram language scorer (SURVEY.md §2.10 X4, q31).
  *
  * The model is driver-resident by design: profiles are capped at the
  * top-K trigrams per language, so the whole table is K × n_langs entries
  * (tens of KBs) — the same "KB-scale metadata on the driver" shape as the
  * IVF centroids (VectorOps q51). Shipping it into a codegen expression
  * turns classification into ONE narrow map-only pass over the corpus:
  * no explode, no shuffle, no per-doc gram frame to cache. At 100 TB the
  * scoring pass is a pure scan; the only shuffle in q31 is the tiny
  * (lang, gram) profile aggregation that trains the model.
  *
  * Scoring math (identical to the previous DataFrame form, kept so the
  * model's semantics are unchanged): score(l) = Σ over every trigram
  * occurrence g of lp_e6(l, g), where lp_e6 = round(ln((cnt + 0.5) /
  * (tot + 1000)) · 1e6) for profiled grams and the same formula at cnt=0
  * for unseen ones. Integer sums are order-independent → bit-identical
  * across runs and partitionings (LangGuessSpec). Ties break toward the
  * lexicographically larger language, matching max(struct(score, lang)).
  */
final class LangScorer(
    langs: Array[String],
    grams: Array[String],
    lps: Array[Array[Long]],
    defaults: Array[Long]) extends Serializable {

  @transient private lazy val table: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]](grams.length * 2)
    var i = 0
    while (i < grams.length) { m.put(grams(i), lps(i)); i += 1 }
    m
  }
  @transient private lazy val langsU8: Array[UTF8String] =
    langs.map(UTF8String.fromString)

  /** argmax-language of the summed trigram log-likelihood; null when the
    * text has no trigram (fewer than 3 code points) or no language is
    * profiled. Trigrams are consecutive 3-code-point substrings, matching
    * SQL `substring(text, i+1, 3)`. */
  def guess(text: UTF8String): UTF8String = {
    val nLang = langs.length
    if (nLang == 0) return null
    val s = text.toString
    val cps = s.codePoints().toArray
    if (cps.length < 3) return null
    val scores = new Array[Long](nLang)
    var i = 0
    while (i <= cps.length - 3) {
      val g = new String(cps, i, 3)
      val row = table.get(g)
      val add = if (row != null) row else defaults
      var l = 0
      while (l < nLang) { scores(l) += add(l); l += 1 }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < nLang) {
      // >= prefers the later (lexicographically larger — langs is sorted)
      // language on ties, same as max(struct(score, lang))
      if (scores(l) >= scores(best)) best = l
      l += 1
    }
    langsU8(best)
  }
}

/** `lang_guess(text)` — classify a document with a driver-trained
  * [[LangScorer]]. Stays inside whole-stage codegen (the generated code is
  * one virtual call into the referenced scorer per row). */
case class LangGuessExpr(child: Expression, scorer: LangScorer)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_guess expects string, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "lang_guess"

  override def nullSafeEval(v: Any): Any =
    scorer.guess(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sc = ctx.addReferenceObj("langScorer", scorer, classOf[LangScorer].getName)
      val tmp = ctx.freshName("guessed")
      s"""
         |UTF8String $tmp = $sc.guess($a);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LangGuessExpr =
    copy(child = newChild)
}

object LangGuessExpr {
  /** (Re-)register `lang_guess` bound to the given scorer. Re-registration
    * replaces the previous binding, so queries over different corpora in
    * one session each train and bind their own model. */
  def register(spark: SparkSession, scorer: LangScorer): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("lang_guess"),
      new ExpressionInfo(classOf[LangGuessExpr].getName, "lang_guess"),
      (exprs: Seq[Expression]) => LangGuessExpr(exprs.head, scorer))
  }
}
