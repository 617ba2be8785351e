package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.broadcast.Broadcast

/** Id-addressed cosine over a driver-resident embedding table
  * (SURVEY.md §2.10 X2/X3; q49's broadcastable-corpus verification).
  *
  * When the whole embedding table fits in executor memory, verifying LSH
  * collision pairs via two hash joins back to the corpus pays a 256-byte
  * array copy per join per pair — the joins, not the arithmetic, dominate.
  * This expression is the join-free form: the corpus ships as a real
  * `sparkContext.broadcast` — fetched from the block manager and
  * deserialized ONCE per executor, not once per task the way an
  * `addReferenceObj` table riding the task binary would be — and
  * verification becomes one projection computing `cos_by_id(a_id, b_id)`
  * per candidate row. Only the (tiny) broadcast handle rides the task
  * binary; the lazy id→index map and norm cache therefore also build
  * once per executor.
  *
  * Value parity with the join + `vec_dot` form (bit-asserted in
  * VectorExpressionsSpec): dot accumulates float→double left-to-right
  * exactly like [[FloatVectorDot]]; norms are sqrt(vec_dot(v,v)) computed
  * once per vector; the e6 scaling matches Spark's `round(x, 0)` on
  * doubles (BigDecimal HALF_UP). An unknown id or a length-mismatched
  * pair yields −2e6 — below any real cosine, so threshold filters drop it
  * just as they drop the join form's NULL.
  */
final class CosTable(ids: Array[Long], vecs: Array[Array[Float]]) extends Serializable {
  @transient private lazy val index: java.util.HashMap[java.lang.Long, Integer] = {
    val m = new java.util.HashMap[java.lang.Long, Integer](ids.length * 2)
    var i = 0
    while (i < ids.length) { m.put(ids(i), i); i += 1 }
    m
  }
  @transient private lazy val norms: Array[Double] = vecs.map { v =>
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def cosE6(a: Long, b: Long): Long = {
    val ia = index.get(a)
    val ib = index.get(b)
    if (ia == null || ib == null) return -2000000L
    val va = vecs(ia)
    val vb = vecs(ib)
    if (va.length != vb.length) return -2000000L
    var s = 0.0
    var i = 0
    while (i < va.length) { s += va(i).toDouble * vb(i).toDouble; i += 1 }
    val x = s / (norms(ia) * norms(ib)) * 1000000.0
    if (!java.lang.Double.isFinite(x)) return -2000000L
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
  }
}

/** `cos_by_id(a_id, b_id)` — round(cos(corpus[a], corpus[b]) * 1e6) as
  * long, bound to a broadcast corpus at registration. */
case class CosByIdExpr(left: Expression, right: Expression,
                       bcast: Broadcast[CosTable])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cos_by_id expects (bigint, bigint), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cos_by_id"

  override def nullSafeEval(a: Any, b: Any): Any =
    bcast.value.cosE6(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Reference the broadcast HANDLE (bytes, not the table); .value()
      // resolves to the executor-local singleton. The member name is
      // keyed to the broadcast id (NOT freshName) so every cos_by_id
      // occurrence in one generated class shares a single member and one
      // value() resolution — freshName would make the if-not-exists
      // dedup vacuous. That sharing requires the init statement to be
      // byte-identical across occurrences, so the references slot is
      // deduplicated by identity too (addReferenceObj would hand each
      // occurrence a fresh slot and trip the "already defined with
      // different initialization" assertion).
      val refIdx = {
        val i = ctx.references.indexWhere(_.asInstanceOf[AnyRef] eq bcast)
        if (i >= 0) i else { ctx.references += bcast; ctx.references.size - 1 }
      }
      val bc = s"((${classOf[Broadcast[CosTable]].getName}) references[$refIdx] /* cosTableBc */)"
      val t = s"cosTable_${bcast.id}"
      val cls = classOf[CosTable].getName
      ctx.addImmutableStateIfNotExists(cls, t, v => s"$v = ($cls) $bc.value();")
      s"${ev.value} = $t.cosE6($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosByIdExpr =
    copy(left = newLeft, right = newRight)
}

object CosByIdExpr {
  /** Collect (vec_id, embedding) to the driver — callers gate on corpus
    * row count; the table is a few hundred MB at the 1M-row cap. */
  def build(corpus: DataFrame): CosTable = {
    val rows = corpus.collect()
    val ids = new Array[Long](rows.length)
    val vecs = new Array[Array[Float]](rows.length)
    var i = 0
    while (i < rows.length) {
      ids(i) = rows(i).getLong(0)
      vecs(i) = rows(i).getSeq[Float](1).toArray
      i += 1
    }
    new CosTable(ids, vecs)
  }

  /** The previous binding's broadcast, dropped eagerly on rebind. */
  private var lastBcast: Broadcast[CosTable] = _

  /** (Re-)register `cos_by_id` bound to this corpus (per-query binding,
    * like `lsh_codes`). Broadcasts the table so executors materialize it
    * once each. Rebinding unpersists the PREVIOUS broadcast
    * (non-blocking) instead of leaving a potentially hundreds-of-MB
    * corpus copy in executor block managers until the context cleaner
    * notices; unpersist only drops cached executor copies — in-flight
    * queries holding the old handle can refetch — so it is safe. */
  def register(spark: SparkSession, table: CosTable): Unit = synchronized {
    val bcast = spark.sparkContext.broadcast(table)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cos_by_id"),
      new ExpressionInfo(classOf[CosByIdExpr].getName, "cos_by_id"),
      (exprs: Seq[Expression]) => CosByIdExpr(exprs.head, exprs(1), bcast))
    if (lastBcast != null) lastBcast.unpersist(blocking = false)
    lastBcast = bcast
  }
}
