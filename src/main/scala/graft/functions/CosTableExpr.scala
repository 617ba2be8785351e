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
final class CosTable(private[functions] val ids: Array[Long],
                     private[functions] val vecs: Array[Array[Float]]) extends Serializable {
  // same primitive open-addressing id→slot layout as [[QuantCosTable]]
  // (see there for why boxed map lookups matter at collision scale)
  @transient private lazy val (keyArr, slotArr, minSlot) = {
    var cap = 4
    while (cap < ids.length * 2) cap <<= 1
    val ks = Array.fill(cap)(Long.MinValue)
    val vs = new Array[Int](cap)
    var minIdx = -1
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      if (id == Long.MinValue) minIdx = i
      else {
        var h = (java.lang.Long.hashCode(id * -7046029254386353131L) & (cap - 1))
        while (ks(h) != Long.MinValue) h = (h + 1) & (cap - 1)
        ks(h) = id
        vs(h) = i
      }
      i += 1
    }
    (ks, vs, minIdx)
  }

  private def slotOf(id: Long): Int = {
    if (id == Long.MinValue) return minSlot
    val ks = keyArr
    val mask = ks.length - 1
    var h = (java.lang.Long.hashCode(id * -7046029254386353131L) & mask)
    while (true) {
      val k = ks(h)
      if (k == id) return slotArr(h)
      if (k == Long.MinValue) return -1
      h = (h + 1) & mask
    }
    -1
  }

  @transient private lazy val norms: Array[Double] = vecs.map { v =>
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def cosE6(a: Long, b: Long): Long = {
    val ia = slotOf(a)
    val ib = slotOf(b)
    if (ia < 0 || ib < 0) return -2000000L
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

/** Int8-scalar-quantized twin of [[CosTable]] (the q64 SQ8 layout as an
  * id-addressed driver table): per vector, `scale = max|x| / 127`,
  * `q_i = round(x_i / scale)` packed into one flat byte array, and a
  * precomputed `factor_i = scale_i / ‖v_i‖` so the approximate cosine
  * is one int8 dot + two multiplies:
  * `qcos(a,b) = (Σ qa·qb) · factor_a · factor_b`.
  *
  * PURPOSE: a conservative PRE-GATE in front of exact verification
  * (q49). The quantization error of the cosine is bounded: with
  * `|x_i − q_i·s| ≤ s/2` and `s ≤ ‖v‖/127`, the dot error is at most
  * `(s_a/2)·Σ|b_i| + (s_b/2)·Σ|a_i| + (s_a s_b/4)·d ≤
  * (√d/127 + d/(4·127²))·‖a‖‖b‖` — for d = 64 that is < 0.064 of the
  * norm product, so a gate at `τ − 70000` (e6 units, margin > bound)
  * can never drop a pair whose exact cosine meets τ = 450000. An
  * unknown id returns +2e6 — ABOVE any gate, the conservative
  * direction for a filter that exact verification backstops (the exact
  * table maps unknown ids to −2e6 and drops them there). The byte
  * table is 4× smaller than the float corpus, and the int accumulator
  * never overflows (127²·d ≤ 2^20). */
final class QuantCosTable(ids: Array[Long], dim: Int, codes: Array[Byte],
                          factors: Array[Double]) extends Serializable {
  // Open-addressing primitive id→slot probe table. The gate evaluates
  // ONCE PER RAW COLLISION (0.73B rows at the x100 tier), so the two
  // boxed java.util.HashMap lookups + a BigDecimal per call of the
  // exact table's layout dominated the whole query (~730 ns/eval
  // measured, 12 of 20 s); primitive linear probing + Math.round holds
  // the eval under ~100 ns. EMPTY slots are keyed Long.MIN_VALUE — an
  // actual MIN_VALUE id (possible under xxhash64 keying) is parked in
  // a dedicated slot instead of the table.
  @transient private lazy val (keyArr, slotArr, minSlot) = {
    var cap = 4
    while (cap < ids.length * 2) cap <<= 1
    val ks = Array.fill(cap)(Long.MinValue)
    val vs = new Array[Int](cap)
    var minIdx = -1
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      if (id == Long.MinValue) minIdx = i
      else {
        var h = (java.lang.Long.hashCode(id * -7046029254386353131L) & (cap - 1))
        while (ks(h) != Long.MinValue) h = (h + 1) & (cap - 1)
        ks(h) = id
        vs(h) = i
      }
      i += 1
    }
    (ks, vs, minIdx)
  }

  private def slotOf(id: Long): Int = {
    if (id == Long.MinValue) return minSlot
    val ks = keyArr
    val mask = ks.length - 1
    var h = (java.lang.Long.hashCode(id * -7046029254386353131L) & mask)
    while (true) {
      val k = ks(h)
      if (k == id) return slotArr(h)
      if (k == Long.MinValue) return -1
      h = (h + 1) & mask
    }
    -1
  }

  def qcosE6(a: Long, b: Long): Long = {
    val ia = slotOf(a)
    val ib = slotOf(b)
    if (ia < 0 || ib < 0) return 2000000L
    var s = 0
    var i = ia * dim
    var j = ib * dim
    val end = i + dim
    while (i < end) { s += codes(i) * codes(j); i += 1; j += 1 }
    val x = s * factors(ia) * factors(ib) * 1000000.0
    if (!java.lang.Double.isFinite(x)) return 2000000L
    // Math.round, not BigDecimal: an approximate gate value needs no
    // exact HALF_UP parity (they differ only at negative exact-half
    // ulps, absorbed by the gate margin), and the BigDecimal allocation
    // per collision was measurable at the 0.73B-row scale.
    Math.round(x)
  }
}

/** `qcos_by_id(a_id, b_id)` — the quantized pre-gate expression; same
  * broadcast-handle codegen discipline as [[CosByIdExpr]]. */
case class QuantCosByIdExpr(left: Expression, right: Expression,
                            bcast: Broadcast[QuantCosTable])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"qcos_by_id expects (bigint, bigint), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "qcos_by_id"

  override def nullSafeEval(a: Any, b: Any): Any =
    bcast.value.qcosE6(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // same shared-member discipline as CosByIdExpr (see there)
      val refIdx = {
        val i = ctx.references.indexWhere(_.asInstanceOf[AnyRef] eq bcast)
        if (i >= 0) i else { ctx.references += bcast; ctx.references.size - 1 }
      }
      val bc = s"((${classOf[Broadcast[QuantCosTable]].getName}) references[$refIdx] /* qcosTableBc */)"
      val t = s"qcosTable_${bcast.id}"
      val cls = classOf[QuantCosTable].getName
      ctx.addImmutableStateIfNotExists(cls, t, v => s"$v = ($cls) $bc.value();")
      s"${ev.value} = $t.qcosE6($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): QuantCosByIdExpr =
    copy(left = newLeft, right = newRight)
}

object QuantCosByIdExpr {
  /** Quantize an already-collected [[CosTable]] corpus — one driver
    * pass, no second collect. Zero vectors get factor 0 (their qcos is
    * 0 against everything, matching their undefined exact cosine being
    * dropped by the exact table's −2e6). */
  def buildFrom(t: CosTable): QuantCosTable = {
    val n = t.ids.length
    val dim = if (n == 0) 0 else t.vecs(0).length
    val codes = new Array[Byte](n * dim)
    val factors = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = t.vecs(i)
      var mx = 0.0
      var nrm = 0.0
      var k = 0
      while (k < v.length) {
        val x = math.abs(v(k).toDouble)
        if (x > mx) mx = x
        nrm += v(k).toDouble * v(k).toDouble
        k += 1
      }
      nrm = math.sqrt(nrm)
      val scale = mx / 127.0
      if (scale > 0 && nrm > 0) {
        factors(i) = scale / nrm
        k = 0
        while (k < v.length) {
          codes(i * dim + k) = math.round(v(k) / scale).toByte
          k += 1
        }
      }
      i += 1
    }
    new QuantCosTable(t.ids, dim, codes, factors)
  }

  private var lastBcast: Broadcast[QuantCosTable] = _

  /** (Re-)register `qcos_by_id`; same rebind-unpersist discipline as
    * [[CosByIdExpr.register]]. */
  def register(spark: SparkSession, table: QuantCosTable): Unit = synchronized {
    val bcast = spark.sparkContext.broadcast(table)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("qcos_by_id"),
      new ExpressionInfo(classOf[QuantCosByIdExpr].getName, "qcos_by_id"),
      (exprs: Seq[Expression]) => QuantCosByIdExpr(exprs.head, exprs(1), bcast))
    if (lastBcast != null) lastBcast.unpersist(blocking = false)
    lastBcast = bcast
  }
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
