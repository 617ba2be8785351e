package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom membership statistics for the bounds sidecar
  * (SURVEY.md §2 P9 — the point-lookup complement of the zone maps).
  *
  * Zone min/max windows answer RANGE questions; they are useless for
  * the other half of the reference's consumption mix (diagram_1.txt:
  * 100-107, "query by a specific id"): a hash-shaped key — UUIDs,
  * salted ids, anything uncorrelated with the lake's layout — spans
  * nearly the full value range in EVERY file, so every window
  * intersects every probe. A Bloom filter is the metadata structure
  * that answers membership instead: `bf_<col>` rides the same sidecar
  * row (and the same atomic publish) as the file's min/max, and the
  * skip rule probes it for equality/IN predicates — a file whose
  * filter rejects every probed value provably holds none of them and
  * drops from the scan listing. False positives only KEEP files
  * (fail-open, like every other sidecar gap); false negatives are
  * impossible, so a drop is always sound.
  *
  * Values are hashed to 64 bits with SQL `xxhash64` BEFORE they reach
  * either side ([[graft.ingest.FileBounds.compute]] builds over
  * `xxhash64(col)`, the skip rule probes `xxhash64(lit)` — the same
  * seed-42 expression, so write and probe agree bit-for-bit for every
  * supported type through one LONG-typed code path). The filter itself
  * is Spark's public `org.apache.spark.util.sketch.BloomFilter` (the
  * `DataFrameStatFunctions.bloomFilter` sketch), sized by
  * (expectedItems, fpp) at the writer.
  *
  * Both expressions are metadata-path only (sidecar rows: one per data
  * file), so the aggregate's CodegenFallback inheritance and the
  * probe's interpreted eval never touch a row-scale hot path.
  */
object BloomExpressions {
  /** Idempotently register both functions in the session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val aggIdent = FunctionIdentifier("graft_bloom_agg")
    if (!registry.functionExists(aggIdent)) {
      registry.registerFunction(
        aggIdent,
        new ExpressionInfo(classOf[BloomBuildAgg].getName, "graft_bloom_agg"),
        (exprs: Seq[Expression]) => {
          def lng(e: Expression, what: String): Long = e match {
            case Literal(v: Long, LongType) => v
            case Literal(v: Int, IntegerType) => v.toLong
            case other => throw new IllegalArgumentException(
              s"graft_bloom_agg: $what must be an integer literal, got $other")
          }
          def dbl(e: Expression): Double = e match {
            case Literal(v: Double, DoubleType) => v
            case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
            case other => throw new IllegalArgumentException(
              s"graft_bloom_agg: fpp must be a double literal, got $other")
          }
          BloomBuildAgg(exprs.head, lng(exprs(1), "expectedItems"), dbl(exprs(2)))
        })
    }
    val probeIdent = FunctionIdentifier("graft_bloom_contains_any")
    if (!registry.functionExists(probeIdent)) {
      registry.registerFunction(
        probeIdent,
        new ExpressionInfo(classOf[BloomMightContainAny].getName,
          "graft_bloom_contains_any"),
        (exprs: Seq[Expression]) => BloomMightContainAny(exprs.head, exprs(1)))
    }
  }
}

/** `graft_bloom_agg(hash BIGINT, expectedItems, fpp) -> BINARY` — the
  * serialized Bloom filter over a group's non-null 64-bit hashes.
  * Null hashes never occur in practice (xxhash64 is null-intolerant at
  * the seed, not null-producing), but are skipped defensively. An
  * empty group serializes a valid empty filter that rejects
  * everything — exactly right for an all-null file under an equality
  * probe. */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "graft_bloom_agg: expectedItems must be positive")
  require(fpp > 0.0 && fpp < 1.0, "graft_bloom_agg: fpp must be in (0, 1)")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg expects a BIGINT hash (use xxhash64), got ${t.sql}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long]): Unit
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other): Unit
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_bloom_contains_any(bf BINARY, hashes ARRAY<BIGINT>) ->
  * BOOLEAN` — true iff the filter might contain ANY of the hashes.
  * One deserialization per row probes the whole IN-list (the reason
  * this exists instead of OR-ing per-value `might_contain` calls,
  * which would re-deserialize the filter per value). NULL filter or
  * NULL hash array → NULL (the caller owns the fail-open coalesce);
  * null ELEMENTS are skipped — a null never equals anything, so it
  * cannot make a file's keep-verdict true. */
case class BloomMightContainAny(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains_any expects (BINARY, ARRAY<BIGINT>), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_contains_any"

  override def nullSafeEval(bfBytes: Any, hashes: Any): Any = {
    val bf = BloomFilter.readFrom(
      new ByteArrayInputStream(bfBytes.asInstanceOf[Array[Byte]]))
    val arr = hashes.asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && bf.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
