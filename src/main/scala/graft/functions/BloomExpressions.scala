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
  /** Shared by [[register]] and [[graft.GraftExtensions]] (extension
    * sessions build AND probe filters via SQL — round 20, r19 ADVICE).
    * Explicit arity checks: a wrong argument count surfaces as a clean
    * analysis-time message, not an IndexOutOfBoundsException dressed as
    * an internal error. */
  private[graft] val aggBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"graft_bloom_agg expects 3 arguments (hash, expectedItems, fpp), " +
          s"got ${exprs.length}")
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
  }

  private[graft] val probeBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_bloom_contains_any expects 2 arguments (bf, hashes), " +
          s"got ${exprs.length}")
    BloomMightContainAny(exprs.head, exprs(1))
  }

  private[graft] val autoBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 4)
      throw new IllegalArgumentException(
        s"graft_bloom_agg_auto expects 4 arguments (hash, floorItems, " +
          s"ceilItems, fpp), got ${exprs.length}")
    def lng(e: Expression, what: String): Long = e match {
      case Literal(v: Long, LongType) => v
      case Literal(v: Int, IntegerType) => v.toLong
      case other => throw new IllegalArgumentException(
        s"graft_bloom_agg_auto: $what must be an integer literal, got $other")
    }
    def dbl(e: Expression): Double = e match {
      case Literal(v: Double, DoubleType) => v
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"graft_bloom_agg_auto: fpp must be a double literal, got $other")
    }
    BloomBuildAutoAgg(exprs.head, lng(exprs(1), "floorItems"),
      lng(exprs(2), "ceilItems"), dbl(exprs(3)))
  }

  /** Idempotently register all three functions in the session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val aggIdent = FunctionIdentifier("graft_bloom_agg")
    if (!registry.functionExists(aggIdent)) {
      registry.registerFunction(
        aggIdent,
        new ExpressionInfo(classOf[BloomBuildAgg].getName, "graft_bloom_agg"),
        aggBuilder)
    }
    val autoIdent = FunctionIdentifier("graft_bloom_agg_auto")
    if (!registry.functionExists(autoIdent)) {
      registry.registerFunction(
        autoIdent,
        new ExpressionInfo(classOf[BloomBuildAutoAgg].getName,
          "graft_bloom_agg_auto"),
        autoBuilder)
    }
    val probeIdent = FunctionIdentifier("graft_bloom_contains_any")
    if (!registry.functionExists(probeIdent)) {
      registry.registerFunction(
        probeIdent,
        new ExpressionInfo(classOf[BloomMightContainAny].getName,
          "graft_bloom_contains_any"),
        probeBuilder)
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

/** The auto-sizing aggregation buffer: hashes are BUFFERED verbatim
  * while the group stays small (so the filter can be sized from the
  * group's ACTUAL count at eval time), and promoted to one
  * ceiling-sized filter once the group outgrows [[BloomBuildAutoAgg.BufferCapItems]]
  * — bounding buffer memory at ~4 MB per in-flight group while files
  * that large deserve the near-ceiling filter anyway. `bf` is non-null
  * iff promoted; all promoted filters share the (ceil, fpp) size, so
  * `mergeInPlace` never faces incompatible bit widths.
  *
  * The hash buffer is a PRIMITIVE `Array[Long]` grown manually (r20
  * ADVICE): an `ArrayBuffer[Long]` boxes every element (~16-20 B/slot
  * with the reference), so the documented ~4 MB cap was really
  * ~16-20 MB per in-flight group multiplied across concurrent groups
  * in the bounds hash aggregate; the flat array makes the 512k cap
  * actually bound memory at 8 B/slot. `len` is the filled prefix. */
private[functions] final class BloomAutoBuffer(
    var hashes: Array[Long],
    var len: Int,
    var bf: BloomFilter,
    var n: Long) {
  def add(h: Long, cap: Long): Unit = {
    if (len == hashes.length) {
      // doubling clamped to cap+1 (promote fires past cap), but never
      // below len+1: a merge of two near-full buffers appends past the
      // clamp before its promote check runs
      val grown = new Array[Long](math.max(
        math.min(math.max(hashes.length.toLong * 2, 16L), cap + 1L),
        len + 1L).toInt)
      System.arraycopy(hashes, 0, grown, 0, len)
      hashes = grown
    }
    hashes(len) = h
    len += 1
  }
  def foreachHash(f: Long => Unit): Unit = {
    var i = 0
    while (i < len) { f(hashes(i)); i += 1 }
  }
}

/** `graft_bloom_agg_auto(hash BIGINT, floorItems, ceilItems, fpp) ->
  * STRUCT<bf BINARY, n_items BIGINT, fpp DOUBLE>` — the per-group
  * Bloom filter SIZED FROM THE GROUP'S OWN ROW COUNT (round 20, r19
  * verdict #2): the caller supplies a floor/ceiling, the aggregate
  * sizes each filter at `clamp(n, floor, ceil)` items. The fixed-size
  * [[BloomBuildAgg]] forced one expectedItems literal across a store
  * whose file sizes can differ 100× — oversized filters bloat the
  * sidecar, undersized ones silently lose their drop power to false
  * positives. `fpp` in the result is the filter's ACHIEVED
  * false-positive estimate after insertion (`BloomFilter.expectedFpp`),
  * recorded beside the filter so an operator can audit drop power
  * without probing ([[graft.ingest.FileBounds]] publishes it as
  * `bfpp_<col>`).
  *
  * Metadata-path only, like its fixed-size sibling: one group per data
  * file, never a row-scale hot path. */
case class BloomBuildAutoAgg(
    child: Expression,
    floorItems: Long,
    ceilItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomAutoBuffer] {

  require(floorItems > 0 && ceilItems >= floorItems,
    "graft_bloom_agg_auto: need 0 < floorItems <= ceilItems")
  require(fpp > 0.0 && fpp < 1.0, "graft_bloom_agg_auto: fpp must be in (0, 1)")

  import BloomBuildAutoAgg.BufferCapItems

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg_auto expects a BIGINT hash (use xxhash64), got ${t.sql}")
  }
  override def dataType: DataType = BloomBuildAutoAgg.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg_auto"

  private def cap: Long = math.min(ceilItems, BufferCapItems)

  override def createAggregationBuffer(): BloomAutoBuffer =
    new BloomAutoBuffer(new Array[Long](0), 0, null, 0L)

  private def promote(buf: BloomAutoBuffer): Unit = {
    val f = BloomFilter.create(ceilItems, fpp)
    buf.foreachHash(f.putLong(_): Unit)
    buf.bf = f
    buf.hashes = null
    buf.len = 0
  }

  override def update(buf: BloomAutoBuffer, input: InternalRow): BloomAutoBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      if (buf.bf != null) buf.bf.putLong(v.asInstanceOf[Long]): Unit
      else {
        buf.add(v.asInstanceOf[Long], cap)
        if (buf.len > cap) promote(buf)
      }
    }
    buf
  }

  override def merge(buf: BloomAutoBuffer, other: BloomAutoBuffer): BloomAutoBuffer = {
    buf.n += other.n
    (buf.bf, other.bf) match {
      case (null, null) =>
        // promote mid-loop once the cap is crossed: appending the whole
        // tail first would re-grow the clamped array one slot at a time
        other.foreachHash { h =>
          if (buf.bf != null) buf.bf.putLong(h): Unit
          else {
            buf.add(h, cap)
            if (buf.len > cap) promote(buf)
          }
        }
      case (null, f) =>
        buf.foreachHash(f.putLong(_): Unit)
        buf.bf = f; buf.hashes = null; buf.len = 0
      case (f, null) => other.foreachHash(f.putLong(_): Unit)
      case (f, g) => f.mergeInPlace(g): Unit // same (ceil, fpp) size by construction
    }
    buf
  }

  override def eval(buf: BloomAutoBuffer): Any = {
    val f =
      if (buf.bf != null) buf.bf
      else {
        // sized from the ACTUAL count — row count upper-bounds distinct
        // count, so fpp only ever lands at-or-below the target
        val sized = BloomFilter.create(
          math.max(floorItems, math.min(buf.len.toLong, ceilItems)), fpp)
        buf.foreachHash(sized.putLong(_): Unit)
        sized
      }
    val out = new ByteArrayOutputStream()
    f.writeTo(out)
    InternalRow(out.toByteArray, buf.n, f.expectedFpp())
  }

  override def serialize(buf: BloomAutoBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.n)
    if (buf.bf != null) { out.writeByte(1); buf.bf.writeTo(out) }
    else {
      out.writeByte(0)
      out.writeInt(buf.len)
      buf.foreachHash(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomAutoBuffer = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    if (in.readByte() == 1)
      new BloomAutoBuffer(null, 0, BloomFilter.readFrom(in), n)
    else {
      val k = in.readInt()
      val arr = new Array[Long](k)
      var i = 0
      while (i < k) { arr(i) = in.readLong(); i += 1 }
      new BloomAutoBuffer(arr, k, null, n)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BloomBuildAutoAgg {
  /** Raw-hash buffering bound: past 512k longs (~4 MB) the group is
    * promoted to a ceiling-sized filter — a file that large deserves
    * the near-ceiling size regardless, so nothing is lost. */
  val BufferCapItems = 524288L

  val resultType: StructType = StructType(Seq(
    StructField("bf", BinaryType, nullable = false),
    StructField("n_items", LongType, nullable = false),
    StructField("fpp", DoubleType, nullable = false)))
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
