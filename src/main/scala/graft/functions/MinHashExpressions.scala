package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen MinHash signatures for the near-dup path (SURVEY.md §2.10 X2).
  *
  * The portable form — `transform(sh, x -> xxhash64(j, x))` × 64 hash
  * functions — re-hashes every shingle STRING 64 times through the
  * interpreted higher-order-function path. The standard fix is one
  * string hash per shingle plus k cheap 64-bit mixes (a seeded murmur
  * finalizer per hash function): O(|sh| · (strlen + k)) instead of
  * O(|sh| · k · strlen), all inside whole-stage codegen. At 100 TB the
  * signature pass is the dominant dedup cost, so this is the operator's
  * scale path; the LSH banding and exact-Jaccard verification above it
  * are unchanged, and DedupSpec re-validates recall/precision against
  * brute force.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), MinHashSignature.BaseSeed)
      var j = 0
      while (j < numHashes) {
        val m = MinHashSignature.mix(h, MinHashSignature.seed(j))
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seeds = ctx.addReferenceObj("seeds",
        Array.tabulate(numHashes)(MinHashSignature.seed), "long[]")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |    .hashUTF8String($a.getUTF8String($i), ${MinHashSignature.BaseSeed}L);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $m = $h ^ $seeds[$j];
         |    $m ^= $m >>> 33; $m *= 0xFF51AFD7ED558CCDL;
         |    $m ^= $m >>> 33; $m *= 0xC4CEB9FE1A85EC53L;
         |    $m ^= $m >>> 33;
         |    if ($m < $sig[$j]) $sig[$j] = $m;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val BaseSeed = 42L

  /** Per-hash-function xor seed (golden-ratio sequence, murmur-mixed). */
  def seed(j: Int): Long = mixRaw(0x9E3779B97F4A7C15L * (j + 1))

  /** murmur3 fmix64 of (h ^ seed) — the per-function mix. */
  def mix(h: Long, s: Long): Long = mixRaw(h ^ s)

  private def mixRaw(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  /** Idempotently register `minhash_sig` (64 hashes) in the session. */
  def register(spark: SparkSession, numHashes: Int): Unit = {
    val ident = FunctionIdentifier("minhash_sig")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
        (exprs: Seq[Expression]) => MinHashSignature(exprs.head, numHashes))
    }
  }
}

/** Codegen 64-bit SimHash over a token array: one xxhash64 per token
  * (bit-compatible with SQL `xxhash64(token)`, seed 42) and 64 bit-votes,
  * replacing the interpreted nested aggregate/zip_with form — same
  * O(tokens + 64) shape and same output bits, so the SQL brute-force
  * cross-check in DedupSpec still validates it. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var k = 0
      while (k < 64) {
        votes(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) out |= 1L << k
      k += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |    .hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $k = 0; $k < 64; $k++) {
         |    $votes[$k] += ((($h >>> $k) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $out = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($votes[$k] > 0) $out |= 1L << $k;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Idempotently register `simhash64` in the session. */
  def register(spark: SparkSession): Unit = {
    val ident = FunctionIdentifier("simhash64")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (exprs: Seq[Expression]) => SimHash64(exprs.head))
    }
  }
}
