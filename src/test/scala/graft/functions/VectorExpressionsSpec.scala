package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The codegen FloatVectorDot must be bit-identical to the portable
  * aggregate(zip_with(...)) form (same element order, same float→double
  * widening), nullable on null inputs, and rejected on wrong types. */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vec_dot is bit-identical to the higher-order-function dot product") {
    VectorExpressions.register(spark)
    val e = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val both = e.select(
      expr("vec_dot(embedding, embedding)").as("native"),
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null inputs yield null; mismatched types are rejected at analysis") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 2.0f)), None: Option[Seq[Float]]))
      .toDF("a", "b")
    val out = df.select(expr("vec_dot(a, b)")).collect()
    assert(out.head.isNullAt(0))
    // ragged vectors yield null (as the zip_with form does), never a
    // truncated-prefix score
    val ragged = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(ragged.select(expr("vec_dot(a, b)")).collect().head.isNullAt(0))
    val bad = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      bad.select(expr("vec_dot(a, b)")).collect(): Unit
    }
  }

  test("fused lsh_codes is bit-identical to unrolled vec_dot against literal hyperplanes") {
    VectorExpressions.register(spark)
    val bits = 6
    val tables = 8
    val dim = 64
    LshCodesExpr.register(spark, bits, tables, dim)
    // the construction lsh_codes replaced: one vec_dot per (table, bit)
    // against the same fmix32-derived ±1 hyperplane
    def hyperplane(t: Int, j: Int): Seq[Float] =
      (0 until dim).map { i =>
        var h = t * 0x9E3779B1 + j * 0x85EBCA77 + i * 0xC2B2AE3D
        h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13; h *= 0xC2B2AE35; h ^= h >>> 16
        if ((h & 1) == 0) 1.0f else -1.0f
      }
    val unrolled = array((0 until tables).map { t =>
      (0 until bits).map { j =>
        when(call_function("vec_dot", col("embedding"),
          typedLit(hyperplane(t, j))) > 0.0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    val e = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val rows = e.select(expr("lsh_codes(embedding)").as("fused"), unrolled.as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // wrong-length embedding -> all-zero codes, matching the NULL-dot form
    import spark.implicits._
    val short = Seq(Seq(1.0f, 2.0f)).toDF("embedding")
    assert(short.select(expr("lsh_codes(embedding)")).collect()
      .head.getSeq[Long](0) == Seq.fill(tables)(0L))
  }

  test("cos_by_id is bit-identical to the join + vec_dot cosine") {
    VectorExpressions.register(spark)
    val e = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    CosByIdExpr.register(spark, CosByIdExpr.build(e.select("vec_id", "embedding")))
    // the join form it replaces: every (a<b) pair's cosine via vec_dot
    // with per-side norms — the exact arithmetic q49's big-corpus path uses
    val side = (id: String, v: String, n: String) =>
      e.select(col("vec_id").as(id), col("embedding").as(v),
        sqrt(expr("vec_dot(embedding, embedding)")).as(n))
    val probes = e.select(col("vec_id").as("a_id")).filter(col("a_id") < 30)
    val pairs = probes.crossJoin(e.select(col("vec_id").as("b_id")))
      .filter(col("a_id") < col("b_id"))
    val rows = pairs
      .join(side("a_id", "ea", "na"), Seq("a_id"))
      .join(side("b_id", "eb", "nb"), Seq("b_id"))
      .select(
        expr("cos_by_id(a_id, b_id)").as("byid"),
        round(expr("vec_dot(ea, eb)") / (col("na") * col("nb"))
          * lit(1000000.0)).cast("long").as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // unknown id -> -2e6 sentinel (below any real cosine), never a crash
    import spark.implicits._
    val missing = Seq((-1L, 0L)).toDF("a", "b")
      .select(expr("cos_by_id(a, b)")).first().getLong(0)
    assert(missing == -2000000L)
  }

  test("int8 quantization: 4x smaller payload, dot error <= 2%, zero/ragged safe") {
    VectorExpressions.register(spark)
    QuantizeExpressions.register(spark)
    val e = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val rows = e.select(
      expr("vec_dot(embedding, embedding)").as("exact"),
      expr("vec_quantize(embedding)").as("qs"),
      size(col("embedding")).as("dim"))
      .select(col("exact"), col("dim"),
        expr("vec_dot_q8(qs.q, qs.scale, qs.q, qs.scale)").as("approx"),
        size(col("qs.q")).as("qlen"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // stored form is 1 byte/dim (+4-byte scale) vs 4 bytes/dim
      assert(r.getAs[Int]("qlen") == r.getAs[Int]("dim"))
      val exact = r.getDouble(0)
      val approx = r.getDouble(2)
      assert(math.abs(approx - exact) <= 0.02 * math.abs(exact) + 1e-6,
        s"quantized self-dot $approx vs $exact")
    }
    import spark.implicits._
    // all-zero vector: scale 0, all-zero q, dot 0 (not NaN)
    val zero = Seq(Seq(0.0f, 0.0f, 0.0f)).toDF("embedding")
      .select(expr("vec_quantize(embedding)").as("qs"))
      .select(expr("vec_dot_q8(qs.q, qs.scale, qs.q, qs.scale)")).first().getDouble(0)
    assert(zero == 0.0)
    // ragged pair -> NULL, same posture as vec_dot
    val ragged = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(expr("vec_quantize(a)").as("qa"), expr("vec_quantize(b)").as("qb"))
      .select(expr("vec_dot_q8(qa.q, qa.scale, qb.q, qb.scale)")).collect()
    assert(ragged.head.isNullAt(0))
  }
}
