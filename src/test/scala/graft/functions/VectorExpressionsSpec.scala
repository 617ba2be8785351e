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
}
