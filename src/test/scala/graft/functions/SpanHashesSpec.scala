package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The codegen `span_hashes` walk vs the portable window-string form:
  * q76's output depends only on the hash's EQUALITY CLASSES (the DuckDB
  * oracle joins window STRINGS), so the property to pin is a per-row
  * BIJECTION between hash values and window strings — same positions
  * emitted, equal strings ⇒ equal hashes (the single-space-slice
  * argument), distinct strings ⇒ distinct hashes (collision-freeness
  * on this corpus). */
class SpanHashesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val W = 20

  private def portable(df: DataFrame): DataFrame =
    df.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= W)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(t) - $W), i -> " +
          s"struct(i AS pos, array_join(slice(t, i + 1, $W), ' ') AS w))")).as("x"))
      .select(col("doc_id"), col("x.pos").cast("long").as("pos"), col("x.w"))

  private def codegen(df: DataFrame): DataFrame = {
    SpanHashes.register(df.sparkSession, W)
    df.select(col("doc_id"), posexplode(expr("span_hashes(text)")).as(Seq("pos", "wh")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("wh"))
  }

  private def assertBijection(df: DataFrame): Unit = {
    val joined = portable(df).join(codegen(df), Seq("doc_id", "pos"), "full")
    assert(joined.filter(col("w").isNull || col("wh").isNull).count() == 0,
      "codegen and portable forms emitted different (doc_id, pos) sets")
    val strToHash = joined.groupBy("w").agg(countDistinct("wh").as("n"))
      .filter(col("n") =!= 1).count()
    assert(strToHash == 0, "equal window strings mapped to different hashes")
    val hashToStr = joined.groupBy("wh").agg(countDistinct("w").as("n"))
      .filter(col("n") =!= 1).count()
    assert(hashToStr == 0, "hash collision across distinct window strings")
  }

  test("bijection on the sf0.001 corpus") {
    assertBijection(graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text"))
  }

  test("bijection on adversarial spacing, shared spans, short docs") {
    import spark.implicits._
    val shared = (0 until 30).map(i => s"s$i").mkString(" ")
    val rows = Seq(
      1L -> ((0 until 10).map(i => s"a$i").mkString(" ") + " " + shared),
      2L -> (shared + " " + (0 until 10).map(i => s"b$i").mkString(" ")),
      3L -> ("c0  c1 " + (0 until 25).map(i => s"c$i").mkString(" ")), // double space
      4L -> "too short",
      5L -> (0 until W).map(i => s"d$i").mkString(" "))               // exactly W
    assertBijection(rows.toDF("doc_id", "text"))
  }

  test("bijection on 120 pinned-seed random docs over a small vocab") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small vocab → windows repeat across docs, exercising the
    // equal-strings ⇒ equal-hashes direction, not just distinctness
    val tok = Gen.oneOf("a", "b", "cc", "the", "é两", "")
    val doc = for {
      n <- Gen.chooseNum(0, 50)
      ts <- Gen.listOfN(n, tok)
    } yield ts.mkString(" ")
    val rows = (0 until 120).map(i =>
      (i.toLong, doc.pureApply(Gen.Parameters.default, Seed(47L + i))))
    assertBijection(rows.toDF("doc_id", "text"))
  }
}
