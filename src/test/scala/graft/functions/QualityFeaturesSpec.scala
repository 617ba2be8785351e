package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.TextOps

/** Exact parity of the codegen `quality_features` byte walk with the
  * portable Spark forms it replaced — element-for-element on the real
  * corpus plus adversarial spacing/unicode fixtures. The portable forms
  * ARE the oracle semantics (q29/q71 hash-match them in DuckDB), so
  * this equality is what lets the q77/q70/q74 oracle rows stay green
  * after the swap. */
class QualityFeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def portable(df: DataFrame): DataFrame =
    df.withColumn("toks", split(col("text"), " "))
      .select(col("text"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(filter(col("toks"), t => t.isInCollection(TextOps.Stopwords)))
          .cast("long").as("n_stop"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("nospace"),
        when(size(col("toks")) >= 2,
          size(array_distinct(expr(
            "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1]))")))
            .cast("long")).otherwise(0L).as("bi_distinct"))

  private def codegen(df: DataFrame): DataFrame = {
    QualityFeatures.register(df.sparkSession)
    df.select(col("text"), expr("quality_features(text)").as("f"))
      .select(col("text"), col("f.n_tokens"), col("f.n_stop"),
        col("f.nospace"), col("f.bi_distinct"))
  }

  private def assertParity(df: DataFrame): Unit = {
    val p = portable(df).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val c = codegen(df).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(p.keySet == c.keySet)
    for ((k, pv) <- p)
      assert(pv == c(k), s"feature mismatch on '$k': portable $pv vs codegen ${c(k)}")
  }

  test("parity on the sf0.001 corpus") {
    assertParity(graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("text"))
  }

  test("parity on adversarial spacing, stopwords, repeats, unicode") {
    import spark.implicits._
    val rows = Seq(
      "", "a", "a b", "a  b", " a", "a ", "  ",
      "the the the", "the a of and to in",
      "x y x y x y", "tok0 tok0 tok0",
      "é ü the naïve café", "one两 three两 one两 three两",
      "trailing the  double  spaces in  a of")
    assertParity(rows.toDF("text"))
  }

  test("parity on 150 pinned-seed random docs (stopwords, empties, unicode mix)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // empty tokens in the vocab produce repeated-space runs when joined
    val tok = Gen.oneOf("the", "a", "of", "and", "to", "in",
      "x", "yy", "zzz", "é两", "tok1", "tok2", "")
    val doc = for {
      n <- Gen.chooseNum(0, 60)
      ts <- Gen.listOfN(n, tok)
    } yield ts.mkString(" ")
    val texts = (0 until 150)
      .map(i => doc.pureApply(Gen.Parameters.default, Seed(31L + i))).distinct
    assertParity(texts.toDF("text"))
  }
}
