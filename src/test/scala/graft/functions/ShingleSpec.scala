package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** shingle3 must be BYTE-identical to the portable form it replaces —
  * the dedup oracles compute Jaccard from these arrays, so any
  * divergence (empty tokens, trailing spaces, order, dedup) would shift
  * jac_e6 values and turn oracle rows red. Asserted element-for-element
  * (order included: array_distinct keeps first occurrence) on crafted
  * edge cases and on the real corpus. */
class ShingleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The portable construction shingle3 replaces (the pre-r8 shingled()). */
  private def portable(c: org.apache.spark.sql.Column) = {
    val toks = split(c, " ")
    when(size(toks) >= 3, array_distinct(expr(
      "transform(sequence(0, size(split(text, ' '))-3), " +
        "i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], split(text, ' ')[i+2]))")))
  }

  test("parity with the portable split/transform/array_distinct form") {
    import spark.implicits._
    Shingle3.register(spark)
    val cases = Seq(
      "a b c d e",                    // plain
      "a b c",                        // exactly one gram
      "a b",                          // too short -> old form filters, new form empty
      "",                             // empty text
      "x",                            // single token
      "a  b c",                       // empty token from double space
      "a b c ",                       // trailing space -> trailing empty token
      " a b c",                       // leading space
      "a a a a a",                    // dedup: identical grams collapse
      "tok1 tok2 tok1 tok2 tok1",     // repeated pattern, order preserved
      "é ü 漢字 b c",                 // multi-byte UTF-8 tokens
      "a b c d e f g h i j")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = df.select(col("doc_id"), expr("shingle3(text)").as("got"),
        portable(col("text")).as("want"))
      .collect()
    rows.foreach { r =>
      val got = r.getSeq[String](1)
      val want = Option(r.getSeq[String](2)).getOrElse(Seq.empty)
      assert(got == want, s"doc ${r.getLong(0)} ('${cases(r.getLong(0).toInt)}'): $got != $want")
    }
  }

  test("parity on the real documents corpus, order included") {
    Shingle3.register(spark)
    val docs = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bad = docs.select(col("doc_id"), expr("shingle3(text)").as("got"),
        portable(col("text")).as("want"))
      .filter(not(coalesce(col("got") === col("want"), lit(false))) &&
        not(size(col("got")) === 0 && col("want").isNull))
      .count()
    assert(bad == 0, s"$bad docs diverge from the portable construction")
  }
}
