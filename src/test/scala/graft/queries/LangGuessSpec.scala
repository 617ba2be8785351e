package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q31 is a model-producing query with no SQL oracle; what it owes is
  * (a) determinism — identical output across runs, (b) mass conservation
  * — every classifiable document appears exactly once in the confusion
  * matrix, and (c) correctness on a corpus whose languages are actually
  * separable (the driver corpus's synthetic vocab barely differs by
  * language, so accuracy there is not a meaningful assertion). */
class LangGuessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(dir: String): Seq[(String, String, Long)] =
    TextOps.langConfusion(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted

  test("deterministic across runs and conserves document mass") {
    val a = run(sf)
    val b = run(sf)
    assert(a == b)
    val classifiable = graft.engine.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 3).count()
    assert(a.map(_._3).sum == classifiable)
    // the driver-visible q31 self-check rows: every accuracy floor holds
    val check = TextOps.defs("q31_lang_guess")(spark, sf).collect()
    assert(check.nonEmpty && check.forall(_.getInt(2) == 1),
      s"q31 accuracy floor broken: ${check.toSeq}")
  }

  test("classifies perfectly when language vocabularies are disjoint") {
    import spark.implicits._
    val vocab = Map(
      "aa" -> (0 until 40).map(i => s"alpha$i bravo$i arc$i"),
      "qq" -> (0 until 40).map(i => s"quark$i quill$i qat$i"),
      "zz" -> (0 until 40).map(i => s"zebra$i zilch$i zoo$i"))
    val rows = vocab.toSeq.flatMap { case (lang, texts) =>
      texts.zipWithIndex.map { case (t, i) =>
        (lang.hashCode.toLong * 1000 + i, s"$t $t $t", lang)
      }
    }
    val dir = Files.createTempDirectory("graft-lang").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = run(dir)
    assert(out.forall { case (lang, guessed, _) => lang == guessed },
      s"off-diagonal mass: ${out.filterNot(t => t._1 == t._2)}")
  }
}
