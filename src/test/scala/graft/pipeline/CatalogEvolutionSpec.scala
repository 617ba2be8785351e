package graft.pipeline

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Catalog schema evolution on append (psuedo_code.txt:353-363): the
  * registered schema is a catalog fact — a drifted append must evolve
  * the catalog first (`ALTER TABLE ADD COLUMNS`), after which
  * `spark.table` serves both generations (old rows NULL in the new
  * column). An append that skips the evolution step is REJECTED, which
  * is the guard that keeps lake and catalog schemas in sync. */
class CatalogEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ALTER TABLE ADD COLUMNS evolves the served schema; unevolved drifted appends are rejected") {
    import spark.implicits._
    val tbl = "evo_spec_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq((1L, "a", 1.0), (2L, "a", 2.0)).toDF("id", "grp", "v").write.saveAsTable(tbl)
    assert(!spark.table(tbl).schema.fieldNames.contains("note"),
      "pre-drift schema must not carry the drifted column")

    // drifted batch WITHOUT catalog evolution: rejected, table unchanged
    intercept[AnalysisException] {
      Seq((3L, "b", 3.0, "x")).toDF("id", "grp", "v", "note")
        .write.mode("append").saveAsTable(tbl)
    }
    assert(spark.table(tbl).count() == 2)

    // evolve the catalog, then append — the reference's writer flow
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (note STRING)")
    assert(spark.table(tbl).schema.fieldNames.contains("note"))
    Seq((3L, "b", 3.0, "x")).toDF("id", "grp", "v", "note")
      .write.mode("append").saveAsTable(tbl)

    val served = spark.table(tbl)
    assert(served.count() == 3)
    assert(served.filter(col("note").isNull).count() == 2, "pre-drift rows read NULL")
    assert(served.filter(col("note") === "x").select("id").collect().map(_.getLong(0)).toSeq
      == Seq(3L))
    spark.sql(s"DROP TABLE IF EXISTS $tbl"): Unit
  }
}
