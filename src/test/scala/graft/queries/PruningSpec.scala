package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q52's property: when the pruning predicate comes from a JOINED
  * dimension rather than a literal, Catalyst still prunes the
  * partitioned scan — via a dynamicpruning subquery in the partition
  * filters (runtime partition pruning, SURVEY.md §4.1). */
class PruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q52 plans a dynamicpruning partition filter on the catalogued lake") {
    val df = IngestQueries.defsBucketed("q52_dpp_pruned")(spark, "/root/testdata/sf0.001")
    // inspect the scan's partitionFilters directly — plan toString
    // truncates long filter lists
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec if f.partitionFilters.nonEmpty => f
    }
    assert(scans.nonEmpty, s"no partitioned scan:\n${df.queryExecution.sparkPlan}")
    val filters = scans.flatMap(_.partitionFilters).map(_.toString).mkString("; ")
    assert(filters.contains("dynamicpruning"),
      s"no dynamic partition pruning among partition filters: $filters")
    // and the result is correct (row counts match the static day filter)
    val viaDpp = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val static = spark.table(graft.pipeline.IngestDemo.ensureCatalog(spark, "/root/testdata/sf0.001"))
      .filter(org.apache.spark.sql.functions.col("day").isin(10, 20))
      .groupBy("mode").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(viaDpp == static)
  }
}
