package graft.queries

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The property q48 exists to demonstrate: with both fact tables
  * bucketed on the join key, the sort-merge join consumes the bucketed
  * scans DIRECTLY — no shuffle exchange anywhere under the join. The
  * layout, not the engine, pays for co-location (what a 100 TB star
  * join is laid out for). The aggregation above the join still shuffles
  * its 5 groups; that exchange is unrelated and allowed. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed equi-join consumes bucketed scans with no shuffle under the join") {
    val df = IngestQueries.defsBucketed("q48_bucketed_join")(spark, "/root/testdata/sf0.001")
    df.collect() // force AQE to finalize the executed plan
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // descend through AQE query-stage wrappers, which hide their
    // materialized subtrees from plain collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(walk)
    }
    val all = walk(finalPlan)
    val smjs = all.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a sort-merge join:\n$finalPlan")
    val under = smjs.flatMap(walk)
    assert(!under.exists(_.isInstanceOf[ShuffleExchangeLike]),
      s"join inputs were shuffled — bucketing not used:\n$finalPlan")
    val scans = under.collect { case f: FileSourceScanExec => f }
    assert(scans.size == 2 && scans.forall(_.bucketedScan),
      s"expected two bucketed scans under the join:\n$finalPlan")
  }
}
