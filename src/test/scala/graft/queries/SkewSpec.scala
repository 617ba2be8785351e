package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The salted hot-key join (q59): the plan must be a real shuffle join
  * (salting is the big×big path — a broadcast would make the demo
  * vacuous), and the salt must actually spread each hot key's rows over
  * many partitions where the raw key concentrates them on one. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q59 plan is a non-broadcast sort-merge join on (event_type, salt)") {
    val df = graft.SparkEntry.queries("q59_salted_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"unexpected broadcast in:\n$plan")
  }

  test("salting spreads a hot key across partitions; raw key concentrates it") {
    val parts = 16
    val salts = 8
    val e = graft.engine.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"))
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(salts)).cast("int"))
    def partsOfHotKey(keyed: org.apache.spark.sql.DataFrame): Long =
      keyed.repartition(parts, keyed.columns.filter(_ != "event_id").map(col): _*)
        .filter(col("event_type") === "view")
        .select(spark_partition_id().as("p"))
        .distinct().count()
    val rawParts = partsOfHotKey(e.select(col("event_id"), col("event_type")))
    val saltedParts = partsOfHotKey(e)
    assert(rawParts == 1L, s"raw key should land on one partition, got $rawParts")
    assert(saltedParts >= salts / 2,
      s"salted key should spread over >=${salts / 2} partitions, got $saltedParts")
  }

  test("salted join result equals the unsalted join result") {
    val salted = graft.SparkEntry.queries("q59_salted_join")(spark, sf).collect()
    val e = graft.engine.Tables.load(spark, sf, "events")
    val dim = e.groupBy("event_type").agg(count(lit(1)).as("type_n"))
    val plain = e.select(col("event_type"), col("value")).join(dim, Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(graft.engine.Cols.cents(col("value"))).as("sum_value_c"),
        max(col("type_n")).as("type_n"))
      .orderBy("event_type").collect()
    assert(salted.toSeq == plain.toSeq)
  }
}
