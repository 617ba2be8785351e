package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The ANN promise: q36's LSH index must reproduce the exact q35
  * brute-force top-k with high recall — otherwise it is silent data loss
  * for a retrieval pipeline. */
class VectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairs(q: String, sf: String): Set[(Long, Long)] =
    VectorOps.defs(q)(spark, sf).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"q36 recall >= 0.9 vs exact q35 top-k at ${sf.split('/').last}") {
      val exact = pairs("q35_cosine_topk", sf)
      val ann = pairs("q36_ann_lsh", sf)
      assert(exact.size == 50, s"expected 10 probes x top-5, got ${exact.size}")
      val recall = (exact & ann).size.toDouble / exact.size
      assert(recall >= 0.9, s"ANN recall $recall")
    }
  }

  test("q36 returns a full top-5 per probe (candidates are not starved)") {
    val rows = VectorOps.defs("q36_ann_lsh")(spark, "/root/testdata/sf0.01")
      .groupBy("a_id").count().collect()
    assert(rows.length == 10 && rows.forall(_.getLong(1) == 5))
  }
}
