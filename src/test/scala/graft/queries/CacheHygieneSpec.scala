package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The runAndRelease contract: after a consumer executes a
  * cache-planting query through it, NO persisted RDD the query planted
  * survives — the storage tab is clean without a blanket
  * `spark.catalog.clearCache()`. Asserted as a set DELTA against the
  * pre-call persistent-RDD ids so caches owned by other suites (the
  * shared session runs every spec in one JVM) are not blamed. */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // every query whose closure plants a session-lifetime cache
  private val planting = Seq(
    "q32_minhash_neardup", "q33_jaccard_search", "q34_simhash_neardup",
    "q49_embed_neardup", "q65_dup_groups", "q58_audio_frames",
    "q74_neardup_curation", "q75_decontaminate", "q76_span_dedup",
    "q79_incremental_dedup", "q82_indexed_dedup", "q83_appended_dedup",
    "q88_incremental_spans", "q91_curation_recipe", "q95_video_frames")

  test("runAndRelease drops every cache the query planted") {
    for (name <- planting) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val n = SparkEntry.runAndRelease(spark, sf, name)(_.count())
      assert(n >= 0)
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"$name leaked persisted RDDs: $leaked")
    }
  }

  test("runAndRelease leaves caches planted BEFORE the call untouched") {
    import spark.implicits._
    val mine = Seq(1, 2, 3).toDF("x").persist()
    mine.count()
    SparkEntry.runAndRelease(spark, sf, "q32_minhash_neardup")(_.count())
    assert(mine.storageLevel.useMemory, "caller-owned cache was evicted")
    mine.unpersist()
  }

  test("concurrent runAndRelease calls release only their own caches") {
    // Ownership is a thread-bound token, not a shared watermark: two
    // overlapping calls on different threads must not unpersist each
    // other's still-live frames (the old index scheme could). Run two
    // cache-planting queries concurrently many enough times to
    // interleave, asserting no cross-release and no leak.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val runs = Future.sequence(Seq(
      Future(SparkEntry.runAndRelease(spark, sf, "q32_minhash_neardup")(_.count())),
      Future(SparkEntry.runAndRelease(spark, sf, "q33_jaccard_search")(_.count()))))
    val counts = Await.result(runs, 5.minutes)
    assert(counts.forall(_ >= 0))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"concurrent calls leaked persisted RDDs: $leaked")
  }

  test("earlyRelease drops one share per removed record: a double-tracked frame fully releases") {
    // track() twice on one instance takes two refcount shares and two
    // records; earlyRelease must release once per removed record or the
    // cache strands at refcount 1 with no record left to ever drop it
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val f = Seq(1L, 2L, 3L).toDF("x").filter(col("x") > 1)
    QueryCaches.track(f)
    QueryCaches.track(f)
    f.count()
    QueryCaches.earlyRelease(f)
    // non-blocking unpersist: poll briefly for the blocks to drop
    val deadline = System.nanoTime() + 10_000_000_000L
    while (spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty &&
           System.nanoTime() < deadline) Thread.sleep(50)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"double-tracked frame left a stranded cache: $leaked")
    QueryCaches.releaseAll() // no-op: the records were consumed by earlyRelease
  }

  test("an operator's early release cannot evict a concurrent tracker's cache") {
    // Two q65 runs share the edge list's physical cache by canonical
    // plan; each componentLabels releases it when its union-find has
    // collected. A raw unpersist there would evict the cache under the
    // OTHER thread's still-running collect (the refcount-bypass hole):
    // routed through QueryCaches.earlyRelease, the share accounting
    // holds — both runs complete, agree, and leave no orphaned RDDs.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val runs = Future.sequence(Seq.fill(2)(
      Future(SparkEntry.runAndRelease(spark, sf, "q65_dup_groups")(_.count()))))
    val counts = Await.result(runs, 5.minutes)
    assert(counts.distinct.size == 1, s"concurrent q65 runs disagree: $counts")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"concurrent q65 leaked persisted RDDs: $leaked")
  }

  test("earlyRelease of an untracked same-plan frame cannot evict a tracker's cache") {
    // A bare-persisted frame whose canonical plan matches a tracked
    // frame shares ONE physical cache (Spark keys on the plan) — its
    // persist() was a no-op, so it holds no share. earlyRelease of that
    // instance must neither raw-unpersist the shared cache nor steal a
    // share: the tracker's cache survives until the tracker releases.
    import spark.implicits._
    val a = Seq(201, 202, 203).toDF("hyg2").filter($"hyg2" > 201)
    QueryCaches.track(a)
    a.count()
    assert(a.storageLevel.useMemory)
    val b = Seq(201, 202, 203).toDF("hyg2").filter($"hyg2" > 201)
    b.persist() // no-op: plan already cached
    b.count()
    QueryCaches.earlyRelease(b)
    assert(a.storageLevel.useMemory,
      "untracked earlyRelease evicted the tracker's shared cache")
    QueryCaches.releaseAll()
    assert(!a.storageLevel.useMemory, "the tracker's own release must still drop it")
  }

  test("track is idempotent on an already-cached plan: no double-persist, no ownership steal") {
    // Spark's CacheManager keys on the canonical plan, so two queries
    // tracking the same shingled frame used to double-persist (the
    // `Asked to cache already cached data` warnings in the test log)
    // AND let the second tracker's release evict a cache it never
    // planted. track() must reuse an already-cached plan untouched.
    import spark.implicits._
    val a = Seq(101, 102, 103).toDF("hyg").filter($"hyg" > 101)
    QueryCaches.track(a)
    a.count()
    assert(a.storageLevel.useMemory)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    QueryCaches.scoped {
      // same canonical plan, different Dataset object — the q32-then-q79
      // shape; the scope must NOT re-persist or adopt it
      val b = Seq(101, 102, 103).toDF("hyg").filter($"hyg" > 101)
      QueryCaches.track(b)
      assert(b.count() == 2)
    }
    // scope closed: the pre-existing cache survives (ownership stayed
    // with the original tracker) and no new RDD was pinned
    assert(a.storageLevel.useMemory, "scope evicted a cache it never planted")
    assert(spark.sparkContext.getPersistentRDDs.keySet == cachedBefore,
      "re-tracking an already-cached plan pinned a new RDD")
    QueryCaches.releaseAll()
    assert(!a.storageLevel.useMemory, "releaseAll must drop the original tracker's cache")
  }
}
