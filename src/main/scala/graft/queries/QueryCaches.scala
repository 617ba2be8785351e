package graft.queries

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer
import scala.util.DynamicVariable

/** Registry for the session-lifetime caches the query closures plant.
  *
  * Several queries persist a frame that feeds 2-3 downstream joins (the
  * shingled corpus in q32/q33/q65/q74, the LSH bucket coding in q49, the
  * decoded audio in q58). The `queries` contract returns a LAZY
  * DataFrame, so the query body cannot unpersist what the caller hasn't
  * executed yet — the caches outlive the call by design. This registry
  * records each one at persist time so [[graft.SparkEntry.runAndRelease]]
  * can hand a library consumer the missing half of the contract: run the
  * query, then drop exactly the caches it planted (instead of a blanket
  * `spark.catalog.clearCache()` that would also evict the user's own
  * cached tables).
  *
  * Ownership is per-[[scoped]] call, carried in a thread-bound token
  * (not a shared index watermark): entries tracked while a scope is
  * open on the calling thread — query closures run synchronously on
  * it — belong to that scope alone. Across registries, ownership of one
  * PHYSICAL cache is REFCOUNTED by canonical plan: Spark's CacheManager
  * keys caches on the canonical plan, so when two closures track the
  * same shingled-corpus frame (q32 then q79 in one session, or two
  * concurrent `runAndRelease` threads), a second `persist()` would only
  * log `Asked to cache already cached data`, and a first-releaser
  * unpersist would evict the cache under the OTHER tracker's still-
  * running jobs (worse, a mid-flight `InMemoryRelation` rematerializes
  * its RDD after the eviction and the orphan is then unreachable by any
  * plan-keyed unpersist — a leak). Refcounting gives each tracker a
  * share and drops the cache exactly when the LAST share releases.
  *
  * Unpersist is non-blocking and an unpersisted entry is a no-op, so
  * frames already released inside an operator (e.g. the q65 edge list
  * consumed by the driver union-find) can be tracked too.
  */
object QueryCaches {
  /** Ownership token for one [[scoped]] call's tracked frames. */
  final class Scope private[QueryCaches] () {
    private[QueryCaches] val entries = ArrayBuffer.empty[Dataset[_]]
  }

  private val global = ArrayBuffer.empty[Dataset[_]]
  private val current = new DynamicVariable[Option[Scope]](None)
  /** canonical plan → (the dataset that actually holds the persist,
    * outstanding tracker shares). */
  private val owned = mutable.Map.empty[LogicalPlan, (Dataset[_], Int)]

  private def keyOf(ds: Dataset[_]): LogicalPlan =
    ds.queryExecution.analyzed.canonicalized

  private def record(ds: Dataset[_]): Unit =
    current.value match {
      case Some(sc) => sc.entries += ds
      case None     => global += ds
    }

  /** Persist `ds` and record it for later release — or, if a tracker
    * anywhere already holds the same canonical plan, take a refcount
    * share of the existing cache instead of double-persisting. A plan
    * cached OUTSIDE this registry (an operator's own scratch persist)
    * is left entirely alone: no persist, no share, no release — its
    * owner unpersists it itself. */
  def track[T](ds: Dataset[T]): ds.type = synchronized {
    val key = keyOf(ds)
    owned.get(key) match {
      case Some((holder, n)) =>
        owned(key) = (holder, n + 1)
        record(ds)
      case None =>
        if (ds.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
          ds.persist()
          owned(key) = (ds, 1)
          record(ds)
        }
    }
    ds
  }

  /** Record an already-persisted frame for later release (the caller
    * issued the `persist()` itself). Takes a refcount share like
    * [[track]]. */
  def note[T](ds: Dataset[T]): ds.type = synchronized {
    val key = keyOf(ds)
    owned(key) = owned.get(key) match {
      case Some((holder, n)) => (holder, n + 1)
      case None              => (ds, 1)
    }
    record(ds)
    ds
  }

  /** Drop one tracker share; unpersist the physical cache only when the
    * last share releases. */
  private def release(ds: Dataset[_]): Unit = {
    val key = keyOf(ds)
    owned.get(key) match {
      case Some((holder, n)) if n > 1 => owned(key) = (holder, n - 1)
      case Some((holder, _)) =>
        owned.remove(key)
        holder.unpersist(blocking = false): Unit
      case None => ds.unpersist(blocking = false): Unit
    }
  }

  /** Release a tracked frame EARLY, from inside the operator that is
    * done with it (the q65 edge list after the driver union-find has
    * collected it): drops the instance's tracker shares through the
    * refcount — never the raw `unpersist()` the refcount exists to
    * prevent, which would evict the physical cache under a concurrent
    * tracker of the same canonical plan — and un-records the frame so
    * the enclosing scope's end (or [[releaseAll]]) cannot
    * double-decrement. One release per removed record, so an instance
    * tracked twice drops both shares (no stranded refcount). Must be
    * called from the thread/scope that tracked the frame — the repo's
    * operators receive the tracked reference from the caller's own
    * scope; a frame recorded in a scope this thread cannot see is a
    * NO-OP here (its canonical plan is still refcounted in `owned`, so
    * the owning scope releases the shares — never a raw unpersist out
    * from under it). Only a plan no tracker refcounts at all is
    * unpersisted directly (the operator's own scratch). */
  def earlyRelease(ds: Dataset[_]): Unit = synchronized {
    def removeAll(buf: ArrayBuffer[Dataset[_]]): Int = {
      val n = buf.count(_ eq ds)
      if (n > 0) buf.filterInPlace(_ ne ds)
      n
    }
    val removed =
      current.value.map(sc => removeAll(sc.entries)).getOrElse(0) + removeAll(global)
    if (removed > 0) (1 to removed).foreach(_ => release(ds))
    // Never raw-unpersist a plan some tracker still refcounts: a
    // bare-persisted frame whose canonical plan matches a tracked frame
    // shares ONE physical cache (Spark keys caches on the plan) — the
    // bare persist was a no-op on the already-cached plan, so this
    // caller holds no share, and a raw unpersist would evict the cache
    // under the tracker's running jobs and strand its owned entry.
    // No-op and let the share-holders release it; only a genuinely
    // untracked plan is unpersisted directly.
    else if (!owned.contains(keyOf(ds))) ds.unpersist(blocking = false): Unit
  }

  /** Run `body` under a fresh ownership scope on this thread, then
    * release (non-blocking, newest-first — dependents before their
    * upstream frames) exactly the shares the body tracked. Scopes on
    * other threads are unaffected; nesting gives the innermost scope
    * ownership. */
  def scoped[A](body: => A): A = {
    val sc = new Scope
    try current.withValue(Some(sc))(body)
    finally synchronized {
      sc.entries.reverseIterator.foreach(release)
      sc.entries.clear()
    }
  }

  /** Release every share tracked outside any scope (newest-first). */
  def releaseAll(): Unit = synchronized {
    global.reverseIterator.foreach(release)
    global.clear()
  }
}
