package graft.queries

import org.apache.spark.sql.Dataset
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
  * it — belong to that scope alone, so two concurrent `runAndRelease`
  * calls on different threads each release exactly their own caches.
  * Entries tracked OUTSIDE any scope (a consumer driving `defs()`
  * directly) go to a process-lifetime list that only [[releaseAll]]
  * drains — Bench/Verify call it between queries.
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

  /** Persist `ds` and record it for later release. */
  def track[T](ds: Dataset[T]): ds.type = { ds.persist(); note(ds) }

  /** Record an already-persisted frame for later release. */
  def note[T](ds: Dataset[T]): ds.type = synchronized {
    current.value match {
      case Some(sc) => sc.entries += ds
      case None     => global += ds
    }
    ds
  }

  /** Run `body` under a fresh ownership scope on this thread, then
    * unpersist (non-blocking, newest-first — dependents before their
    * upstream frames) exactly the frames the body tracked. Scopes on
    * other threads are unaffected; nesting gives the innermost scope
    * ownership. */
  def scoped[A](body: => A): A = {
    val sc = new Scope
    try current.withValue(Some(sc))(body)
    finally synchronized {
      sc.entries.reverseIterator.foreach(_.unpersist(blocking = false))
      sc.entries.clear()
    }
  }

  /** Unpersist every frame tracked outside any scope (newest-first). */
  def releaseAll(): Unit = synchronized {
    global.reverseIterator.foreach(_.unpersist(blocking = false))
    global.clear()
  }
}
