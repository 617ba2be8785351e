package graft.queries

import org.apache.spark.sql.Dataset
import scala.collection.mutable.ArrayBuffer

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
  * Thread-safe; release order is newest-first (dependents before their
  * upstream frames). Unpersist is non-blocking and an unpersisted entry
  * is a no-op, so frames already released inside an operator (e.g. the
  * q65 edge list consumed by the driver union-find) can be tracked too.
  */
object QueryCaches {
  private val live = ArrayBuffer.empty[Dataset[_]]

  /** Persist `ds` and record it for later release. */
  def track[T](ds: Dataset[T]): ds.type = synchronized { ds.persist(); live += ds; ds }

  /** Record an already-persisted frame for later release. */
  def note[T](ds: Dataset[T]): ds.type = synchronized { live += ds; ds }

  /** Watermark for [[releaseSince]]. */
  def mark(): Int = synchronized(live.length)

  /** Unpersist (non-blocking) everything tracked after watermark `m`. */
  def releaseSince(m: Int): Unit = synchronized {
    live.view.drop(m).reverseIterator.foreach(_.unpersist(blocking = false))
    live.remove(m, live.length - m)
  }

  def releaseAll(): Unit = releaseSince(0)
}
