package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Cached `FileSystem` handles — round 22. `Path.getFileSystem` /
  * `FileSystem.get` construct a `FileSystem$Cache$Key` on EVERY call,
  * which resolves `UserGroupInformation.getCurrentUser` (a synchronized
  * subject lookup): driver stack sampling under the bench session caught
  * it in ~12% of warm-residue samples, because the engine resolves a
  * handle per metadata touch (plan memo signatures, lake walks, sidecar
  * folds, rule identity checks). The handle itself is stable — Hadoop
  * caches and shares one instance per (scheme, authority, ugi) — so
  * memoize the resolution one level up, keyed by (scheme, authority,
  * conf identity). Instances are thread-safe and never closed by this
  * library, matching Hadoop's own cache lifecycle. */
object Fs {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, FileSystem]()

  def of(conf: Configuration, p: Path): FileSystem = {
    val uri = p.toUri
    val key = s"${uri.getScheme}://${uri.getAuthority}#${System.identityHashCode(conf)}"
    cache.computeIfAbsent(key, _ => p.getFileSystem(conf))
  }
}
