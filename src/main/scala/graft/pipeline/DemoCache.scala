package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Cross-JVM memo for deterministic demo artifacts (lakes, stream
  * results, indexes, models) under `target/`.
  *
  * Every demo build in this repo is a pure function of (fixture dir,
  * build code), so a completed build can be reused by later JVMs — the
  * driver's Bench/Verify runs each spin a fresh JVM, and rebuilding the
  * demo lakes per JVM was 63 s of the 120 s bench wall (BENCH_r06
  * build_sec). A build is trusted iff its root contains a marker file
  * whose content matches `Version:tag`; anything else (missing, stale
  * version, interrupted build) is deleted and rebuilt, so a half-written
  * artifact can never masquerade as complete.
  *
  * [[Version]] MUST be bumped whenever a change alters any demo
  * artifact's bytes (fixture generation, pipeline semantics, stream
  * queries, index layout) — the marker carries it so stale caches
  * self-invalidate. `SPARK_GRAFT_REBUILD=1` forces a rebuild of
  * everything regardless.
  */
object DemoCache {
  /** Bump on any change that alters demo-artifact content. */
  val Version = "r7b"

  private def force = sys.env.get("SPARK_GRAFT_REBUILD").contains("1")

  private def marker(root: File) = new File(root, "_GRAFT_BUILD_OK")

  /** True iff `root` holds a completed build stamped with this
    * Version:tag (never true when SPARK_GRAFT_REBUILD=1). */
  def isFresh(root: File, tag: String): Boolean =
    !force && marker(root).isFile &&
      new String(Files.readAllBytes(marker(root).toPath), StandardCharsets.UTF_8) ==
        s"$Version:$tag"

  /** Run `build` into `root` unless a completed build is already there.
    * The marker is written only after `build` returns, so interrupted
    * builds are rebuilt next time. Returns true when the cache was hit. */
  def cached(root: File, tag: String)(build: => Unit): Boolean = {
    val hit = isFresh(root, tag)
    if (!hit) {
      deleteRec(root)
      build
      root.mkdirs()
      Files.write(marker(root).toPath, s"$Version:$tag".getBytes(StandardCharsets.UTF_8))
    }
    hit
  }

  def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
    f.delete(): Unit
  }
}
