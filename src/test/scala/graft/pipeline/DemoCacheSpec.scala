package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The cross-JVM artifact cache the driver-visible build_sec rests on:
  * marker semantics (fresh / stale-version / interrupted) and snapshot
  * priming degradation. A wrong "fresh" verdict would serve stale demo
  * artifacts to every query that reads them, so these paths get their
  * own spec even though Bench/Verify exercise the happy path daily. */
class DemoCacheSpec extends AnyFunSuite {

  private def tmpRoot(): File =
    Files.createTempDirectory("graft-democache").toFile

  test("cached(): builds once, then hits; marker carries Version:tag") {
    val root = tmpRoot()
    var builds = 0
    assert(!DemoCache.cached(root, "tagA") { builds += 1 })
    assert(builds == 1)
    assert(DemoCache.cached(root, "tagA") { builds += 1 }, "second call must hit")
    assert(builds == 1)
    val marker = new File(root, "_GRAFT_BUILD_OK")
    val content = new String(Files.readAllBytes(marker.toPath), StandardCharsets.UTF_8)
    assert(content == s"${DemoCache.Version}:tagA")
  }

  test("cached(): stale version or different tag rebuilds and clears the root") {
    val root = tmpRoot()
    DemoCache.cached(root, "tagA") {
      // like the real builders, the build recreates its root (cached()
      // clears it first so a stale artifact can never survive)
      root.mkdirs()
      Files.write(new File(root, "artifact").toPath, "old".getBytes): Unit
    }
    // stale VERSION: marker from a previous release must not be trusted
    Files.write(new File(root, "_GRAFT_BUILD_OK").toPath,
      "ancient:tagA".getBytes(StandardCharsets.UTF_8))
    var rebuilt = false
    assert(!DemoCache.cached(root, "tagA") { rebuilt = true })
    assert(rebuilt, "stale-version marker must force a rebuild")
    assert(!new File(root, "artifact").exists(),
      "rebuild must start from a CLEARED root (no stale artifact bytes)")
    // different TAG (e.g. another fixture dir): also a miss
    var again = false
    DemoCache.cached(root, "tagB") { again = true }
    assert(again)
  }

  test("cached(): interrupted build (no marker) is rebuilt, never trusted") {
    val root = tmpRoot()
    intercept[RuntimeException] {
      DemoCache.cached(root, "tagA") { throw new RuntimeException("crash mid-build") }
    }
    assert(!new File(root, "_GRAFT_BUILD_OK").exists(),
      "a crashed build must not leave a marker")
    var rebuilt = false
    DemoCache.cached(root, "tagA") { rebuilt = true }
    assert(rebuilt)
  }

  test("primeFromSnapshot: no snapshot file is a clean no-op") {
    assert(!DemoCache.primeFromSnapshot("/no/such/sf-dir-xyz"),
      "missing snapshot must report false and leave the cold path to build")
  }

  test("primeFromSnapshot: extracts via temp dir, replaces stale trees wholesale") {
    // a synthetic per-sf snapshot, exercised through the real prime path
    // (temp-dir extraction + atomic per-artifact rename)
    val sfName = s"sftest${System.nanoTime()}"
    val sfDir = s"/tmp/graft-prime-fixture/$sfName"
    val snap = new File("assets", s"demo-$sfName.tgz")
    val live = new File(DemoCache.Root, s"ingest/$sfName")
    try {
      val stage = Files.createTempDirectory("graft-prime").toFile
      val art = new File(stage, s"ingest/$sfName")
      art.mkdirs()
      Files.write(new File(art, "data.txt").toPath, "payload".getBytes)
      Files.write(new File(art, "_GRAFT_BUILD_OK").toPath,
        s"${DemoCache.Version}:$sfDir".getBytes(StandardCharsets.UTF_8))
      assert(new ProcessBuilder("tar", "czf", snap.getAbsolutePath, s"ingest/$sfName")
        .directory(stage).start().waitFor() == 0)

      // a stale tree at the destination must be replaced WHOLESALE
      live.mkdirs()
      Files.write(new File(live, "junk.txt").toPath, "stale".getBytes)
      assert(DemoCache.primeFromSnapshot(sfDir), "extraction should run")
      assert(new File(live, "data.txt").exists(), "snapshot content promoted")
      assert(!new File(live, "junk.txt").exists(), "stale content replaced wholesale")
      var builds = 0
      assert(DemoCache.cached(live, sfDir) { builds += 1 },
        "promoted artifact must read as fresh")
      assert(builds == 0)
      // no half-extracted temp trees left behind
      val leftovers = Option(DemoCache.Root.listFiles()).toSeq.flatten
        .filter(_.getName.startsWith(".snap-extract-"))
      assert(leftovers.isEmpty, s"temp extraction dirs left: $leftovers")
      // fresh artifact → second prime skips extraction entirely
      assert(!DemoCache.primeFromSnapshot(sfDir), "fresh artifact must skip")
    } finally {
      snap.delete()
      DemoCache.deleteRec(live)
    }
  }
}
