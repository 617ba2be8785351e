package graft.queries

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.pipeline.IvfIndex

/** The durable-index family (MinHash signature index, IVF index, the
  * shared compact-swap) must run wherever the LAKE lives — the
  * reference puts the lake on object storage (diagram_1.txt:8-11) —
  * so every file operation goes through the Hadoop [[org.apache.hadoop
  * .fs.FileSystem]] bound to the root's scheme, never `java.io.File`.
  * These tests drive the full lifecycle through [[graft.GraftTestFs]],
  * a local FS registered under the distinct scheme `graftfs:`; any
  * local-file assumption in the index code would fail to resolve the
  * `graftfs:/...` URI string as a path. */
class IndexFsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def graftRoot(tag: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[graft.GraftTestFs].getName)
    "graftfs:" + Files.createTempDirectory(tag).toString
  }

  test("MinHash index lifecycle through a non-file: scheme equals the local-FS lifecycle") {
    val docs = graft.engine.Tables.load(spark, sf, "documents")
    val root = graftRoot("graft-fs-mh")
    MinHashIndex.build(spark, root, docs.filter(col("doc_id") < 400))
    assert(MinHashIndex.storeExists(spark, root, "bands") &&
      MinHashIndex.storeExists(spark, root, "winhashes"))
    MinHashIndex.append(spark, root,
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 450))

    // track (not bare persist): q83's indexedProbe caches this exact
    // plan when DedupSpec runs first in the shared session — track
    // takes a refcount share instead of double-persisting
    val batch = QueryCaches.track(DedupOps.shingled(
      docs.filter(col("doc_id") >= 450 && col("doc_id") < 500)))
    def probe(r: String): Set[(Long, Long, Long)] =
      MinHashIndex.probeShingled(spark, r, batch, 0.8).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val viaGraftfs = probe(root)

    // identical build over the default local FS → identical probe
    val localRoot = Files.createTempDirectory("graft-fs-mh-local").toString
    MinHashIndex.build(spark, localRoot, docs.filter(col("doc_id") < 400))
    MinHashIndex.append(spark, localRoot,
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 450))
    assert(viaGraftfs == probe(localRoot), "scheme changed probe results")
    assert(viaGraftfs.nonEmpty, "fixture must produce at least one edge")

    // compaction + crash-window self-heal, all through the graftfs FS
    MinHashIndex.compact(spark, root)
    assert(probe(root) == viaGraftfs, "compaction changed probe results")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(root, "bands"), new Path(root, ".old-bands")))
    MinHashIndex.compact(spark, root)
    assert(probe(root) == viaGraftfs, "crash-window recovery lost content")
    // no direct unpersist: the registry share (and any q83 share from a
    // suite sharing the session) owns the cache's lifetime
  }

  test("IVF index build/load/append/compact through a non-file: scheme") {
    val e = graft.engine.Tables.load(spark, sf, "embeddings")
    val root = graftRoot("graft-fs-ivf")
    val trained = IvfIndex.build(spark, root, e.filter(col("vec_id") % 10 =!= 0))
    // centroid text round-trips bit-for-bit through the FS stream API
    assert(IvfIndex.loadCentroids(spark, root).map(_.toSeq) == trained.map(_.toSeq))
    IvfIndex.append(spark, root, e.filter(col("vec_id") % 10 === 0))
    assert(spark.read.parquet(s"$root/cells").count() == e.count())
    IvfIndex.compact(spark, root)
    assert(spark.read.parquet(s"$root/cells").count() == e.count(),
      "compaction changed cell-store content")
  }
}
