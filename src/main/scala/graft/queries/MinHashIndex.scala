package graft.queries

import java.io.File
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable
import graft.engine.Tables
import graft.pipeline.DemoCache

/** Durable MinHash signature index over the EXISTING corpus (q82): the
  * band rows and shingle sets of every already-ingested doc, written
  * once to parquet under `var/demo/minhash/<sf>` and probed by each
  * incoming batch. This is the production form of the q79 incremental
  * dedup: a live pipeline amortizes the corpus-side shingle+signature
  * pass into a write-once index (appended as batches commit), so
  * per-batch work is ONLY the batch's own signatures plus the bucket
  * probe — the same build-once/query-many lifecycle as the IVF index
  * (q51) and the bucketed join tables (q48).
  *
  * Two artifacts, the classic index + feature-store split:
  *  - `bands/`    (doc_id, band, bh): the probe target;
  *  - `shingles/` (doc_id, sh): exact-verification features, joined
  *    BY ID only for the (tiny) collision set.
  *
  * Memoized per JVM and durable across JVMs via [[DemoCache]] markers;
  * Bench builds it outside the timing loop. The indexed corpus is
  * doc_id < 400 — the same "existing corpus" split q79 recomputes
  * in-flight, so DedupSpec can assert the two paths emit identical
  * edges.
  */
object MinHashIndex {
  val CorpusCap = 400
  private val built = mutable.Map.empty[String, String]

  /** Build (or return) the index root for this corpus. */
  def ensure(s: SparkSession, sfDir: String): String = synchronized {
    built.getOrElseUpdate(sfDir, {
      val root = DemoCache.root(s"minhash/${new File(sfDir).getName}")
      DemoCache.cached(root, sfDir) {
        val sh = DedupOps.shingled(
          Tables.load(s, sfDir, "documents").filter(col("doc_id") < CorpusCap)).persist()
        sh.write.mode("overwrite").parquet(new File(root, "shingles").getPath)
        DedupOps.bandRows(s, sh)
          .write.mode("overwrite").parquet(new File(root, "bands").getPath)
        sh.unpersist()
        ()
      }
      root.getPath
    })
  }
}
