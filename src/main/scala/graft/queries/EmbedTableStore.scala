package graft.queries

import org.apache.spark.sql.SparkSession
import graft.engine.Tables
import graft.functions.{CosByIdExpr, QuantCosByIdExpr}

/** Build-once driver artifacts for the q49 broadcastable verify path:
  * the float verify table ([[graft.functions.CosTable]]) and its int8
  * SQ twin ([[graft.functions.QuantCosTable]]), bound to a corpus dir.
  * These are INDEX artifacts — a production vector system quantizes
  * its corpus once and serves every near-dup pass from the codes — so
  * like the IVF cells (q51) and the MinHash stores (q82) they are
  * constructed by `ensure` (Bench pre-builds them outside the timing
  * loop; one collect + broadcast per corpus, bounded by the same
  * `BroadcastRows` gate that picks this verify path) and only the
  * probe-side work happens at query time. One corpus owns the
  * `cos_by_id`/`qcos_by_id` registrations at a time; `ensure` on an
  * already-bound dir is a no-op, on a different dir a rebuild. */
object EmbedTableStore {
  private var bound: Option[String] = None

  def ensure(s: SparkSession, sfDir: String): Unit = synchronized {
    if (bound.contains(sfDir)) return
    val e = Tables.load(s, sfDir, "embeddings")
    val table = CosByIdExpr.build(e.select("vec_id", "embedding"))
    CosByIdExpr.register(s, table)
    QuantCosByIdExpr.register(s, QuantCosByIdExpr.buildFrom(table))
    bound = Some(sfDir)
  }
}
