package graft.ingest

import java.net.URI

/** Canonical file-location form shared by the ledger, discovery, and
  * lineage matching.
  *
  * Two encodings meet in the pipeline: Hadoop listings yield `Path`
  * URIs, while `input_file_name()` yields a PERCENT-ENCODED URI string —
  * a file name containing a space or '%' differs between them, and a
  * naive string match silently mis-classifies the file (its rows would
  * neither curate nor dead-letter while the ledger says SUCCEEDED).
  * Canonical form: decoded absolute path for local/file URIs, full
  * `scheme://authority/path` (decoded) for object stores, so s3a keys
  * keep their bucket.
  */
object PathNorm {
  def fromUri(u: URI): String =
    if (u.getScheme == null || u.getScheme == "file") u.getPath
    else s"${u.getScheme}://${u.getAuthority}${u.getPath}"

  /** For encoded URI strings (e.g. `input_file_name()` output, with or
    * without a scheme). */
  def fromString(s: String): String = fromUri(new URI(s))
}
