package graft

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem

/** A local-disk Hadoop FileSystem registered under a DISTINCT scheme
  * (`graftfs:`), the standard Hadoop-test trick for proving code goes
  * through the `FileSystem` API rather than `java.io.File`: any direct
  * local-file assumption (exists/rename on a `File`) sees the URI
  * string `graftfs:/...` as a relative path and breaks, while
  * FS-API-clean code resolves this class via `fs.graftfs.impl` and
  * works unchanged. */
class GraftTestFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")
}
