package graft

/** A Hadoop FileSystem registered under a NON-`file` scheme (`graftfs://`),
  * backed by the local disk. Exists to prove the object-store seam
  * (SURVEY.md §2.1 #11, reference azureStorageAdapter.go:34-227): the
  * write→prune→read chain resolves its FileSystem from the base URI's
  * scheme via the Hadoop registry — exactly how an `abfss://` base would
  * bind to the ABFS connector — so exercising a second scheme end-to-end
  * pins that no code path hardcodes `file` semantics or the default FS.
  *
  * Must be a top-level class with a no-arg constructor: Hadoop instantiates
  * it reflectively from the `fs.graftfs.impl` conf key.
  */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
