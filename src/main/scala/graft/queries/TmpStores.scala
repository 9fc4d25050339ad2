package graft.queries

/** Bounded scratch stores for bench/verify entries that materialize a
  * real on-disk store per invocation (ingest throughput, cluster
  * fixture, rollup expiry). `createTempDirectory` leaked one full
  * store per rep — at 100× scale that's GBs per rep accumulating
  * until /tmp fills and later entries' spill paths die. Instead each
  * tag maps to ONE per-JVM fixed path: a repeat invocation deletes
  * the previous rep's store before writing, and a shutdown hook
  * removes whatever this JVM created. The pid suffix keeps
  * concurrently-running Bench and Verify JVMs from clobbering each
  * other. */
private[graft] object TmpStores {
  private val created =
    scala.collection.concurrent.TrieMap.empty[java.nio.file.Path, Unit]
  java.lang.Runtime.getRuntime.addShutdownHook(
    new Thread(() => created.keys.foreach(rmTree)))

  /** A fresh EMPTY directory keyed by (prefix, dataset dir): the tag
    * embeds the SANITIZED full dataset path, not its hashCode — two
    * colliding hashCodes would silently map two live stores onto one
    * path and the second freshDir call would delete the first's store
    * under its memoized reader. */
  def freshDirFor(prefix: String, datasetDir: String): String =
    freshDir(prefix + "-" + datasetDir.replaceAll("[^A-Za-z0-9._-]", "_"))

  /** A fresh EMPTY directory at the per-(JVM, tag) fixed path. */
  def freshDir(tag: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft-$tag-${ProcessHandle.current().pid()}")
    rmTree(p)
    java.nio.file.Files.createDirectories(p)
    created.put(p, ())
    p.toString
  }

  private def rmTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
}
