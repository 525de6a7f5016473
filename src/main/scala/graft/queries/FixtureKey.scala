package graft.queries

/** Content-fingerprint memo key for per-process live-fixture caches (the s1
  * SBE captures, the avro-ocf feed, the rest-pages HTTP fixture). One
  * implementation so the staleness stamp cannot drift between the three:
  * key = canonical sf path + a fingerprint of the source parquet's part
  * files (name:length:mtime), so a REGENERATED sf dir within one process
  * gets a fresh fixture instead of a stale one, while repeat invocations —
  * the bench loop — reuse the memoized fixture untouched.
  */
/** `File.deleteOnExit` runs LIFO and only removes EMPTY directories —
  * registering a populated fixture dir alone leaks the whole tree on JVM
  * exit. Register the root first, then recurse, so children delete before
  * parents. Re-registering after each overwrite is fine (duplicate
  * registrations just attempt a second delete of an already-gone path).
  */
private[queries] object FixtureCleanup {
  def registerTree(root: java.io.File): Unit = {
    root.deleteOnExit()
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      if (f.isDirectory) registerTree(f) else f.deleteOnExit()
    }
  }
}

private[queries] object FixtureKey {
  def of(sfDir: String, tableFile: String, variant: String = ""): String = {
    val root = new java.io.File(sfDir)
    val src = new java.io.File(root, tableFile)
    val parts = Option(src.listFiles()).map(_.toSeq).getOrElse(Seq(src))
    val stamp = parts.sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString(",").hashCode
    val suffix = if (variant.isEmpty) "" else s"#$variant"
    s"${root.getCanonicalPath}#$stamp$suffix"
  }
}
