package graft.ops

/** Content-sensitive dataset identity shared by every write-once derived
  * layout (bucketed tables, JSONL corpus, compaction demo, ANN index):
  * md5 over the dataset dir PATH plus a (file name, size, mtime)
  * fingerprint of the named source parquet trees. The path alone is a
  * stale-data hazard — caches key per (JVM, dir), so an in-process
  * rewrite of the dir would keep serving the derived copy of the OLD
  * bytes. Folding file metadata in makes a rewrite mint a new tag, which
  * rebuilds the derived layout; superseded copies linger in the tmpdir
  * (bounded by the number of in-process rewrites — rare outside tests)
  * rather than risking a wrong serve.
  *
  * Local-FS walk matches the local[n] rig; a cluster port swaps in the
  * Hadoop FileSystem listing (same (path, size, mtime) triple). An
  * unlistable table (remote URI, permissions, concurrent delete)
  * degrades to the path-only contribution — never an error.
  */
object ContentTag {

  def of(dir: String, tables: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(dir.getBytes("UTF-8"))
    tables.foreach { t =>
      try {
        val p = java.nio.file.Paths.get(s"$dir/$t.parquet")
        // walk the FULL tree (not just the top level): a partitioned
        // layout rewritten in place below the first level must change
        // the fingerprint too
        val files: Seq[java.nio.file.Path] =
          if (java.nio.file.Files.isDirectory(p)) {
            val st = java.nio.file.Files.walk(p)
            try {
              import scala.jdk.CollectionConverters._
              st.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
                .toVector.sortBy(_.toString)
            } finally st.close()
          } else if (java.nio.file.Files.exists(p)) Seq(p)
          else Seq.empty
        files.foreach { f =>
          md.update((f.toString + "|" + java.nio.file.Files.size(f) + "|" +
            java.nio.file.Files.getLastModifiedTime(f).toMillis)
            .getBytes("UTF-8"))
        }
      } catch { case scala.util.control.NonFatal(_) => /* path-only tag */ }
    }
    md.digest.take(8).map("%02x".format(_)).mkString
  }
}
