package graft.sources

/** THE one definition of "data file" under a parquet/stream-input root —
  * non-hidden regular files, name-sorted (under a range exchange,
  * file-name order is partition order is key order). Shared by the
  * streaming trigger sizing, the epoch moves, the arrival-delivery
  * hardlinks (StreamQueries) and the changelog stores' compaction
  * (ScdStore), so the convention cannot silently diverge. A bounded
  * driver-side directory listing, never a data read; empty when `root`
  * is absent.
  */
object DataFiles {

  /** [[list]] extended one level into non-hidden subdirectories — the
    * hash-bucket-partitioned changelog layout (`bucket=N/part-*.parquet`,
    * ScdStore): data files at the root AND inside each `bucket=N` dir,
    * name-sorted by relative path. Hidden entries (`_`/`.` prefixes —
    * `_SUCCESS`, `.crc`) are skipped at both levels.
    */
  def listPartitioned(root: String): Seq[java.nio.file.Path] = {
    val rp = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(rp)) return Seq.empty
    val dirs = {
      val st  = java.nio.file.Files.list(rp)
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      try st.forEach { p =>
        val n = p.getFileName.toString
        if (java.nio.file.Files.isDirectory(p) && !n.startsWith("_") && !n.startsWith(".")) buf += p
      } finally st.close()
      buf.toSeq
    }
    (list(root) ++ dirs.flatMap(d => list(d.toString)))
      .sortBy(p => rp.relativize(p).toString)
  }

  def list(root: String): Seq[java.nio.file.Path] = {
    val rp = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(rp)) return Seq.empty
    val st  = java.nio.file.Files.list(rp)
    val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    try st.forEach { p =>
      val n = p.getFileName.toString
      if (java.nio.file.Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")) buf += p
    } finally st.close()
    buf.sortBy(_.getFileName.toString).toSeq
  }
}
