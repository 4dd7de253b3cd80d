package graft.util

import java.nio.file.{Files, Path}

/** Local-filesystem tree helpers shared by the persisted-index
  * maintenance paths (text/InvertedIndex, dedup/Dedup's MinHash index)
  * and the streaming drains that stage per-run working copies. One
  * implementation of the recursive traversal/close logic instead of a
  * private copy per call site.
  *
  * Local-fs only by design: these back the single-writer index commit
  * protocols, whose atomic same-FS renames an object-store deployment
  * replaces with whole-dir versioning.
  */
object FileTrees {

  /** Delete `p` recursively; missing paths are a no-op. */
  def rmTree(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val st = Files.list(p)
      try { import scala.jdk.CollectionConverters._
        st.iterator().asScala.toVector.foreach(rmTree)
      } finally st.close()
    }
    Files.deleteIfExists(p); ()
  }

  def rmTree(p: String): Unit = rmTree(java.nio.file.Paths.get(p))

  /** Copy the tree under `src` into `dst` (created if absent). */
  def copyTree(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    val st = Files.list(src)
    try { import scala.jdk.CollectionConverters._
      st.iterator().asScala.toVector.foreach { p =>
        val t = dst.resolve(p.getFileName.toString)
        if (Files.isDirectory(p)) copyTree(p, t)
        else { Files.copy(p, t); () }
      }
    } finally st.close()
  }

  def copyTree(src: String, dst: String): Unit =
    copyTree(java.nio.file.Paths.get(src), java.nio.file.Paths.get(dst))

  /** Move every parquet part-file under `staging`'s partition dirs into
    * the same relative partition dirs under `live`, then drop `staging`.
    * Handles arbitrarily nested `k=v` partition layouts. Idempotent to
    * re-drive after a crash: a part-file is either still staged or
    * already live (same-FS rename), so a retry moves exactly the
    * remainder — the promote half of the staged-append commit protocol.
    */
  def promoteStaged(staging: Path, live: Path): Unit = {
    if (!Files.isDirectory(staging)) return
    def walk(src: Path, dst: Path): Unit = {
      val st = Files.list(src)
      val entries =
        try { import scala.jdk.CollectionConverters._
          st.iterator().asScala.toVector
        } finally st.close()
      entries.foreach { p =>
        val name = p.getFileName.toString
        if (Files.isDirectory(p) && name.contains("="))
          walk(p, dst.resolve(name))
        else if (name.endsWith(".parquet")) {
          Files.createDirectories(dst)
          Files.move(p, dst.resolve(name)); ()
        } // _SUCCESS etc stay behind and die with the staging dir
      }
    }
    walk(staging, live)
    rmTree(staging)
  }
}
