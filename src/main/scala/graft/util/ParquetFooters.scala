package graft.util

import org.apache.hadoop.conf.Configuration

/** Driver-side parquet footer arithmetic for freshly-laid index dirs.
  *
  * A manifest [[ManifestCommit.DirEntry]] records its dir's exact row
  * count at lay time. Counting via `spark.read.parquet(dir).count()`
  * is metadata-only I/O but still a full Spark JOB (schedule, task per
  * split, result collection) — a fixed per-lay constant that the
  * streaming drains pay twice per micro-batch (bands.tail +
  * widths.tail). A fresh lay is a handful of part files whose footers
  * the driver can read directly: same exact number, zero jobs.
  *
  * Scale guard: above `MaxDriverFiles` files (a Major-compacted base at
  * corpus scale, where per-file footer round-trips on an object store
  * would serialize on the driver) callers should fall back to the
  * distributed count — [[rowCount]] returns None and the caller keeps
  * the Spark-job path.
  */
object ParquetFooters {

  private val MaxDriverFiles = 256

  /** Exact total row count of every parquet part file under `dir`
    * (recursive — partitioned lays keep part files in partition
    * subdirs), from footers read on the driver. None when the dir
    * holds more than [[MaxDriverFiles]] part files — the caller's cue
    * to run a distributed count instead.
    */
  def rowCount(conf: Configuration, dir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    val files = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.FileStatus]()
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      // only data files count: committers drop _SUCCESS and dot-files
      if (!name.startsWith("_") && !name.startsWith(".") && f.getLen > 0)
        files += f
      if (files.length > MaxDriverFiles) return None
    }
    var total = 0L
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try total += r.getRecordCount finally r.close()
    }
    Some(total)
  }
}
