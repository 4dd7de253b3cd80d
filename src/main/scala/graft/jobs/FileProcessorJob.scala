package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-file processing (reference CCFileProcessorSparkJob,
  * sparkcc.py:664-848): fetch each input file to a local temp path and
  * run a per-file function — S8 + the external-command operator P15
  * (md5sum.py:17-20).
  */
object FileProcessorJob {

  /** S8: spool each file to a named temp file, apply `process`, clean up.
    * `process` receives (original path, local temp path). Inputs come
    * from any scheme the fetch seam speaks — http(s) via HttpClient,
    * file:/hdfs:/s3a: via the Hadoop FS API (sparkcc.py:703-764's
    * multi-scheme fetch_file). Failed inputs are counted (reference
    * fault model: count and continue) and skipped.
    */
  def processFiles[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, manifestPath: String, numPartitions: Int,
      failedAcc: Option[org.apache.spark.util.LongAccumulator] = None,
      baseUrl: Option[String] = None,
      tempDir: Option[String] = None)(
      process: (String, java.nio.file.Path) => Iterator[T]): org.apache.spark.sql.Dataset[T] = {
    import spark.implicits._
    val shipped = graft.util.HadoopConfs.ship(spark)
    spark.read.textFile(manifestPath)
      .filter(l => l.trim.nonEmpty && !l.startsWith("#"))
      .repartition(numPartitions)
      .flatMap { path0 =>
        shipped.installHere() // session hadoop conf for the fetch
        val path = graft.warc.WarcSource.resolveUri(path0, baseUrl)
        // --local_temp_dir (sparkcc.py:74-77): spool to a caller-chosen
        // scratch dir (fast local disk on real executors) when given
        val tmp = tempDir match {
          case Some(d) =>
            val dir = java.nio.file.Paths.get(d)
            java.nio.file.Files.createDirectories(dir)
            java.nio.file.Files.createTempFile(dir, "graft_file", suffixOf(path))
          case None =>
            java.nio.file.Files.createTempFile("graft_file", suffixOf(path))
        }
        // a task killed mid-iteration never exhausts the iterator below —
        // the completion listener is the cleanup that always runs
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          java.nio.file.Files.deleteIfExists(tmp); ()
        }
        try {
          val in = graft.warc.WarcReader.openRaw(path)
          try java.nio.file.Files.copy(in, tmp,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          // stream the hook's rows through (no per-file materialization —
          // a hook emitting millions of rows per file must not buffer
          // them); the temp file is deleted on exhaustion, so at most one
          // spooled file exists per running task at a time
          val inner = process(path, tmp)
          new Iterator[T] {
            private var failed = false
            override def hasNext: Boolean = {
              if (failed) return false
              val h =
                try inner.hasNext
                catch { case _: Exception =>
                  failedAcc.foreach(_.add(1)); failed = true; false
                }
              if (!h) java.nio.file.Files.deleteIfExists(tmp)
              h
            }
            override def next(): T = inner.next()
          }
        } catch {
          case _: Exception =>
            failedAcc.foreach(_.add(1))
            java.nio.file.Files.deleteIfExists(tmp)
            Iterator.empty
        }
      }
  }

  /** P15: run an external command per file, emit (uri, stdout-token) —
    * the md5sum job (md5sum.py:17-20). Falls back to JVM MessageDigest
    * when the binary is absent.
    */
  def md5sum(spark: SparkSession, manifestPath: String,
             numPartitions: Int = 4, useExternal: Boolean = true,
             failedAcc: Option[org.apache.spark.util.LongAccumulator] = None,
             baseUrl: Option[String] = None,
             tempDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    processFiles[(String, String)](spark, manifestPath, numPartitions, failedAcc,
        baseUrl, tempDir) { (path, tmp) =>
      val digest =
        if (useExternal && new java.io.File("/usr/bin/md5sum").exists()) {
          val proc = new ProcessBuilder("/usr/bin/md5sum", tmp.toString).start()
          val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
          proc.waitFor()
          out.split("\\s+").headOption.getOrElse("")
        } else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val bytes = java.nio.file.Files.readAllBytes(tmp)
          md.digest(bytes).map("%02x".format(_)).mkString
        }
      Iterator.single((path, digest))
    }.toDF("uri", "md5")
  }

  private def suffixOf(path: String): String = {
    val name = new java.io.File(path).getName
    val i = name.indexOf('.')
    if (i >= 0) name.substring(i) else ".bin"
  }
}
