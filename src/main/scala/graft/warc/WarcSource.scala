package graft.warc

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Manifest-driven WARC scan (reference sparkcc.py:212-214 S1 + 367-392
  * S2) and the ranged record fetch (sparkcc.py:617-640 S7/J2 — the
  * "index → payload join", the system's signature operator).
  *
  * Scale design: the manifest is repartitioned so each task streams a
  * few archives; record parsing never materializes a whole file. The
  * ranged fetch shuffles only coordinate rows (url, file, offset, length)
  * and opens each archive once per partition-local group — sort the
  * coordinates by (file, offset) upstream so seeks are sequential.
  */
object WarcSource {

  private val SchemePattern = "^(s3[an]?|https?|file|hdfs):.*".r.pattern

  /** Relative manifest entries get the base URL prefixed
    * (sparkcc.py:260-277) — the switch between `s3://commoncrawl/` and
    * `https://data.commoncrawl.org/` access to the same keys. Entries
    * that already carry a scheme pass through untouched.
    */
  def resolveUri(uri: String, baseUrl: Option[String]): String =
    baseUrl match {
      case Some(b) if !SchemePattern.matcher(uri).matches() => b + uri
      case _ => uri
    }

  /** Records from a manifest (one archive URI per line). */
  def fromManifest(spark: SparkSession, manifestPath: String,
                   numPartitions: Int = 32,
                   errorAcc: Option[LongAccumulator] = None,
                   baseUrl: Option[String] = None): Dataset[(String, WarcRecord)] = {
    import spark.implicits._
    val shipped = graft.util.HadoopConfs.ship(spark)
    val paths = spark.read.textFile(manifestPath)
      .filter(l => l.trim.nonEmpty && !l.startsWith("#"))
      .repartition(numPartitions)
    paths.flatMap { p0 =>
      shipped.installHere() // session hadoop conf for WarcReader.open
      val p = resolveUri(p0, baseUrl)
      readPath(p, errorAcc).map(r => (p, r))
    }
  }

  /** Records from explicit paths (testing / small jobs). */
  def fromPaths(spark: SparkSession, paths: Seq[String],
                numPartitions: Int = 4,
                errorAcc: Option[LongAccumulator] = None): Dataset[(String, WarcRecord)] = {
    import spark.implicits._
    val shipped = graft.util.HadoopConfs.ship(spark)
    spark.createDataset(paths).repartition(numPartitions)
      .flatMap { p =>
        shipped.installHere()
        readPath(p, errorAcc).map(r => (p, r))
      }
  }

  private def readPath(p: String, errorAcc: Option[LongAccumulator]): Iterator[WarcRecord] = {
    try {
      val reader = WarcReader.open(p)
      // a task killed mid-file (limit, failure) never exhausts the
      // iterator — the completion listener is the only close that always
      // runs
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => reader.close())
      new Iterator[WarcRecord] {
        private var finished = false // latch: count failures + close ONCE
        override def hasNext: Boolean = {
          val h = reader.hasNext
          if (!h && !finished) {
            finished = true
            if (reader.failures > 0) errorAcc.foreach(_.add(reader.failures))
            reader.close()
          }
          h
        }
        override def next(): WarcRecord = reader.next()
      }
    } catch {
      case _: Exception =>
        errorAcc.foreach(_.add(1))
        Iterator.empty
    }
  }

  /** Coordinate row for the ranged fetch (sparkcc.py:553-557). */
  final case class RecordCoord(url: String, warc_filename: String,
                               warc_record_offset: Long, warc_record_length: Long,
                               content_charset: Option[String] = None)

  /** Ranged fetch: for each coordinate, read exactly [offset, offset+length)
    * of the archive and parse the single gzip-member record inside
    * (sparkcc.py:617-640). One open file handle per distinct archive per
    * partition; seeks are forward-only if coordinates are sorted.
    */
  def fetchRecords(spark: SparkSession, coords: Dataset[RecordCoord],
                   errorAcc: Option[LongAccumulator] = None): Dataset[(String, WarcRecord)] = {
    import spark.implicits._
    val shipped = graft.util.HadoopConfs.ship(spark)
    coords.mapPartitions { it =>
      shipped.installHere()
      val conf = shipped.value
      var current: (String, org.apache.hadoop.fs.FSDataInputStream) = null
      // the last archive of a partition has no "file switch" to close it —
      // the completion listener is what closes it
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
        if (current != null) { try current._2.close() catch { case _: Exception => () } }
      }
      def file(name: String): org.apache.hadoop.fs.FSDataInputStream = {
        if (current == null || current._1 != name) {
          if (current != null) current._2.close()
          val p = new org.apache.hadoop.fs.Path(name)
          current = (name, p.getFileSystem(conf).open(p, 1 << 16))
        }
        current._2
      }
      def rangeBytes(c: RecordCoord): Array[Byte] =
        if (WarcReader.isHttpUrl(c.warc_filename))
          // http(s) coordinates: one Range GET per record, the reference's
          // fetch path for the public endpoint (sparkcc.py:320-339)
          WarcReader.httpRange(c.warc_filename, c.warc_record_offset,
            c.warc_record_length.toInt)
        else {
          val raf = file(c.warc_filename)
          raf.seek(c.warc_record_offset)
          val buf = new Array[Byte](c.warc_record_length.toInt)
          raf.readFully(buf)
          buf
        }
      it.flatMap { c =>
        try {
          val buf = rangeBytes(c)
          val in: java.io.InputStream = {
            val bais = new java.io.ByteArrayInputStream(buf)
            if (c.warc_filename.endsWith(".gz"))
              new java.util.zip.GZIPInputStream(bais) else bais
          }
          val reader = new WarcReader(in)
          if (reader.hasNext) {
            val rec = reader.next()
            // charset forwarding (sparkcc.py:609-615): piggyback the
            // coordinate row's charset as a pseudo-header
            val withCs = c.content_charset match {
              case Some(cs) => rec.copy(headers =
                rec.headers + ("WARC-Identified-Content-Charset" -> cs))
              case None => rec
            }
            Iterator.single((c.url, withCs))
          } else {
            errorAcc.foreach(_.add(1)); Iterator.empty
          }
        } catch {
          case _: Exception =>
            errorAcc.foreach(_.add(1)); Iterator.empty
        }
      }
    }
  }
}
