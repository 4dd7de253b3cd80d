package graft.warc

import java.io.OutputStream
import java.util.zip.GZIPOutputStream

/** WARC writer: one gzip member per record (the Common Crawl layout, so
  * ranged fetches can decompress a single record independently —
  * reference sparkcc.py:617-640 depends on this property, and
  * wet_extractor.py:142-183 produces files shaped like this).
  */
final class WarcWriter(out: OutputStream) {

  def writeRecord(rec: WarcRecord): Unit = {
    val gz = new GZIPOutputStream(out, 1 << 14)
    val sb = new java.lang.StringBuilder()
    sb.append("WARC/1.0\r\n")
    val withLen = rec.headers - "Content-Length" +
      ("Content-Length" -> rec.payload.length.toString)
    withLen.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("\r\n")
    gz.write(sb.toString.getBytes("US-ASCII"))
    gz.write(rec.payload)
    gz.write("\r\n\r\n".getBytes("US-ASCII"))
    gz.finish()
  }

  def close(): Unit = out.close()
}

object WarcWriter {

  /** Streaming write through the Hadoop FileSystem API (file:, hdfs:,
    * s3a:). Records land one gzip member at a time as the iterator
    * produces them — peak memory is one record, so an executor task can
    * rewrite an arbitrarily large archive. `onRecord` observes each
    * record's (offset, length) as it is written; those coordinates are
    * exact by construction (the columnar-index contract,
    * wet_extractor.py:27-34).
    */
  def writeHadoop(path: String, records: Iterator[WarcRecord])
                 (onRecord: (WarcRecord, Long, Long) => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    // HadoopConfs.get: the session's spark.hadoop.* settings when the
    // task shipped them — executor-side s3a writes need the credentials
    val fs = p.getFileSystem(graft.util.HadoopConfs.get)
    val out = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 16)
    var pos = 0L
    try {
      records.foreach { r =>
        val bos = new java.io.ByteArrayOutputStream(1 << 14)
        new WarcWriter(bos).writeRecord(r)
        val bytes = bos.toByteArray
        out.write(bytes)
        onRecord(r, pos, bytes.length.toLong)
        pos += bytes.length
      }
    } finally out.close()
  }

  /** Convenience: write records to a local .warc.gz file. Returns
    * per-record (offset, length) coordinates — the shape of the columnar
    * index / wet_record_location struct (wet_extractor.py:27-34).
    */
  def writeFile(path: String, records: Seq[WarcRecord]): Seq[(Long, Long)] = {
    val fos = new java.io.FileOutputStream(path)
    val counting = new java.io.BufferedOutputStream(fos)
    var offsets = Vector.empty[(Long, Long)]
    var pos = 0L
    records.foreach { r =>
      val bos = new java.io.ByteArrayOutputStream()
      new WarcWriter(bos).writeRecord(r)
      val bytes = bos.toByteArray
      counting.write(bytes)
      offsets :+= (pos, bytes.length.toLong)
      pos += bytes.length
    }
    counting.close()
    offsets
  }
}
