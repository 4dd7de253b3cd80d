package graft.jobs

import graft.ops.{Extractors, HtmlText}
import graft.warc.{Predicates, WarcRecord, WarcSource, WarcWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** WET extraction (reference wet_extractor.py:59-199, P16/S11): convert
  * each WARC file's HTML responses to WET text-conversion records, write
  * one .warc.wet.gz per input archive (side-output, not a Spark sink),
  * and emit the coordinate table (uri → wet file/offset/length).
  *
  * This is the one genuinely order-dependent operator: records are
  * processed in file order inside a sequential mapPartitions, one output
  * file per input archive — the structure a 1000-executor run needs too
  * (each task owns whole archives; no shuffle of payload bytes at all).
  */
object WetExtractor {

  final case class WetCoord(url: String, warc_date: String,
                            wet_file: String, wet_offset: Long, wet_length: Long)

  def run(spark: SparkSession, manifestPath: String, outDir: String,
          numPartitions: Int = 8): DataFrame = {
    import spark.implicits._
    val paths = spark.read.textFile(manifestPath)
      .filter(l => l.trim.nonEmpty && !l.startsWith("#"))
      .repartition(numPartitions)
    val coords: Dataset[WetCoord] = paths.mapPartitions { pathIter =>
      pathIter.flatMap { path => extractFile(path, outDir) }
    }
    coords.toDF()
  }

  /** Sequential per-file state machine: stream records, convert HTML
    * responses, append WET records to the output file as we go.
    */
  private[jobs] def extractFile(path: String, outDir: String): Iterator[WetCoord] = {
    val inName = new java.io.File(path.stripPrefix("file:")).getName
    val wetName = inName.replaceAll("\\.warc(\\.gz)?$", "") + ".warc.wet.gz"
    val wetPath = s"${outDir.stripSuffix("/")}/$wetName"
    new java.io.File(outDir).mkdirs()
    // idempotence / resume check (sparkcc.py:784-816)
    val outFile = new java.io.File(wetPath)
    if (outFile.exists()) outFile.delete()

    val out = Vector.newBuilder[WetCoord]
    var offset = 0L
    val fos = new java.io.FileOutputStream(wetPath)
    try {
      val reader = try graft.warc.WarcReader.open(path)
      catch { case _: Exception => return Iterator.empty }
      // warcinfo header record for the WET file (wet_extractor.py:59-64)
      val info = WarcRecord(Map(
        "WARC-Type" -> "warcinfo",
        "WARC-Date" -> java.time.Instant.now().toString,
        "WARC-Filename" -> wetName,
        "Content-Type" -> "application/warc-fields",
        "Content-Length" -> "0"),
        s"software: graft\nextractedFrom: $inName\n".getBytes("UTF-8"))
      offset += writeRecord(fos, info)

      reader.foreach { rec =>
        if (Predicates.isResponse(rec) && Predicates.isHtml(rec)) {
          Extractors.htmlToText(rec).filter(_.nonEmpty).foreach { text =>
            val body = text.getBytes("UTF-8")
            val uri = rec.targetUri.getOrElse("")
            val date = rec.date.getOrElse("")
            val wet = WarcRecord(Map(
              "WARC-Type" -> "conversion",
              "WARC-Target-URI" -> uri,
              "WARC-Date" -> date,
              "WARC-Refers-To" -> rec.recordId.getOrElse(""),
              "Content-Type" -> "text/plain",
              "Content-Length" -> body.length.toString), body)
            val len = writeRecord(fos, wet)
            out += WetCoord(uri, date, wetName, offset, len)
            offset += len
          }
        }
      }
    } finally fos.close()
    out.result().iterator
  }

  private def writeRecord(fos: java.io.FileOutputStream, rec: WarcRecord): Long = {
    val bos = new java.io.ByteArrayOutputStream()
    new WarcWriter(bos).writeRecord(rec)
    val bytes = bos.toByteArray
    fos.write(bytes)
    bytes.length.toLong
  }
}
