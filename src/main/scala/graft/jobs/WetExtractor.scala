package graft.jobs

import graft.ops.Extractors
import graft.warc.{Predicates, WarcRecord, WarcWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.util.LongAccumulator

/** WET extraction (reference wet_extractor.py:59-199, P16/S11): convert
  * each WARC file's HTML responses to WET text-conversion records, write
  * one .warc.wet.gz per input archive (side-output, not a Spark sink),
  * and emit the coordinate table (uri → wet file/offset/length).
  *
  * Field parity with the reference:
  *  - records are grouped by (WARC-Target-URI, WARC-Date) so the
  *    *metadata* record's detected charset feeds the HTML decode and its
  *    cld2 languages land in `WARC-Identified-Content-Language`
  *    (wet_extractor.py:84-141);
  *  - conversion records carry `WARC-Record-ID`, `WARC-Refers-To` and
  *    `WARC-Block-Digest` (sha1, base32 — the warcio convention). The
  *    record id is a name-based UUID over (file, uri, date) where the
  *    reference uses a random uuid4: deterministic ids make re-runs
  *    byte-identical, which the resume check below relies on;
  *  - the WET warcinfo record copies robots/ispartof/operator/
  *    description/publisher from the source archive's warcinfo record
  *    (wet_extractor.py:60-81).
  *
  * Resume semantics match `check_for_output_file` (sparkcc.py:784-816):
  * an input whose WET output already exists is SKIPPED, so re-running
  * after a partial failure only does the remaining work — at 100 TB,
  * rewriting completed archives is the difference between a 1-hour and a
  * 20-hour recovery. Output is written to a temp file and atomically
  * renamed, so a task killed mid-write never leaves a truncated file
  * that a resume would wrongly skip. Each WET file gets a coords
  * sidecar (<name>.coords.gz); a skipped archive re-emits its rows
  * from the sidecar, so a resumed run's coordinate table is COMPLETE,
  * not just the newly-done archives. A file is only skipped when both
  * the WET output and its sidecar exist.
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
          numPartitions: Int = 8,
          skippedExisting: Option[LongAccumulator] = None): DataFrame = {
    import spark.implicits._
    val paths = spark.read.textFile(manifestPath)
      .filter(l => l.trim.nonEmpty && !l.startsWith("#"))
      .repartition(numPartitions)
    val shipped = graft.util.HadoopConfs.ship(spark)
    val coords: Dataset[WetCoord] = paths.mapPartitions { pathIter =>
      shipped.installHere() // session hadoop conf for the archive reads
      pathIter.flatMap { path => extractFile(path, outDir, skippedExisting) }
    }
    coords.toDF()
  }

  /** Sequential per-file state machine: stream records, group by
    * (uri, date), convert HTML responses, append WET records as we go.
    */
  private[jobs] def extractFile(path: String, outDir: String,
                                skippedExisting: Option[LongAccumulator] = None)
      : Iterator[WetCoord] = {
    val inName = new java.io.File(path.stripPrefix("file:")).getName
    val wetName = inName.replaceAll("\\.warc(\\.gz)?$", "") + ".warc.wet.gz"
    val wetPath = s"${outDir.stripSuffix("/")}/$wetName"
    val coordsPath = s"$wetPath.coords.gz"
    new java.io.File(outDir).mkdirs()
    // skip-if-output-exists: resume after partial failure must not redo
    // completed archives (sparkcc.py:784-816 + wet_extractor.py:146-148).
    // The sidecar is written last, so both-present ⇒ the pair is
    // complete; wet-without-sidecar (crash between the two renames) is
    // redone from scratch.
    if (new java.io.File(wetPath).exists() && new java.io.File(coordsPath).exists()) {
      skippedExisting.foreach(_.add(1))
      return readCoordsSidecar(coordsPath, wetName)
    }
    val tmpPath = java.nio.file.Files.createTempFile(
      java.nio.file.Paths.get(outDir), s".$wetName.", ".tmp")

    val out = Vector.newBuilder[WetCoord]
    var offset = 0L
    val fos = new java.io.FileOutputStream(tmpPath.toFile)
    try {
      val reader = try graft.warc.WarcReader.open(path)
      catch {
        case _: Exception =>
          fos.close(); java.nio.file.Files.deleteIfExists(tmpPath)
          return Iterator.empty
      }
      try {
        // (any exception below the reader-open — e.g. a disk-full write —
        // must not strand the temp file; see outer catch)
        // grouping state: one (uri, date) key in flight at a time
        var curUri: String = null
        var curDate: String = null
        var response: Option[WarcRecord] = None
        var metadata: Option[WarcRecord] = None
        var wroteInfo = false

        def flush(): Unit = {
          for (resp <- response if Predicates.isHtml(resp)) {
            val (charset, languages) =
              metadata.map(metaFields).getOrElse((None, None))
            Extractors.htmlToText(resp, charset).filter(_.nonEmpty).foreach { text =>
              val body = text.getBytes("UTF-8")
              val recId = "<urn:uuid:" + java.util.UUID.nameUUIDFromBytes(
                s"$wetName|$curUri|$curDate".getBytes("UTF-8")) + ">"
              val base = Map(
                "WARC-Type" -> "conversion",
                "WARC-Target-URI" -> curUri,
                "WARC-Date" -> curDate,
                "WARC-Record-ID" -> recId,
                "WARC-Refers-To" -> resp.recordId.getOrElse(""),
                "WARC-Block-Digest" -> sha1Base32(body),
                "Content-Type" -> "text/plain",
                "Content-Length" -> body.length.toString)
              val wet = WarcRecord(
                languages.fold(base)(l => base + ("WARC-Identified-Content-Language" -> l)),
                body)
              val len = writeRecord(fos, wet)
              out += WetCoord(curUri, curDate, wetName, offset, len)
              offset += len
            }
          }
          response = None
          metadata = None
          curUri = null
          curDate = null
        }

        reader.foreach { rec =>
          // WET warcinfo header from the FIRST record — if it is the source
          // warcinfo, its descriptive fields carry over (wet_extractor.py:60-81)
          if (!wroteInfo) {
            offset += writeRecord(fos, warcinfoRecord(wetName, inName, rec))
            wroteInfo = true
          }
          rec.recType match {
            case "response" | "metadata" =>
              val uri = rec.targetUri.getOrElse("")
              val date = rec.date.getOrElse("")
              if (curUri != null && (uri != curUri || date != curDate)) flush()
              if (curUri == null) { curUri = uri; curDate = date }
              if (rec.recType == "response") response = Some(rec)
              else metadata = Some(rec)
            case _ => () // warcinfo (handled above), request, conversion, ...
          }
        }
        flush()
      } finally reader.close()
    } catch {
      case e: Exception =>
        // never strand a .tmp: a retried/resumed task must find either
        // nothing or the complete (wet, sidecar) pair
        java.nio.file.Files.deleteIfExists(tmpPath)
        throw e
    } finally fos.close()
    val coords = out.result()
    java.nio.file.Files.move(tmpPath, java.nio.file.Paths.get(wetPath),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    writeCoordsSidecar(coordsPath, coords)
    coords.iterator
  }

  /** Sidecar I/O: one gzip TSV line per conversion record. The sidecar
    * is what lets a resumed run re-emit coordinates for archives it
    * skips; it is written tmp-then-rename after the WET file itself.
    */
  private def writeCoordsSidecar(coordsPath: String, coords: Seq[WetCoord]): Unit = {
    val tmp = java.nio.file.Files.createTempFile(
      java.nio.file.Paths.get(coordsPath).getParent, ".coords.", ".tmp")
    val w = new java.io.OutputStreamWriter(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(tmp.toFile)), "UTF-8")
    try coords.foreach { c =>
      w.write(s"${c.url}\t${c.warc_date}\t${c.wet_offset}\t${c.wet_length}\n")
    } catch {
      case e: Exception =>
        w.close(); java.nio.file.Files.deleteIfExists(tmp); throw e
    } finally w.close()
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(coordsPath),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def readCoordsSidecar(coordsPath: String, wetName: String): Iterator[WetCoord] = {
    val src = scala.io.Source.fromInputStream(new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(coordsPath)), "UTF-8")
    try {
      src.getLines().flatMap { line =>
        line.split("\t", -1) match {
          case Array(url, date, off, len) =>
            Some(WetCoord(url, date, wetName, off.toLong, len.toLong))
          case _ => None
        }
      }.toVector.iterator
    } finally src.close()
  }

  /** charset-detected / languages-cld2 from a metadata record's payload
    * (wet_extractor.py:99-114). Languages become the comma-joined
    * iso-639-3 codes.
    */
  private[jobs] def metaFields(m: WarcRecord): (Option[String], Option[String]) = {
    var charset: Option[String] = None
    var languages: Option[String] = None
    try {
      val content = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
      content.split("\r?\n").foreach { line =>
        if (line.startsWith("charset-detected:"))
          charset = Some(line.substring("charset-detected:".length).trim).filter(_.nonEmpty)
        else if (line.startsWith("languages-cld2:")) {
          val codes = Iso639Re.findAllMatchIn(line).map(_.group(1)).toSeq
          if (codes.nonEmpty) languages = Some(codes.mkString(","))
        }
      }
    } catch { case _: Exception => () }
    (charset, languages)
  }

  private val Iso639Re = """"code-iso-639-3"\s*:\s*"([^"]+)"""".r

  private def warcinfoRecord(wetName: String, inName: String,
                             first: WarcRecord): WarcRecord = {
    // date derived from the source archive, NOT Instant.now(): the
    // deterministic record ids only make re-runs byte-identical (the
    // resume contract above) if the warcinfo dates are reproducible too
    val srcDate = first.date.getOrElse("1970-01-01T00:00:00Z")
    val fields = scala.collection.mutable.LinkedHashMap(
      "Software-Info" -> "graft wet extractor (Spark-native)",
      "Extracted-Date" -> srcDate)
    if (first.recType == "warcinfo") {
      val carried = Set("robots", "ispartof", "operator", "description", "publisher")
      try {
        new String(first.payload, "UTF-8").split("\r?\n").foreach { line =>
          val i = line.indexOf(':')
          if (i > 0 && carried.contains(line.substring(0, i).trim.toLowerCase))
            fields(line.substring(0, i).trim) = line.substring(i + 1).trim
        }
      } catch { case _: Exception => () }
    }
    val body = fields.map { case (k, v) => s"$k: $v\r\n" }.mkString.getBytes("UTF-8")
    WarcRecord(Map(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> srcDate,
      "WARC-Filename" -> wetName,
      "WARC-Record-ID" -> ("<urn:uuid:" + java.util.UUID.nameUUIDFromBytes(
        s"warcinfo|$wetName|$inName".getBytes("UTF-8")) + ">"),
      "Content-Type" -> "application/warc-fields",
      "Content-Length" -> body.length.toString), body)
  }

  /** sha1 digest in base32 — warcio's Block-Digest convention. */
  private[jobs] def sha1Base32(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder("sha1:")
    var buffer = 0L
    var bits = 0
    d.foreach { b =>
      buffer = (buffer << 8) | (b & 0xffL)
      bits += 8
      while (bits >= 5) {
        sb.append(alphabet(((buffer >> (bits - 5)) & 31).toInt))
        bits -= 5
      }
    }
    if (bits > 0) sb.append(alphabet(((buffer << (5 - bits)) & 31).toInt))
    sb.toString
  }

  private def writeRecord(fos: java.io.FileOutputStream, rec: WarcRecord): Long = {
    val bos = new java.io.ByteArrayOutputStream()
    new WarcWriter(bos).writeRecord(rec)
    val bytes = bos.toByteArray
    fos.write(bytes)
    bytes.length.toLong
  }
}
