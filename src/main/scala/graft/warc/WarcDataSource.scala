package graft.warc

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 WARC reader: `spark.read.format("warc").load(pathOrDir)`.
  *
  * One input partition per archive file (a WARC member stream is not
  * splittable mid-file without an index; at cluster scale parallelism
  * comes from the archive count — Common Crawl ships ~64k files per
  * crawl). Record-type filtering happens via the `record_type` option at
  * the reader (the fastwarc_record_filter analogue,
  * sparkcc_fastwarc.py:14-27), skipping non-matching records before any
  * row materialization.
  *
  * Schema: path, warc_type, target_uri, warc_date, content_type,
  * headers map, payload binary.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(properties.getOrDefault("path", ""),
      Option(properties.get("record_type")))
}

object WarcDataSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("payload", BinaryType)))

  /** Expand a path (file, directory, or comma-list; any Hadoop scheme) to
    * archive files. Missing paths error at planning time (not
    * silently-empty scans).
    */
  def expand(path: String): Seq[String] = {
    // planning runs on the driver: use the session's Hadoop conf so
    // object-store listings see spark.hadoop.* credentials
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(graft.util.HadoopConfs.get)
    path.split(",").map(_.trim).filter(_.nonEmpty).toSeq.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      if (!fs.exists(hp))
        throw new IllegalArgumentException(s"warc source: path not found: $p")
      val status = fs.getFileStatus(hp)
      if (status.isDirectory)
        fs.listStatus(hp).toSeq
          .filter(s => s.isFile && s.getPath.getName.contains(".warc"))
          .map(_.getPath.toString).sorted
      else Seq(hp.toString)
    }
  }
}

class WarcTable(path: String, recordType: Option[String])
    extends Table with SupportsRead {
  override def name(): String = s"warc:$path"
  override def schema(): StructType = WarcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(
      if (path.nonEmpty) path else options.get("path"),
      recordType.orElse(Option(options.get("record_type"))))
}

/** `WHERE warc_type = '...'` / `IN (...)` predicates push into the reader
  * (SupportsPushDownFilters) — records of other types are skipped before
  * any row materialization, the DSv2 form of the reference's parse-time
  * record filter (sparkcc_fastwarc.py:14-27). Column pruning
  * (SupportsPushDownRequiredColumns) means a `count()` or a
  * warc_type-only projection never copies payload bytes or builds the
  * header map.
  */
class WarcScanBuilder(path: String, recordType: Option[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushedTypes: Option[Set[String]] = recordType.map(Set(_))
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = WarcDataSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("warc_type", _: String) => true
      case In("warc_type", vs) if vs.forall(_.isInstanceOf[String]) => true
      case _ => false
    }
    val types = accepted.flatMap {
      case EqualTo(_, v: String) => Seq(v)
      case In(_, vs) => vs.map(_.toString).toSeq
      case _ => Seq.empty
    }.toSet
    if (types.nonEmpty)
      pushedTypes = Some(pushedTypes.map(_.intersect(types)).getOrElse(types))
    pushed = accepted
    rest // Spark still re-applies accepted filters unless we claim them exact
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new WarcScan(path, pushedTypes, required)
}

class WarcScan(path: String, recordTypes: Option[Set[String]],
               required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    WarcDataSource.expand(path).map(p => WarcInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(recordTypes, required,
      org.apache.spark.sql.SparkSession.getActiveSession
        .map(graft.util.HadoopConfs.ship))
  override def toMicroBatchStream(
      checkpointLocation: String): streaming.MicroBatchStream =
    new WarcMicroBatchStream(path, recordTypes, required)
  override def description(): String =
    s"WarcScan(path=$path, pushedTypes=${recordTypes.getOrElse(Set.empty).mkString(",")}, " +
      s"columns=${required.fieldNames.mkString(",")})"
}

/** Structured Streaming over a landing directory of WARC archives — the
  * 24/7 crawl-ingest shape: new `.warc(.gz)` files appear, each
  * micro-batch processes exactly the not-yet-seen files, and the
  * engine's checkpoint makes a restart resume without reprocessing.
  * The batch ScanBuilder is shared, so warc_type pushdown and column
  * pruning apply to the STREAM too (a streaming `WHERE warc_type =
  * 'response'` never materializes other records).
  *
  * Offset = the sorted set of files already visible, serialized as a
  * JSON array (the same information FileStreamSource keeps in its seen
  * log; fine for landing dirs, whose file count a compaction job
  * bounds). A batch's partitions are `end.files -- start.files` — one
  * per new archive, the natural WARC work unit.
  */
class WarcMicroBatchStream(path: String, recordTypes: Option[Set[String]],
                           required: StructType)
    extends streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = WarcSourceOffset(Nil)
  override def latestOffset(): Offset =
    WarcSourceOffset(WarcDataSource.expand(path).sorted)
  override def deserializeOffset(json: String): Offset =
    WarcSourceOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcSourceOffset].files.toSet
    end.asInstanceOf[WarcSourceOffset].files.filterNot(seen)
      .map(p => WarcInputPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(recordTypes, required,
      org.apache.spark.sql.SparkSession.getActiveSession
        .map(graft.util.HadoopConfs.ship))
}

case class WarcSourceOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    org.json4s.jackson.Serialization.write(files)
  }
}

object WarcSourceOffset {
  def fromJson(j: String): WarcSourceOffset = {
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    WarcSourceOffset(org.json4s.jackson.Serialization.read[Seq[String]](j))
  }
}

case class WarcInputPartition(file: String) extends InputPartition

class WarcReaderFactory(recordTypes: Option[Set[String]], required: StructType,
                        shipped: Option[graft.util.HadoopConfs.Shipped] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    shipped.foreach(_.installHere()) // session hadoop conf for executor opens
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition].file,
      recordTypes, required)
  }
}

class WarcPartitionReader(file: String, recordTypes: Option[Set[String]],
                          required: StructType)
    extends PartitionReader[InternalRow] {

  // corrupt/unreadable archives yield an empty partition (count-and-
  // continue fault model, same as the manifest path — sparkcc.py:390-392)
  private val reader: Option[WarcReader] =
    try Some(WarcReader.open(file)) catch { case _: Exception => None }
  private val pathUtf8 = UTF8String.fromString(file)
  private var current: WarcRecord = _

  // one writer per required column, bound once at reader construction
  private val fieldWriters: Array[WarcRecord => Any] =
    required.fieldNames.map {
      case "path"         => (_: WarcRecord) => pathUtf8
      case "warc_type"    => (r: WarcRecord) => UTF8String.fromString(r.recType)
      case "target_uri"   => (r: WarcRecord) => r.targetUri.map(UTF8String.fromString).orNull
      case "warc_date"    => (r: WarcRecord) => r.date.map(UTF8String.fromString).orNull
      case "content_type" => (r: WarcRecord) => r.contentType.map(UTF8String.fromString).orNull
      case "headers" => (r: WarcRecord) => {
        val keys = r.headers.keys.toArray[Any].map(k => UTF8String.fromString(k.toString))
        val vals = r.headers.values.toArray[Any].map(v => UTF8String.fromString(v.toString))
        ArrayBasedMapData(keys, vals)
      }
      case "payload" => (r: WarcRecord) => r.payload
      case other => throw new IllegalArgumentException(s"unknown warc column: $other")
    }

  override def next(): Boolean = {
    reader match {
      case None => false
      case Some(rd) =>
        try {
          while (rd.hasNext) {
            val r = rd.next()
            if (recordTypes.forall(_.contains(r.recType))) { current = r; return true }
          }
          false
        } catch { case _: Exception => false }
    }
  }

  override def get(): InternalRow = {
    val r = current
    InternalRow.fromSeq(fieldWriters.map(_(r)).toIndexedSeq)
  }

  // one open handle per in-flight partition, not per completed one: with
  // ~64k archives per crawl a leaked descriptor per partition exhausts
  // the executor's fd table long before GC finalizes the streams
  override def close(): Unit = reader.foreach(_.close())
}
