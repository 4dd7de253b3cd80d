package graft.sources

import graft.warc.WarcSource.RecordCoord
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Coordinate-table loading for the index→payload join (reference
  * sparkcc.py:569-607): SQL over the columnar index, CSV, or any generic
  * format — S4/S5/S6 in SURVEY §2.1.
  */
object CoordinateSource {

  val Columns = Seq("url", "warc_filename", "warc_record_offset", "warc_record_length")

  /** S5: CSV with header+inferSchema (sparkcc.py:591-593). */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S6: generic format + reader options (sparkcc.py:594-598). */
  def fromTable(spark: SparkSession, path: String, format: String,
                options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format).options(options).load(path)

  /** S4/E2: SQL text over a registered parquet index view
    * (sparkcc.py:489-506) — the one user-SQL entry point.
    */
  def fromIndexQuery(spark: SparkSession, indexPath: String, query: String,
                     viewName: String = "ccindex",
                     schemaJson: Option[String] = None): DataFrame = {
    val reader = schemaJson match {
      case Some(js) => spark.read.schema(
        org.apache.spark.sql.types.DataType.fromJson(js)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      case None => spark.read
    }
    reader.parquet(indexPath).createOrReplaceTempView(viewName)
    spark.sql(query)
  }

  /** Project/validate coordinate columns and repartition for the fetch
    * phase (sparkcc.py:600-603, 645-648). Sorting within partitions by
    * (file, offset) makes the ranged reads sequential per archive.
    */
  def toCoords(df: DataFrame, numPartitions: Int,
               charsetCol: Option[String] = None): Dataset[RecordCoord] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(
      col("url").cast("string"),
      col("warc_filename").cast("string"),
      col("warc_record_offset").cast("long"),
      col("warc_record_length").cast("long"),
      charsetCol.map(c => col(c).cast("string")).getOrElse(lit(null: String))
        .as("content_charset"))
    base.repartition(numPartitions, col("warc_filename"))
      .sortWithinPartitions(col("warc_filename"), col("warc_record_offset"))
      .as[RecordCoord]
  }
}
