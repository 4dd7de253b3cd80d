package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables at /root/testdata/sf*.
  *
  * `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
  * rejects by default (PARQUET_TYPE_ILLEGAL); we flip the legacy flag so
  * nanos arrive as a LongType column (ns since epoch) and convert
  * explicitly where timestamp semantics are needed.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
