package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader for the driver-generated parquet tables at /root/testdata/sf*.
  *
  * `events.parquet` has shipped with two physical timestamp encodings
  * across testdata generations: TIMESTAMP(NANOS) (which Spark's parquet
  * reader only accepts as a LongType of ns-since-epoch via the legacy
  * `nanosAsLong` flag) and TIMESTAMP(MICROS) (read natively as
  * TimestampType/TimestampNTZType). Consumers must not assume either:
  * they normalize through [[tsMicros]], which branches on the LOGICAL
  * post-load type, so a driver-side regeneration flips zero queries.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Event-time column normalized to µs-since-epoch (LongType),
    * adaptive to how the physical schema was read:
    *   - LongType        → legacy nanos-as-long → integer-divide by 1000
    *   - Timestamp(NTZ)  → `unix_micros` (NTZ is cast first; sessions pin
    *                       `spark.sql.session.timeZone=UTC`, so the cast
    *                       is the identity mapping the DuckDB oracle uses
    *                       for naive parquet timestamps)
    * µs (not ns) is the normal form because DuckDB's TIMESTAMP is µs —
    * both engines must order and emit the same digits.
    */
  def tsMicros(schema: StructType, name: String): Column =
    schema(name).dataType match {
      case LongType => expr(s"$name div 1000")
      case TimestampType | TimestampNTZType =>
        unix_micros(col(name).cast(TimestampType))
      case dt => throw new IllegalArgumentException(
        s"events column '$name' has unsupported type $dt " +
          "(expected long ns, timestamp, or timestamp_ntz)")
    }

  /** [[tsMicros]] over a DataFrame's `ts` column. */
  def tsMicros(df: DataFrame): Column = tsMicros(df.schema, "ts")

  /** Event-time as a proper TimestampType column (µs precision, UTC
    * session) regardless of the physical encoding — the ingest form for
    * streaming/window operators that need timestamp semantics.
    */
  def tsTimestamp(df: DataFrame): Column = timestamp_micros(tsMicros(df))
}
