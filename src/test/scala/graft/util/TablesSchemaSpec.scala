package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata schema canary: the driver regenerates /root/testdata between
  * rounds and has already flipped events.ts physical encoding once
  * (TIMESTAMP(NANOS) → TIMESTAMP(MICROS) in round 8 — which broke 9
  * scattered queries and 6 suites). This spec pins each table's
  * POST-LOAD logical schema in one place, so the next regeneration fails
  * ONE NAMED TEST instead of a constellation of query errors; both
  * Tables.tsMicros branches stay covered (micros on the real table, the
  * legacy nanos-as-long branch on a synthesized fixture).
  */
class TablesSchemaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  /** Time-ish columns the driver has regenerated with different physical
    * encodings; the contract is "one of the types tsMicros understands",
    * not a single frozen type.
    */
  private val tsLike: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  private def fields(name: String): Map[String, DataType] =
    Tables(spark, sfDir, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("canary: every table loads with the pinned logical schema") {
    val expected: Map[String, Map[String, Either[DataType, Unit]]] = Map(
      "region" -> Map("r_regionkey" -> Left(IntegerType), "r_name" -> Left(StringType)),
      "nation" -> Map("n_nationkey" -> Left(IntegerType), "n_name" -> Left(StringType),
        "n_regionkey" -> Left(IntegerType)),
      "customer" -> Map("c_custkey" -> Left(LongType), "c_name" -> Left(StringType),
        "c_nationkey" -> Left(IntegerType), "c_acctbal" -> Left(DoubleType),
        "c_mktsegment" -> Left(StringType)),
      "supplier" -> Map("s_suppkey" -> Left(LongType), "s_name" -> Left(StringType),
        "s_nationkey" -> Left(IntegerType), "s_acctbal" -> Left(DoubleType)),
      "part" -> Map("p_partkey" -> Left(LongType), "p_name" -> Left(StringType),
        "p_brand" -> Left(StringType), "p_type" -> Left(StringType),
        "p_size" -> Left(IntegerType), "p_retailprice" -> Left(DoubleType)),
      "orders" -> Map("o_orderkey" -> Left(LongType), "o_custkey" -> Left(LongType),
        "o_orderstatus" -> Left(StringType), "o_totalprice" -> Left(DoubleType),
        "o_orderdate" -> Right(()), "o_orderpriority" -> Left(StringType)),
      "lineitem" -> Map("l_orderkey" -> Left(LongType), "l_partkey" -> Left(LongType),
        "l_suppkey" -> Left(LongType), "l_linenumber" -> Left(IntegerType),
        "l_quantity" -> Left(DoubleType), "l_extendedprice" -> Left(DoubleType),
        "l_discount" -> Left(DoubleType), "l_tax" -> Left(DoubleType),
        "l_returnflag" -> Left(StringType), "l_linestatus" -> Left(StringType),
        "l_shipdate" -> Right(())),
      "events" -> Map("event_id" -> Left(LongType), "ts" -> Right(()),
        "user_id" -> Left(LongType), "event_type" -> Left(StringType),
        "value" -> Left(DoubleType), "props" -> Left(StringType)),
      "documents" -> Map("doc_id" -> Left(LongType), "text" -> Left(StringType),
        "lang" -> Left(StringType), "source" -> Left(StringType),
        "n_chars" -> Left(LongType)),
      "embeddings" -> Map("vec_id" -> Left(LongType),
        "embedding" -> Left(ArrayType(FloatType)), "label" -> Left(IntegerType)))
    expected.foreach { case (table, cols) =>
      val got = fields(table)
      assert(got.keySet == cols.keySet,
        s"$table columns changed: got ${got.keySet}, pinned ${cols.keySet}")
      cols.foreach {
        case (c, Left(dt)) =>
          assert(got(c) == dt, s"$table.$c is ${got(c)}, pinned $dt")
        case (c, Right(())) =>
          assert(tsLike.contains(got(c)),
            s"$table.$c is ${got(c)}, not a tsMicros-supported time type " +
              "— extend Tables.tsMicros before any query touches it")
      }
    }
  }

  test("canary: events time span is days, not minutes (micros branch)") {
    // the r8 failure mode was SILENT: a hard-coded LongType schema over a
    // micros file read raw micros and divided by 1000, compressing 30
    // days of events into ~43 minutes. Guard the magnitude, not just the
    // type: whatever the encoding, the normalized span must be day-scale.
    val ev = Tables(spark, sfDir, "events")
    val us = ev.select(Tables.tsMicros(ev).as("us"))
      .agg(min(col("us")), max(col("us"))).head()
    val spanDays = (us.getLong(1) - us.getLong(0)) / 86400e6
    assert(spanDays > 1.0 && spanDays < 400.0,
      s"events span $spanDays days — timestamp normalization is off by a scale factor")
    // and the epoch is sane: between 2000-01-01 and 2100-01-01 in µs
    assert(us.getLong(0) > 946684800000000L && us.getLong(1) < 4102444800000000L)
  }

  test("legacy nanos-as-long branch: tsMicros divides by 1000") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nanos_fixture").toString
    // ns-since-epoch longs, the pre-r8 physical form (nanosAsLong read)
    Seq((1L, 1700000000123456789L), (2L, 1700000000987654321L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables(spark, dir, "events")
    assert(ev.schema("ts").dataType == LongType)
    val got = ev.select(col("event_id"), Tables.tsMicros(ev).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1700000000123456L, 2L -> 1700000000987654L))
  }

  test("timestamp branch: tsMicros equals unix_micros under the UTC session") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("micros_fixture").toString
    Seq((1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L, 123456000L))))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables(spark, dir, "events")
    assert(tsLike.contains(ev.schema("ts").dataType) &&
      ev.schema("ts").dataType != LongType)
    val us = ev.select(Tables.tsMicros(ev).as("us")).head().getLong(0)
    assert(us == 1700000000123456L)
  }

  test("tsMicros rejects an unsupported time encoding loudly") {
    import spark.implicits._
    val df = Seq(("2024-01-01", 1L)).toDF("ts", "event_id")
    val e = intercept[IllegalArgumentException](Tables.tsMicros(df))
    assert(e.getMessage.contains("unsupported"))
  }
}
