package graft.warc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcDataSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warcDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("dsv2").toString
    WarcWriter.writeFile(s"$dir/a.warc.gz", Fixtures.all)
    WarcWriter.writeFile(s"$dir/b.warc.gz", Seq(Fixtures.responseHtml))
    dir
  }

  test("format(warc) reads a directory, one partition per archive") {
    val df = spark.read.format("warc").load(warcDir)
    assert(df.count() == Fixtures.all.length + 1)
    assert(df.rdd.getNumPartitions == 2)
    val types = df.groupBy("warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types("response") == 5) // 4 responses in a + 1 in b
    assert(types("conversion") == 1)
    assert(types("metadata") == 1)
  }

  test("record_type option filters at the reader") {
    val df = spark.read.format("warc")
      .option("record_type", "response").load(warcDir)
    assert(df.count() == 5)
    assert(df.select("warc_type").distinct().collect().map(_.getString(0)).toSeq == Seq("response"))
  }

  test("columns: headers map, payload bytes, SQL-queryable") {
    val df = spark.read.format("warc").load(s"$warcDir/a.warc.gz")
    df.createOrReplaceTempView("warc_records")
    val row = spark.sql(
      """SELECT target_uri, headers['WARC-IP-Address'] AS ip, length(payload) AS len
        |FROM warc_records WHERE warc_type = 'response'
        |  AND target_uri LIKE '%index.html%'""".stripMargin).head()
    assert(row.getString(0) == "https://www.example.com/index.html")
    assert(row.getString(1) == "93.184.216.34")
    assert(row.getInt(2) > 0)
  }

  test("column pruning reaches the scan (no payload in pruned plan)") {
    val df = spark.read.format("warc").load(warcDir).select("warc_type")
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("columns=warc_type"),
      s"expected pruned scan description:\n$plan")
    // pruned scan returns the same values as the full scan
    val full = spark.read.format("warc").load(warcDir)
      .select("warc_type").collect().map(_.getString(0)).sorted.toSeq
    assert(df.collect().map(_.getString(0)).sorted.toSeq == full)
  }

  test("warc_type equality filter pushes into the scan") {
    val df = spark.read.format("warc").load(warcDir)
      .filter(col("warc_type") === "response")
    assert(df.count() == 5)
    val planned = df.queryExecution.executedPlan.toString()
    assert(planned.contains("pushedTypes=response"),
      s"expected pushed filter in scan description:\n$planned")
    // IN-list push
    val df2 = spark.read.format("warc").load(warcDir)
      .filter(col("warc_type").isin("response", "conversion"))
    assert(df2.count() == 6)
  }

  test("corrupt archive in directory yields empty partition, not failure") {
    val dir = java.nio.file.Files.createTempDirectory("dsv2corrupt").toString
    WarcWriter.writeFile(s"$dir/good.warc.gz", Seq(Fixtures.responseHtml))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.warc.gz"),
      Array.fill[Byte](100)(0x5A))
    val df = spark.read.format("warc").load(dir)
    assert(df.count() == 1)
  }
}
