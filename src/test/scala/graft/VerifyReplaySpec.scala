package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the oracleGen/artifact-cache replay contract the driver's hash
  * gate rests on: a data-dependent oracle (QueryDef.oracleGen) embeds
  * trained artifacts (centroids, codebooks, weights) as SQL literals,
  * and the ONLY correctness guarantee is that the generator reads the
  * SAME per-session artifacts the query fn computed its rows with. The
  * failure mode this guards: a cached-artifact/regenerated-query
  * mismatch (generator trains fresh while the query served cached — or
  * vice versa), which at the driver gate looks exactly like a
  * correctness bug in the query.
  */
class VerifyReplaySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def genDefs = SparkEntry.allDefs.filter(_.oracleGen.isDefined)

  test("oracle generators are deterministic within a session, called before OR after the query") {
    assume(new java.io.File(sf).exists())
    genDefs.foreach { d =>
      // generator FIRST (cold cache for whichever family trains here):
      // it must populate the same cache the query fn will read
      val sqlBefore = d.oracleGen.get(spark, sf)
      val rows1 = d.fn(spark, sf).collect().map(_.toSeq)
      val sqlAfter = d.oracleGen.get(spark, sf)
      assert(sqlBefore == sqlAfter,
        s"${d.name}: generator output changed across the query run — " +
          s"the gate would compare rows to a DIFFERENT model's replay")
      val rows2 = d.fn(spark, sf).collect().map(_.toSeq)
      assert(rows1.toSeq == rows2.toSeq,
        s"${d.name}: query rows changed between runs in one session")
    }
  }

  test("Verify.run twice in one JVM dumps identical oracle SQL and identical rows") {
    assume(new java.io.File(sf).exists())
    val names = genDefs.map(_.name).toSet
    val d1 = java.nio.file.Files.createTempDirectory("vreplay1").toString
    val d2 = java.nio.file.Files.createTempDirectory("vreplay2").toString
    Verify.run(spark, sf, d1, Some(names))
    Verify.run(spark, sf, d2, Some(names))
    val j1 = java.nio.file.Files.readString(java.nio.file.Paths.get(d1, "oracle_sql.json"))
    val j2 = java.nio.file.Files.readString(java.nio.file.Paths.get(d2, "oracle_sql.json"))
    assert(j1 == j2, "oracle_sql.json differs between two Verify runs in one session")
    names.foreach { n =>
      val r1 = spark.read.parquet(s"$d1/$n").collect().map(_.toSeq).sortBy(_.toString)
      val r2 = spark.read.parquet(s"$d2/$n").collect().map(_.toSeq).sortBy(_.toString)
      assert(r1.toSeq == r2.toSeq, s"$n: dumped rows differ between Verify runs")
    }
    // every generator actually produced an entry — a throwing generator
    // silently downgrades its query to the rows-only check
    names.foreach(n => assert(j1.contains("\"" + n + "\""),
      s"$n: generator produced no oracle entry"))
  }
}
