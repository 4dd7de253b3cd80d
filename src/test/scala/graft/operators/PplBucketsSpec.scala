package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CCNet tercile split: per-language bucket sizes must be balanced to
  * within the rank-boundary rounding (the oracle pins exact values).
  */
class PplBucketsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-lang buckets are tercile-balanced and ordered head<middle<tail") {
    val dir = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(dir.isDefined)
    val rows = NgramLm.pplBuckets.fn(spark, dir.get).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byLang = rows.groupBy(_._1)
    byLang.foreach { case (lang, bs) =>
      val m = bs.map(b => b._2 -> b._3).toMap
      val n = m.values.sum
      // each bucket within 1 of n/3 (ties can only shrink head/middle)
      m.values.foreach(c =>
        assert(math.abs(c - n / 3.0) <= 1.0, s"$lang unbalanced: $m"))
      // mean perplexity must increase head -> middle -> tail
      val avg = bs.map(b => b._2 -> b._4).toMap
      assert(avg("head") < avg("middle") && avg("middle") < avg("tail"),
        s"$lang bucket means not ordered: $avg")
    }
    assert(byLang.nonEmpty)
  }
}
