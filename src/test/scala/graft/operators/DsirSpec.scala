package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR sanity beyond the DuckDB oracle: the importance score must
  * actually rank target-like raw documents above off-distribution ones.
  */
class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("target-vocabulary docs outscore off-distribution docs") {
    import spark.implicits._
    // target corpus speaks {alpha beta gamma}; raw pool has one doc in
    // the target vocabulary and one in a disjoint vocabulary
    val docs = Seq(
      (0L, "alpha beta gamma alpha beta", "t"),
      (1L, "beta gamma alpha gamma", "t"),
      (2L, "alpha beta gamma beta alpha gamma", "raw"),
      (3L, "delta epsilon zeta delta epsilon", "raw"))
      .toDF("doc_id", "text", "source")
    val scored = Dsir.importanceScores(docs, col("source") === "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored.keySet == Set(2L, 3L), "only raw docs are scored")
    assert(scored(2L) > scored(3L),
      s"target-like doc must outscore off-distribution doc: $scored")
    assert(scored(2L) > 0 && scored(3L) < 0,
      s"log-ratio sign should separate in/out of distribution: $scored")
  }

  test("registered selection is deterministic") {
    val dir = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(dir.isDefined)
    val a = Dsir.dsirSelect.fn(spark, dir.get).collect().toSet
    val b = Dsir.dsirSelect.fn(spark, dir.get).collect().toSet
    assert(a == b)
    val rawPool = graft.util.Tables(spark, dir.get, "documents")
      .filter(org.apache.spark.sql.functions.col("source") =!= "src0").count()
    assert(a.toSeq.map(_.getLong(1)).sum == math.min(100L, rawPool),
      "selects exactly the top-100 (or the whole raw pool if smaller)")
  }
}
