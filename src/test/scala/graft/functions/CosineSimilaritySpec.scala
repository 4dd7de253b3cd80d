package graft.functions

import graft.functions.CosineSimilarity.cosineSim
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("native expression matches the composable-functions cosine") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val self = df.select(col("embedding").as("a"), col("embedding").as("b"))
    val both = self.select(
      cosineSim(col("a"), col("b")).as("native"),
      GraftFunctions.cosine(col("a"), col("b")).as("hof"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-6) // self-cosine = 1
    }
  }

  test("interpreted eval agrees with codegen") {
    val a = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val viaCodegen = a.select(cosineSim(col("a"), col("b"))).head().getDouble(0)
    val expected = {
      val dot = 1.0 * 4 + 2.0 * 5 + 3.0 * 6
      dot / math.sqrt((1.0 + 4 + 9) * (16.0 + 25 + 36))
    }
    assert(math.abs(viaCodegen - expected) < 1e-12)
  }

  test("edge cases: zero vector, unequal lengths, null") {
    val df = Seq(
      (Seq(0f, 0f), Seq(1f, 2f)),
      (Seq(1f, 0f, 5f), Seq(1f, 0f))).toDF("a", "b")
    val got = df.select(cosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(got(0) == 0.0)                      // zero norm
    assert(math.abs(got(1) - 1.0) < 1e-9)      // common prefix (1,0)·(1,0)
    val withNull = Seq((Some(Seq(1f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(withNull.select(cosineSim(col("a"), col("b"))).head().isNullAt(0))
  }

  test("SQL registration and type checking") {
    CosineSimilarity.register(spark)
    Seq((Seq(1f, 2f), Seq(1f, 2f))).toDF("a", "b").createOrReplaceTempView("v")
    val r = spark.sql("SELECT cosine_sim(a, b) FROM v").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-9)
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim('x', 1)").collect()
    }
    assert(err.getMessage.contains("cosine_sim") || err.getMessage.contains("array<float>"))
  }
}
