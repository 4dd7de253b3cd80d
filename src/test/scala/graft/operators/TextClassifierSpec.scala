package graft.operators

import graft.functions.TokenWeightSum
import graft.util.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grades the learned filter the way every approximate operator here is
  * graded — against a truth: held-out AUC vs the rule it distills, exact
  * parity between the codegen'd serving path and the training-side
  * featurizer, and deterministic re-training.
  */
class TextClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sf: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  private def auc(scored: Seq[(Double, Double)]): Double = {
    val pos = scored.filter(_._2 == 1.0).map(_._1)
    val neg = scored.filter(_._2 == 0.0).map(_._1)
    if (pos.isEmpty || neg.isEmpty) return 1.0
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size.toDouble * neg.size)
  }

  test("held-out AUC clears the floor: the model really learned the rule") {
    assume(sf.isDefined)
    val data = TextClassifier.ruleLabeled(spark, sf.get)
    val (w, b) = TextClassifier.train(data)
    val heldout = TextClassifier.score(Tables(spark, sf.get, "documents"), w, b)
      .join(data.select(col("doc_id"), col("label")), "doc_id")
      .filter(TextClassifier.splitKey >= 800)
      .select(col("score"), col("label")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assume(heldout.size > 20)
    val a = auc(heldout)
    assert(a >= 0.9, s"held-out AUC $a below floor (n=${heldout.size})")
  }

  test("codegen'd serving path matches a driver-side featurize+dot exactly") {
    assume(sf.isDefined)
    val data = TextClassifier.ruleLabeled(spark, sf.get)
    val (w, b) = TextClassifier.train(data)
    val served = TextClassifier.score(Tables(spark, sf.get, "documents").limit(50), w, b)
      .select(col("doc_id"), col("text"), col("score")).collect()
    served.foreach { r =>
      val toks = "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq
      val z = b + toks.map(t => w(TokenWeightSum.bucket(t, TextClassifier.Dim))).sum
      val expect = 1.0 / (1.0 + math.exp(-z))
      assert(math.abs(r.getDouble(2) - expect) < 1e-9,
        s"doc ${r.getLong(0)}: served ${r.getDouble(2)} vs $expect")
    }
  }

  test("training is deterministic") {
    assume(sf.isDefined)
    val data = TextClassifier.ruleLabeled(spark, sf.get)
    val (w1, b1) = TextClassifier.train(data)
    val (w2, b2) = TextClassifier.train(data)
    assert(math.abs(b1 - b2) < 1e-8)
    assert(w1.zip(w2).map { case (x, y) => math.abs(x - y) }.max < 1e-8)
  }
}
