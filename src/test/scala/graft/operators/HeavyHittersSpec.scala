package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The sketch-then-verify top-k must equal the plain exact aggregate on
  * every distribution: skewed (sketch path active), flat (certification
  * fails → fallback), and adversarial width-1 sketches.
  */
class HeavyHittersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def exactTopK(docs: Seq[String], k: Int): Seq[(String, Long)] =
    docs.flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(k)

  private def run(docs: Seq[String], k: Int, width: Int): Seq[(String, Long)] = {
    import spark.implicits._
    val df = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    HeavyHitters.topK(df, k, width).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("misra-gries partition estimates never exceed true counts") {
    val stream = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 40).map(i => s"x$i") ++ Seq.fill(20)("c")
    val mg = HeavyHitters.mgPartition(stream.iterator, width = 8).toMap
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    mg.filterNot(_._1 == HeavyHitters.TotalKey).foreach { case (t, m) =>
      assert(m <= truth(t), s"$t: mg $m > true ${truth(t)}")
      assert(m >= truth(t) - stream.size / 8, s"$t under-counted past n/W")
    }
    assert(mg(HeavyHitters.TotalKey) == stream.size.toLong)
  }

  test("skewed corpus: sketch path matches exact top-k") {
    val docs = (1 to 40).map { i =>
      val heavy = Seq.fill(60)(s"h${i % 5}")
      val tail = (1 to 20).map(j => s"t${i}_$j")
      scala.util.Random.shuffle(heavy ++ tail).mkString(" ")
    }
    assert(run(docs, k = 5, width = 256) == exactTopK(docs, 5))
  }

  test("flat corpus: certification fails and fallback still exact") {
    val docs = (1 to 30).map(i => (1 to 50).map(j => s"w${i}_$j").mkString(" "))
    assert(run(docs, k = 10, width = 16) == exactTopK(docs, 10))
  }

  test("width-1 sketch is still exact via fallback") {
    val docs = Seq("a a a b b c", "b b a c c d")
    assert(run(docs, k = 3, width = 1) == exactTopK(docs, 3))
  }
}
