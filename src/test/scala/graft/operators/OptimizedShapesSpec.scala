package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-16 optimization rewrites — each one restructured
  * HOW an operator computes (fewer passes / derived sibling aggregates /
  * a single exploded subtree) while the VALUE must stay bit-identical.
  * These tests recompute the before-semantics naively on planted corpora
  * and assert equality, so a future edit that changes results (not just
  * cost) fails here by name.
  */
class OptimizedShapesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import scala.jdk.CollectionConverters._

  private def docsDf(rows: Seq[(Long, String)]) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, schema)
  }

  test("containmentPairs emits BOTH directions from the single exploded subtree") {
    // doc 2 is a strict prefix-quote of doc 1: containment(2→1) = 1.0
    // while containment(1→2) < τ — the asymmetric case the union used
    // to produce from two pipeline copies
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = docsDf(Seq((1L, long), (2L, short)))
    val got = graft.dedup.Dedup.containmentPairs(docs, n = 5, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // shingle counts: long has 36 distinct 5-shingles, short has 8, all
    // of short's appear in long → c(2→1) = 8/8 = 1.0; c(1→2) = 8/36 < 0.9
    assert(got == Set((2L, 1L, 1.0)), s"got $got")
  }

  test("NgramLm: head/vocab derived from pair equal the direct train aggregates") {
    val train = docsDf(Seq(
      (1L, "a b a b c"), (2L, "b c b c"), (3L, "a a a")))
    val score = docsDf(Seq((10L, "a b c"), (11L, "c b a"), (12L, "zz a")))
    def withCols(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("source", lit("s")).withColumn("lang", lit("en"))
    val got = NgramLm.perDocPerplexity(withCols(train), withCols(score))
      .select(col("doc_id"), col("ppl6"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // naive recompute of the add-one-smoothed bigram LM
    def bigrams(s: String) = { val t = s.split(" ").toSeq; t.zip(t.drop(1)) }
    val trainBg = Seq("a b a b c", "b c b c", "a a a").flatMap(bigrams)
    val pair = trainBg.groupBy(identity).map { case (k, v) => k -> v.size }
    val head = trainBg.groupBy(_._1).map { case (k, v) => k -> v.size }
    val v = trainBg.map(_._2).distinct.size
    def ppl(s: String): Double = {
      val lps = bigrams(s).map { bg =>
        val c2 = pair.getOrElse(bg, 0)
        val c1 = head.getOrElse(bg._1, 0)
        BigDecimal(math.log((c2 + 1.0) / (c1 + v)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val avg = (lps.map(BigDecimal(_)).sum / lps.size).toDouble
      BigDecimal(math.exp(-avg))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got == Map(10L -> ppl("a b c"), 11L -> ppl("c b a"),
      12L -> ppl("zz a")), s"got $got")
  }

  test("pipeline outcomeFlags: slim checkpoint + survivor-only gram pass preserve every stage decision") {
    // planted corpus: doc 10 is the eval doc (id % 10 = 0); doc 13
    // duplicates doc 3 (dedup drops the higher id); doc 7 shares a
    // 13-gram with the eval doc (decontam drops it); doc 9 is too short
    // (quality gate)
    val stop = "the be to of and that have with"
    val gram13 = (1 to 13).map(i => s"g$i").mkString(" ")
    val filler = (1 to 12).map(i => s"f$i").mkString(" ")
    val docs = docsDf(Seq(
      (3L, s"$stop $filler body three"),
      (13L, s"$stop $filler body three"),
      (7L, s"$stop $gram13"),
      (9L, "the short"),
      (10L, s"$stop $gram13 eval marker")))
      .withColumn("source", lit("s"))
    val flags = Pipeline.outcomeFlags(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(flags.keySet == Set(3L, 13L, 7L, 9L), s"got $flags")
    assert(flags(9L) == ((false, false, false))) // quality-gated
    assert(flags(3L) == ((true, true, true)))    // survivor
    assert(flags(13L) == ((true, false, false))) // dedup-dropped
    assert(flags(7L) == ((true, true, false)))   // decontam-dropped
  }
}
