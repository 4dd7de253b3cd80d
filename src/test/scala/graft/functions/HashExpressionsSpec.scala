package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct equivalence tests for the hash expressions against their
  * composable-SQL formulations (the forms they replaced).
  */
class HashExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("CharNgramHashes ≡ transform(sequence)+xxhash64(substring) on ASCII") {
    val df = Seq("hello world 123", "abcd", "xy", "").toDF("t")
    val n = 4
    val both = df.select(
      ShingleHashes.charNgramHashes(col("t"), n).as("native"),
      expr(
        s"""CASE WHEN length(t) >= $n
           THEN array_distinct(transform(sequence(0, length(t) - $n),
                i -> xxhash64(substring(t, i + 1, $n))))
           ELSE array(xxhash64(t)) END""").as("sql"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch: $r")
    }
  }

  test("MinHashSig: min per bin, rotation densification, order-insensitive") {
    val a = Seq(Seq(10L, 74L, -3L, 138L)).toDF("sh") // bins mod 64: 10, 10, 61, 10
    val sig = a.select(MinHashSig.minhashSig(col("sh"), 64)).head().getSeq[Long](0)
    assert(sig.length == 64)
    assert(sig(10) == 10L)  // min(10, 74, 138)
    assert(sig(61) == -3L)  // pmod(-3,64)=61
    // rotation densification: empty bin borrows the min of the nearest
    // non-empty bin to the right, wrapping
    assert(sig(0) == 10L)   // 0 → first non-empty rightward is bin 10
    assert(sig(11) == -3L)  // 11 → first non-empty rightward is bin 61
    assert(sig(62) == 10L)  // 62 → wraps past 63 to bin 10
    // permutation of the shingle set gives the identical signature
    val b = Seq(Seq(138L, -3L, 74L, 10L)).toDF("sh")
    assert(b.select(MinHashSig.minhashSig(col("sh"), 64)).head().getSeq[Long](0) == sig)
    // only an empty shingle set yields per-bin sentinels
    val e = Seq(Seq.empty[Long]).toDF("sh")
    val esig = e.select(MinHashSig.minhashSig(col("sh"), 64)).head().getSeq[Long](0)
    assert(esig(0) == Long.MinValue + 0 && esig(63) == Long.MinValue + 63)
  }

  test("SimHashSig ≡ spark xxhash64 bit-vote formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val toks = docs.select(col("doc_id"), GraftFunctions.tokens(col("text")).as("toks"))
    val native = toks.select(col("doc_id"), SimHashSig.simhashSig(col("toks")).as("sig"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(i =>
      sum(when(expr(s"(shiftrightunsigned(h, $i) & 1) = 1"), col("tf"))
        .otherwise(-col("tf"))).as(s"b$i"))
    val sums = tf.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sigExpr = (0 until 64).map(i => s"IF(b$i > 0, ${1L << i}L, 0L)").mkString(" + ")
    val sql = sums.select(col("doc_id"), expr(sigExpr).as("sig2"))
    val joined = native.join(sql, "doc_id")
      .filter(col("sig") =!= col("sig2"))
    assert(joined.count() == 0)
  }

  test("WinnowFingerprints ≡ slice/array_min HOF formulation; short text empty") {
    val k = 5; val w = 8
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",      // degenerate: every gram hash equal → 1 fp
      "abcdefghijkl",              // exactly k+w-1 chars → 1 window
      "abcdefghijk",               // one short of a full window → empty
      "").toDF("t")
    val poly = s"""transform(sequence(1, length(t) - ${k - 1}), i ->
        (CAST(ascii(substring(t, i, 1)) AS BIGINT) * 294499921
         + ascii(substring(t, i+1, 1)) * 2248091
         + ascii(substring(t, i+2, 1)) * 17161
         + ascii(substring(t, i+3, 1)) * 131
         + ascii(substring(t, i+4, 1))) % 1000000007)"""
    val both = df.select(col("t"),
      ShingleHashes.winnowFingerprints(col("t"), k, w).as("native"),
      expr(
        s"""CASE WHEN length(t) >= ${k + w - 1}
           THEN array_distinct(transform(sequence(1, length(t) - ${k + w - 2}),
                j -> array_min(slice($poly, j, $w))))
           ELSE array() END""").as("sql"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](1).sorted == r.getSeq[Long](2).sorted,
        s"mismatch for '${r.getString(0)}': $r")
    }
    // the degenerate all-equal-hash doc really collapses to one fp
    assert(both.filter(col("t") === "aaaaaaaaaaaaaaaaaaaa")
      .head().getSeq[Long](1).length == 1)
  }

  test("LongWindowHashes: short input falls back to whole-array shingle") {
    val df = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L, 4L, 5L, 6L)).toDF("h")
    val out = df.select(ShingleHashes.longWindowHashes(col("h"), 5)).collect()
    assert(out(0).getSeq[Long](0).length == 1) // 2 < 5 → single shingle
    assert(out(1).getSeq[Long](0).length == 2) // windows at 0,1
  }

  test("BoundedLongCollect: sorted collect, cap → NULL, null-skip, cross-partition merge") {
    // 10 partitions force partial-buffer merges through serialize/deserialize
    val rows: Seq[(Long, java.lang.Long)] =
      (1L to 150L).map(i => (i % 7, java.lang.Long.valueOf(i))) :+
        (0L, null.asInstanceOf[java.lang.Long])
    val df = rows.toDF("k", "v").repartition(10)
    val out = df.groupBy(col("k"))
      .agg(BoundedLongCollect.boundedCollect(col("v"), 25).as("ids"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    // groups 1..6 have 21-22 members ≤ 25 → sorted arrays; group 0 has 21 non-null
    (0L to 6L).foreach { k =>
      val expect = (1L to 150L).filter(_ % 7 == k).sorted
      assert(out(k).get == expect, s"group $k")
    }
    // same data, cap below the group size → every group NULL
    val capped = df.groupBy(col("k"))
      .agg(BoundedLongCollect.boundedCollect(col("v"), 20).as("ids"))
      .collect().map(r => Option(r.get(1)))
    assert(capped.forall(_.isEmpty))
    // cap exactly at group size keeps the group (> limit drops, == keeps)
    val exact = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("k", "v").repartition(3)
      .groupBy(col("k"))
      .agg(BoundedLongCollect.boundedCollect(col("v"), 3).as("ids"))
      .collect()
    assert(exact.head.getSeq[Long](1) == Seq(1L, 2L, 3L))
  }

  test("AdcScore ≡ aggregate(zip_with(lut, codes, (l,c) -> l[c])) incl. edges") {
    val df = Seq(
      (1L, Seq(Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0, 30.0)), Seq(0, 2)),   // 1+30
      (2L, Seq(Seq(1.5, -2.5), Seq(0.5, 4.5)), Seq(1, 1)),               // -2.5+4.5
      (3L, Seq(Seq(1.0), Seq(2.0), Seq(3.0)), Seq(0, 0)),                // lut longer
      (4L, Seq(Seq(1.0, 2.0)), Seq(0, 1)),                               // codes longer
      (5L, Seq.empty[Seq[Double]], Seq.empty[Int]))                      // both empty
      .toDF("id", "lut", "codes")
    val out = df.select(col("id"),
      graft.functions.AdcScore.adcScore(col("lut"), col("codes")).as("native"),
      expr("aggregate(zip_with(lut, codes, (l, c) -> l[c]), 0D, (acc, x) -> acc + x)")
        .as("hof")).orderBy("id").collect()
    // rows 1-2: plain agreement on well-formed inputs
    assert(out(0).getDouble(1) == 31.0 && out(1).getDouble(1) == 2.0)
    out.take(2).foreach(r => assert(r.getDouble(1) == r.getDouble(2)))
    // length mismatch: zip_with pads with null → HOF yields null; the
    // native form scores the common prefix (documented contract)
    assert(out(2).getDouble(1) == 3.0)  // 1.0 + 2.0
    assert(out(3).getDouble(1) == 1.0)  // only subspace 0
    assert(out(4).getDouble(1) == 0.0)
  }

  test("LongWindowHashesAll: position order, repeats kept, empty when short") {
    val df = Seq(
      (1L, Seq(7L, 8L, 7L, 8L, 7L, 8L)), // window (7,8,7) repeats at 0 and 2
      (2L, Seq(1L, 2L)))                  // shorter than w → NO windows
      .toDF("id", "h")
    val out = df.orderBy("id")
      .select(ShingleHashes.longWindowHashesAll(col("h"), 3)).collect()
    val a = out(0).getSeq[Long](0)
    assert(a.length == 4)          // starts 0..3, no dedup
    assert(a(0) == a(2) && a(1) == a(3)) // alternating repeated windows
    assert(a(0) != a(1))
    assert(out(1).getSeq[Long](0).isEmpty)
    // agrees with the distinct kernel on the same input
    val distinctHashes = df.filter(col("id") === 1)
      .select(ShingleHashes.longWindowHashes(col("h"), 3))
      .head().getSeq[Long](0).toSet
    assert(a.toSet == distinctHashes)
  }
}
