package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sf: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  test("blocklist filter drops exactly the blocked domains via a broadcast anti-join") {
    assume(sf.isDefined)
    val df = graft.SparkEntry.queries("curation_domain_blocklist")(spark, sf.get)
    val hosts = df.collect().map(_.getString(0)).toSet
    assert(!hosts.exists(Set("com.example.src3", "com.example.src7",
      "com.example.src12", "com.example.src18")))
    assert(hosts.forall(_.startsWith("com.example.")))
    // the blocklist side must broadcast — a 100 TB corpus must not shuffle
    // for a blocklist membership test
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join in:\n$plan")
  }

  test("domain quota keeps a deterministic bounded top-N per domain, with group-limit pushdown") {
    assume(sf.isDefined)
    val df = graft.SparkEntry.queries("curation_domain_quota")(spark, sf.get)
    val rows = df.collect()
    val byHost = rows.groupBy(_.getString(0))
    assert(byHost.values.forall(_.length <= 5))
    byHost.values.foreach { rs =>
      // within a domain: ranks contiguous from 1, n_chars non-increasing
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to rs.length))
      assert(sorted.sliding(2).forall(p =>
        p.length < 2 || p(0).getLong(2) >= p(1).getLong(2)))
    }
    // rank-limit pushdown: each task keeps an O(N) heap per domain instead
    // of fully sorting the largest domain's partition (the skew case)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit below the window sort in:\n$plan")
  }

  test("paragraph-chunk dedup accounting is internally consistent") {
    assume(sf.isDefined)
    val rows = graft.SparkEntry.queries("dedup_paragraph")(spark, sf.get).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nChunks, nDup, dupChars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDup >= 0 && nDup <= nChunks)
      assert((nDup == 0) == (dupChars == 0))
    }
  }

  test("a doc sharing a 20-token window with another doc is flagged as duplicated mass") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base, "en", "sA", base.length),
      (2L, base + " tail tail tail", "en", "sB", base.length + 15),
      (3L, "completely different words only here once nothing shared at all beyond", "en", "sC", 70))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("para").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("dedup_paragraph")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs 1 and 2 share both 20-token windows of `base`; doc 3 shares none
    assert(out("sA")._2 == 2, s"sA: $out")
    assert(out("sB")._2 == 2, s"sB: $out")
    assert(out("sC")._2 == 0, s"sC: $out")
  }

  test("crawl merge keeps earliest copy per content, accounts drops per source") {
    import spark.implicits._
    val a = Seq(
      (1L, "same text", "s1"),       // unchanged in b → b copy dropped
      (2L, "a only", "s1"))          // absent from b → kept from a
      .toDF("doc_id", "text", "source")
    val b = Seq(
      (1L, "same text", "s1"),       // dup of a's doc 1
      (3L, "b only", "s2"),          // novel → kept from b
      (4L, "same text", "s2"))       // cross-doc dup of doc 1 → dropped
      .toDF("doc_id", "text", "source")
    val got = Curation.crawlMerge(a, b).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("s1") == ((2L, 0L, 1L)))  // doc1(a), doc2(a); b's doc1 dropped
    assert(got("s2") == ((0L, 1L, 1L)))  // doc3(b) kept; doc4 dup dropped
  }

  test("crawl merge earliest-wins holds over the full signed doc_id domain") {
    import spark.implicits._
    // xxhash64(url)-style ids: negative and Long.MaxValue-scale values.
    // The old crawl*1e12 + doc_id packing inverted earliest-wins here
    // (crawl-2's negative id beat every crawl-1 id) and overflowed.
    val a = Seq((Long.MaxValue, "dup text", "sa")).toDF("doc_id", "text", "source")
    val b = Seq((Long.MinValue, "dup text", "sb")).toDF("doc_id", "text", "source")
    val got = Curation.crawlMerge(a, b).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("sa") == ((1L, 0L, 0L)), s"crawl-1 copy must win: $got")
    assert(got("sb") == ((0L, 0L, 1L)), s"crawl-2 copy must drop: $got")
  }

  test("priority sample equals the naive smallest-xi-per-language selection") {
    assume(sf.isDefined)
    import org.apache.spark.sql.functions._
    // recompute xi per doc with NO windows/salting, select top-50 in Scala
    val naive = graft.util.Tables(spark, sf.get, "documents")
      .select(col("lang"), col("doc_id"),
        ((conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 13), 16, 10)
          .cast("double") + lit(1.0)) / lit(4503599627370496.0)
          / (col("n_chars") + lit(1)).cast("double")).as("xi"))
      .collect()
      .groupBy(_.getString(0)).toSeq
      .flatMap { case (lang, rows) =>
        rows.sortBy(r => (r.getDouble(2), r.getLong(1))).take(50)
          .map(r => (lang, r.getLong(1))).toSeq
      }.toSet
    val got = graft.SparkEntry.queries("curation_priority_sample")(spark, sf.get)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == naive, s"two-stage salted top-k diverged from naive; " +
      s"only-got=${(got -- naive).take(5)} only-naive=${(naive -- got).take(5)}")
  }

  test("quality cutoff threshold is the exact per-source lower median") {
    assume(sf.isDefined)
    import org.apache.spark.sql.functions._
    val scored = graft.util.Tables(spark, sf.get, "documents")
      .select(col("source"), TextOps.qualityScore(col("text")).as("q"))
      .collect().groupBy(_.getString(0))
    val got = graft.SparkEntry.queries("curation_quality_cutoff")(spark, sf.get)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(3))).toMap
    scored.foreach { case (src, rows) =>
      val qs = rows.map(_.getDouble(1)).sorted
      val lowerMedian = qs((qs.length + 1) / 2 - 1)
      val (thr, nKept) = got(src)
      assert(thr == lowerMedian, s"$src: threshold $thr != lower median $lowerMedian")
      assert(nKept == qs.count(_ > lowerMedian), s"$src: n_kept mismatch")
    }
  }
}
