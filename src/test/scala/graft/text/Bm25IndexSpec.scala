package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The persisted inverted index must reproduce the direct text_bm25
  * computation exactly, and a probe must scan only the probed terms'
  * bucket directories (static partition pruning) — the property that
  * makes the index the 100 TB path: query cost follows the probed
  * postings, not the corpus.
  */
class Bm25IndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("index probe reproduces the direct text_bm25 result exactly") {
    val direct = graft.SparkEntry.queries("text_bm25")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val viaIdx = graft.SparkEntry.queries("bm25_index_topk")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(viaIdx == direct)
    assert(direct.nonEmpty)
  }

  test("probe plan prunes to the probed terms' buckets") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    InvertedIndex.save(graft.util.Tables(spark, sf, "documents"), dir,
      protocol = graft.util.CommitProtocol.Rename)
    val probe = InvertedIndex.probe(spark, dir, Seq("join", "dup"))
    val planStr = probe.queryExecution.executedPlan.toString
    val partFilters = """PartitionFilters: \[([^\]]*)\]""".r
      .findAllMatchIn(planStr).map(_.group(1)).toSeq
    assert(partFilters.exists(f => f.contains("bucket") && f.trim.nonEmpty),
      s"no non-empty bucket partition filter on the index scan in:\n$planStr")
    // the term equi-filter must also reach the parquet scan
    assert(planStr.contains("PushedFilters") && planStr.contains("term"),
      s"term filter not pushed to the postings scan:\n$planStr")
    // 2 probe terms can touch at most 2 of the 64 bucket directories
    val postRoot = java.nio.file.Paths.get(dir, "postings")
    val st = java.nio.file.Files.list(postRoot)
    val nBuckets = try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.count(_.getFileName.toString.startsWith("bucket="))
    } finally st.close()
    assert(nBuckets > 2, s"fixture vocabulary too small to prove pruning ($nBuckets buckets)")
  }

  test("stats hold exact integer sums so avgdl is reproducible") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx2").toString
    InvertedIndex.save(graft.util.Tables(spark, sf, "documents"), dir,
      protocol = graft.util.CommitProtocol.Rename)
    val stats = spark.read.parquet(s"$dir/stats").collect()
    assert(stats.length == 1)
    assert(stats(0).getLong(0) > 0 && stats(0).getLong(1) > 0)
  }

  test("appendDelta is append-only on postings and equals a from-scratch build") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables(spark, sf, "documents")
    val merged = java.nio.file.Files.createTempDirectory("bm25_m").toString
    InvertedIndex.save(docs.filter(col("doc_id") % 5 =!= 0), merged,
      protocol = graft.util.CommitProtocol.Rename)
    def postingsFiles = {
      val b = scala.collection.mutable.Map[String, Long]()
      java.nio.file.Files.walk(java.nio.file.Paths.get(merged, "postings"))
        .filter(_.toString.endsWith(".parquet"))
        .forEach(p => b(p.toString) = java.nio.file.Files.getLastModifiedTime(p).toMillis)
      b.toMap
    }
    val before = postingsFiles
    InvertedIndex.appendDelta(docs.filter(col("doc_id") % 5 === 0), merged)
    val after = postingsFiles
    // every base postings file survives the merge byte-untouched; the
    // delta lands in the flat level-0 tail (compact owns the re-layout)
    assert(after == before, "base postings files changed by a fold")
    val tail = java.nio.file.Files.list(
      java.nio.file.Paths.get(merged, "postings_tail"))
    try assert(tail.anyMatch(_.toString.endsWith(".parquet")),
      "no delta postings were appended to the tail")
    finally tail.close()

    val scratch = java.nio.file.Files.createTempDirectory("bm25_s").toString
    InvertedIndex.save(docs, scratch,
      protocol = graft.util.CommitProtocol.Rename)
    val terms = Seq("join", "vector", "filter", "dup")
    val got = InvertedIndex.probe(spark, merged, terms)
      .collect().map(_.toSeq).toSet
    val want = InvertedIndex.probe(spark, scratch, terms)
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("compact folds the tail into a pruned level-1 run; probes identical") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("bm25_c").toString
    InvertedIndex.save(docs.filter(col("doc_id") % 5 >= 3), dir,
      protocol = graft.util.CommitProtocol.Rename)
    InvertedIndex.appendDelta(docs.filter(col("doc_id") % 5 === 2), dir)
    InvertedIndex.appendDelta(docs.filter(col("doc_id") % 5 === 1), dir)
    def baseFiles = {
      val b = scala.collection.mutable.Map[String, Long]()
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "postings"))
        .filter(_.toString.endsWith(".parquet"))
        .forEach(p => b(p.toString) = java.nio.file.Files.getLastModifiedTime(p).toMillis)
      b.toMap
    }
    def tailFiles = {
      val p0 = java.nio.file.Paths.get(dir, "postings_tail")
      if (!java.nio.file.Files.isDirectory(p0)) 0L
      else {
        val c = new java.util.concurrent.atomic.AtomicLong()
        java.nio.file.Files.walk(p0)
          .forEach(p => if (p.toString.endsWith(".parquet")) { c.incrementAndGet(); () })
        c.get()
      }
    }
    val terms = Seq("join", "vector", "filter", "dup")
    def topk = InvertedIndex.probe(spark, dir, terms).collect().map(_.toSeq).toSet
    val (hitsBefore, base0) = (topk, baseFiles)
    assert(tailFiles > 0, "two folds must leave tail files")

    // tail (2/5 of docs) < base (3/5) → Minor: one new run, base intact
    InvertedIndex.compact(spark, dir)

    assert(tailFiles == 0, "minor fold must empty the tail")
    assert(graft.util.TieredIndex.runIds(dir, "postings") == Seq(0L))
    assert(baseFiles == base0, "minor fold must not touch base files")
    assert(topk == hitsBefore && topk.nonEmpty,
      "compaction must be invisible to retrieval")
    // maintenance keeps composing: folding the last shard into the
    // compacted index still matches a from-scratch full-corpus build
    InvertedIndex.appendDelta(docs.filter(col("doc_id") % 5 === 0), dir)
    val scratch = java.nio.file.Files.createTempDirectory("bm25_cs").toString
    InvertedIndex.save(docs, scratch,
      protocol = graft.util.CommitProtocol.Rename)
    assert(topk == InvertedIndex.probe(spark, scratch, terms).collect().map(_.toSeq).toSet)
    // a second cycle folds the new tail too (Minor or Major depending
    // on the shards' exact row counts — the size policy decides); the
    // probe must hold across whichever tier state it lands in
    InvertedIndex.compact(spark, dir)
    assert(tailFiles == 0)
    assert(topk == InvertedIndex.probe(spark, scratch, terms).collect().map(_.toSeq).toSet)
  }

  test("a compact crash is arbitrated by the marker: promoted with it, dropped without") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables(spark, sf, "documents")
    val dir = Files.createTempDirectory("bm25_ck").toString
    InvertedIndex.save(docs.filter(col("doc_id") % 5 =!= 0), dir,
      protocol = graft.util.CommitProtocol.Rename)
    InvertedIndex.appendDelta(docs.filter(col("doc_id") % 5 === 0), dir)
    val terms = Seq("join", "vector", "filter", "dup")
    def topk = InvertedIndex.probe(spark, dir, terms).collect().map(_.toSeq).toSet
    val want = topk

    // crash BEFORE the marker: a torn postings_new is invisible to the
    // read-only probe and must be dropped by the next maintenance open
    Files.createDirectories(Paths.get(dir, "postings_new", "bucket=0"))
    Files.write(Paths.get(dir, "postings_new", "bucket=0", "part-torn.parquet"),
      Array[Byte](9, 9, 9))
    assert(topk == want, "probe must not read an unmarked postings_new")
    InvertedIndex.recoverIndex(dir)
    assert(!Files.exists(Paths.get(dir, "postings_new")))
    assert(topk == want)

    // crash AFTER the marker mid-swap: the complete publish set must
    // win. Reproduce exactly what a Major compact stages — full-corpus
    // postings_new PLUS the empty replacement tail/l1 dirs (the live
    // tail still holds the 20% fold; promoting postings_new without
    // emptying the tail would double those rows)
    val real = Files.createTempDirectory("bm25_ck2").toString
    InvertedIndex.save(docs, real,
      protocol = graft.util.CommitProtocol.Rename) // full-corpus postings = the compacted target
    Files.move(Paths.get(real, "postings"), Paths.get(dir, "postings_new"))
    Files.createDirectories(Paths.get(dir, "postings_l1_new"))
    Files.createDirectories(Paths.get(dir, "postings_tail_new"))
    Files.write(Paths.get(dir, "_compact_commit"), Array.emptyByteArray)
    InvertedIndex.recoverIndex(dir)
    val recovered = topk
    assert(!Files.exists(Paths.get(dir, "postings_new")))
    assert(!Files.exists(Paths.get(dir, "_compact_commit")))
    val scratch = Files.createTempDirectory("bm25_ck3").toString
    InvertedIndex.save(docs, scratch,
      protocol = graft.util.CommitProtocol.Rename)
    assert(recovered ==
      InvertedIndex.probe(spark, scratch, terms).collect().map(_.toSeq).toSet)
  }

  test("a crash between the terms and stats swaps recovers to the NEW pair (commit marker)") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("bm25_swap").toString
    def mk(name: String, tag: String): Unit = {
      Files.createDirectories(Paths.get(dir, name))
      Files.write(Paths.get(dir, name, "TAG"), tag.getBytes)
    }
    def tag(name: String) = new String(Files.readAllBytes(Paths.get(dir, name, "TAG")))
    // state after: terms fully swapped, crash BEFORE the stats swap —
    // the exact torn window: live new-terms beside live old-stats, and
    // one staged delta part-file not yet moved into the tail
    mk("terms", "new"); mk("stats", "old"); mk("stats_new", "new")
    Files.createDirectories(Paths.get(dir, "postings_delta"))
    Files.write(Paths.get(dir, "postings_delta", "part-x.parquet"), "d".getBytes)
    Files.write(Paths.get(dir, "_append_commit"), Array.emptyByteArray)
    InvertedIndex.recoverIndex(dir)
    assert(tag("terms") == "new" && tag("stats") == "new",
      "marker present: recovery must promote the surviving stats_new")
    assert(!Files.exists(Paths.get(dir, "stats_new")))
    assert(!Files.exists(Paths.get(dir, "_append_commit")))
    assert(Files.exists(Paths.get(dir, "postings_tail", "part-x.parquet")),
      "marker present: staged delta postings must finish moving into the tail")
    assert(!Files.exists(Paths.get(dir, "postings_delta")))
  }

  test("a crash during the *_new writes (no marker) recovers to the OLD pair") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("bm25_swap2").toString
    def mk(name: String, tag: String): Unit = {
      Files.createDirectories(Paths.get(dir, name))
      Files.write(Paths.get(dir, name, "TAG"), tag.getBytes)
    }
    def tag(name: String) = new String(Files.readAllBytes(Paths.get(dir, name, "TAG")))
    // crash mid-parquet-write: terms_new complete, stats_new torn, no
    // marker — NEITHER _new may be trusted or the pair tears; staged
    // postings are part of the same uncommitted delta
    mk("terms", "old"); mk("stats", "old"); mk("terms_new", "new"); mk("stats_new", "torn")
    Files.createDirectories(Paths.get(dir, "postings_delta"))
    Files.write(Paths.get(dir, "postings_delta", "part-y.parquet"), "d".getBytes)
    InvertedIndex.recoverIndex(dir)
    assert(tag("terms") == "old" && tag("stats") == "old",
      "no marker: recovery must keep the old pair and drop every _new")
    assert(!Files.exists(Paths.get(dir, "terms_new")))
    assert(!Files.exists(Paths.get(dir, "stats_new")))
    assert(!Files.exists(Paths.get(dir, "postings_delta")),
      "no marker: the uncommitted staged delta must be dropped whole")
  }

  test("a probe self-heals a MARKED commit whose writer died mid-swap") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables(spark, sf, "documents")
    val dir = Files.createTempDirectory("bm25_heal").toString
    InvertedIndex.save(docs.filter(col("doc_id") % 5 =!= 0), dir,
      protocol = graft.util.CommitProtocol.Rename)
    InvertedIndex.appendDelta(docs.filter(col("doc_id") % 5 === 0), dir)
    val terms = Seq("join", "vector", "filter", "dup")
    val want = InvertedIndex.probe(spark, dir, terms).collect().map(_.toSeq).toSet
    // fabricate the post-marker mid-swap crash: the writer published
    // its complete terms_new and died between swapLive's two renames —
    // live terms/ is MISSING. Before the self-heal, every probe threw
    // 'Path does not exist' until the next maintenance open.
    Files.move(Paths.get(dir, "terms"), Paths.get(dir, "terms_new"))
    Files.write(Paths.get(dir, "_append_commit"), Array.emptyByteArray)
    val healed = InvertedIndex.probe(spark, dir, terms).collect().map(_.toSeq).toSet
    assert(healed == want, "probe after self-heal must serve the committed state")
    assert(Files.exists(Paths.get(dir, "terms")))
    assert(!Files.exists(Paths.get(dir, "terms_new")))
    assert(!Files.exists(Paths.get(dir, "_append_commit")))
  }

  test("appendDelta is exactly-once under a batch id; second writer throws") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("bm25_once").toString
    InvertedIndex.save(docs.filter(col("doc_id") % 5 =!= 0), dir,
      protocol = graft.util.CommitProtocol.Rename)
    InvertedIndex.appendDelta(docs.filter(col("doc_id") % 5 === 0), dir,
      batchId = Some("b1"))
    val terms = Seq("join", "vector", "filter", "dup")
    def topk = InvertedIndex.probe(spark, dir, terms).collect().map(_.toSeq).toSet
    val want = topk
    val stats0 = spark.read.parquet(s"$dir/stats").collect()(0).getLong(0)
    // the retried fold no-ops: postings, terms, AND stats all unchanged
    InvertedIndex.appendDelta(docs.filter(col("doc_id") % 5 === 0), dir,
      batchId = Some("b1"))
    assert(topk == want, "retried fold changed probe results")
    assert(spark.read.parquet(s"$dir/stats").collect()(0).getLong(0) == stats0,
      "retried fold double-counted n_docs")
    // single-writer contract is enforced, not documented
    graft.util.IndexCommit.withWriterLease(dir) {
      intercept[IllegalStateException] {
        InvertedIndex.appendDelta(docs.limit(1), dir, batchId = Some("b2"))
      }
    }
  }
}
