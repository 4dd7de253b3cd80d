package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental dedup against a persisted MinHash index: the new batch
  * must find its near-dups among previously indexed documents without
  * the index side re-reading any text.
  */
class MinHashIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sf: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  test("new batch finds exact copies and misses disjoint docs; layout is band-partitioned") {
    assume(sf.isDefined)
    import spark.implicits._
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    Dedup.saveMinHashIndex(corpus, dir,
      protocol = graft.util.CommitProtocol.Rename)
    // inverted-list layout on disk: one directory per band
    val bandDirs = new java.io.File(s"$dir/bands").listFiles()
      .filter(_.getName.startsWith("band=")).map(_.getName)
    assert(bandDirs.length == 16) // 64 perms / 4 rows per band

    // new batch: 3 exact copies of indexed docs (shifted ids) + 1 disjoint
    val copies = corpus.filter(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val fresh = Seq((2000000L,
      (1 to 60).map(i => s"qq$i unseen").mkString(" "), "en", "zz", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch = copies.unionByName(fresh)

    val hits = Dedup.dedupAgainstMinHashIndex(batch, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every copy matches its original at estimated jaccard 1.0
    (0L until 3L).foreach { id =>
      assert(hits.exists(h => h._1 == id + 1000000L && h._2 == id && h._3 == 1.0),
        s"copy of doc $id not found in ${hits.toSeq}")
    }
    // the disjoint doc matches nothing
    assert(!hits.exists(_._1 == 2000000L), s"false hit: ${hits.toSeq}")
  }

  test("probe plan joins on (band, bucket) — no cross of index × batch") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val dir = java.nio.file.Files.createTempDirectory("mhidx2").toString
    Dedup.saveMinHashIndex(corpus, dir,
      protocol = graft.util.CommitProtocol.Rename)
    val probe = Dedup.dedupAgainstMinHashIndex(
      corpus.filter(col("doc_id") < 5), dir)
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"probe must be a keyed join:\n$plan")
  }

  test("probe fails loudly on a hash-family/parameter mismatch or a missing marker") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val dir = java.nio.file.Files.createTempDirectory("mhidx3").toString
    Dedup.saveMinHashIndex(corpus, dir,
      protocol = graft.util.CommitProtocol.Rename)

    // parameter drift: same index probed with a different banding scheme
    // would silently produce zero bucket collisions — must throw instead
    val e1 = intercept[IllegalStateException] {
      Dedup.dedupAgainstMinHashIndex(corpus, dir, rowsPerBand = 8)
    }
    assert(e1.getMessage.contains("incompatible parameters"))

    // pre-marker index (built by an older binary): marker absent → throw,
    // never an empty result
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_graft_minhash_meta"))
    val e2 = intercept[IllegalStateException] {
      Dedup.dedupAgainstMinHashIndex(corpus, dir)
    }
    assert(e2.getMessage.contains("no _graft_minhash_meta marker"))
  }

  test("appendMinHashIndex folds a delta in; probes equal a from-scratch build") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val oldCrawl = corpus.filter(col("doc_id") % 3 =!= 0)
    val newCrawl = corpus.filter(col("doc_id") % 3 === 0)

    val grown = java.nio.file.Files.createTempDirectory("mhidx_g").toString
    Dedup.saveMinHashIndex(oldCrawl, grown,
      protocol = graft.util.CommitProtocol.Rename)
    def filesUnder(d: String, sub: String) = {
      val b = scala.collection.mutable.Map[String, Long]()
      val p0 = java.nio.file.Paths.get(d, sub)
      if (java.nio.file.Files.isDirectory(p0))
        java.nio.file.Files.walk(p0)
          .filter(_.toString.endsWith(".parquet"))
          .forEach(p => b(p.toString) = java.nio.file.Files.getLastModifiedTime(p).toMillis)
      b.toMap
    }
    val before = filesUnder(grown, "bands")
    Dedup.appendMinHashIndex(newCrawl, grown)
    // level-0 shape: the partitioned BASE survives byte-untouched — the
    // delta lands as a handful of flat tail files
    val after = filesUnder(grown, "bands")
    before.foreach { case (f, mtime) =>
      assert(after.contains(f) && after(f) == mtime, s"base band file rewritten: $f")
    }
    assert(after.size == before.size, "append must not touch the base layout")
    assert(filesUnder(grown, "bands_tail").nonEmpty, "no tail files appended")

    val scratch = java.nio.file.Files.createTempDirectory("mhidx_s").toString
    Dedup.saveMinHashIndex(corpus, scratch,
      protocol = graft.util.CommitProtocol.Rename)
    val probe = corpus.filter(col("doc_id") < 5)
    def hits(d: String) = Dedup.dedupAgainstMinHashIndex(probe, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(hits(grown) == hits(scratch))
    assert(hits(grown).nonEmpty)

    // append refuses parameter drift BEFORE writing (it would poison the index)
    val e = intercept[IllegalStateException] {
      Dedup.appendMinHashIndex(newCrawl, grown, perms = 32, rowsPerBand = 8)
    }
    assert(e.getMessage.contains("incompatible parameters"))
  }

  test("probe prunes to the batch's touched (band, bmod) partitions and scans bands ONCE") {
    assume(sf.isDefined)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val dir = java.nio.file.Files.createTempDirectory("mhidx_pr").toString
    Dedup.saveMinHashIndex(corpus, dir,
      protocol = graft.util.CommitProtocol.Rename)
    val probe = Dedup.dedupAgainstMinHashIndex(
      corpus.filter(col("doc_id") < 2), dir)

    def scansOf(sub: String) = probe.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains(sub)) => f
    }
    // the r11 design scanned bands/ TWICE per probe (candidate join +
    // a full-index over-cap groupBy); the widths sidecar removes the
    // second scan entirely
    val bandsScans = scansOf("/bands")
    assert(bandsScans.size == 1, s"bands must be scanned exactly once, got ${bandsScans.size}")
    // both index-side scans carry a static partition filter from the
    // batch's bounded touched set — the probe reads only the partitions
    // the batch can collide with, never the whole persisted index
    (bandsScans ++ scansOf("/widths")).foreach { f =>
      // the batch's touched set arrives as STATIC literals (the join may
      // add a DynamicPruningSubquery on top, which listFiles can't
      // evaluate — the static filter alone must already prune)
      val static = f.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      assert(static.nonEmpty, s"index scan without static partition filter:\n$f")
      val pruned = f.relation.location.listFiles(static, Nil)
        .map(_.files.size).sum
      val total = f.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
      assert(pruned < total,
        s"2-doc probe must prune (pruned=$pruned, total=$total)")
      assert(pruned > 0, "pruning must keep the touched partitions")
    }
    // and the pruned probe still finds the planted self-match
    assert(probe.collect().exists(r => r.getLong(0) == r.getLong(1)))
  }

  test("probe of an empty batch returns empty, no index read") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val dir = java.nio.file.Files.createTempDirectory("mhidx_e").toString
    Dedup.saveMinHashIndex(corpus, dir,
      protocol = graft.util.CommitProtocol.Rename)
    val hits = Dedup.dedupAgainstMinHashIndex(corpus.filter(lit(false)), dir)
    assert(hits.columns.toSeq == Seq("new_id", "idx_id", "est_jaccard"))
    assert(hits.count() == 0)
  }

  test("batch-id'd append is retry-idempotent; un-committed staging is rolled back") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val dir = java.nio.file.Files.createTempDirectory("mhidx_i").toString
    Dedup.saveMinHashIndex(corpus.filter(col("doc_id") % 2 === 0), dir,
      protocol = graft.util.CommitProtocol.Rename)
    val delta = corpus.filter(col("doc_id") % 2 === 1)
    def nRows = {
      val base = spark.read.schema(Dedup.BandsSchema).parquet(s"$dir/bands").count()
      val tp = java.nio.file.Paths.get(dir, "bands_tail")
      base + (if (java.nio.file.Files.isDirectory(tp))
        spark.read.schema(Dedup.BandsSchema).parquet(tp.toString).count() else 0L)
    }
    val before = nRows
    Dedup.appendMinHashIndex(delta, dir, batchId = Some("crawl-7"))
    val once = nRows
    assert(once > before)
    // at-least-once redelivery of the same batch: a no-op, not a double-append
    Dedup.appendMinHashIndex(delta, dir, batchId = Some("crawl-7"))
    assert(nRows == once, "re-driven committed batch must not double-append")
    assert(Dedup.isBatchCommitted(dir, "crawl-7"))

    // crash BEFORE the commit marker: staged delta dirs exist, marker
    // absent — recovery must drop the torn staging, not promote it
    val staged = java.nio.file.Paths.get(dir, "bands_delta", "band=0", "bmod=0")
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.write(staged.resolve("part-torn.parquet"), Array[Byte](1, 2, 3))
    Dedup.recoverIndex(dir)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "bands_delta")))
    assert(nRows == once)
  }

  test("crash AFTER the commit marker: recovery promotes the staged batch exactly once") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val oldCrawl = corpus.filter(col("doc_id") % 2 === 0)
    val newCrawl = corpus.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("mhidx_c").toString
    Dedup.saveMinHashIndex(oldCrawl, dir,
      protocol = graft.util.CommitProtocol.Rename)
    // reconstruct the exact pre-crash state: both delta dirs fully
    // staged (a real append's promoted tail files ARE the staged files
    // — promote only moves them) and the marker present with the batch
    // id — the writer died between marker and promote
    val stage = java.nio.file.Files.createTempDirectory("mhidx_c_s").toString
    Dedup.saveMinHashIndex(newCrawl.filter(lit(false)), stage,
      protocol = graft.util.CommitProtocol.Rename)
    Dedup.appendMinHashIndex(newCrawl, stage)
    java.nio.file.Files.move(java.nio.file.Paths.get(stage, "bands_tail"),
      java.nio.file.Paths.get(dir, "bands_delta"))
    java.nio.file.Files.move(java.nio.file.Paths.get(stage, "widths_tail"),
      java.nio.file.Paths.get(dir, "widths_delta"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_append_commit"),
      "crawl-9".getBytes("UTF-8"))

    Dedup.recoverIndex(dir)
    assert(Dedup.isBatchCommitted(dir, "crawl-9"),
      "recovery must finish the committed batch's token")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_append_commit")))
    // the recovered index answers probes exactly like a from-scratch build
    val scratch = java.nio.file.Files.createTempDirectory("mhidx_c2").toString
    Dedup.saveMinHashIndex(corpus, scratch,
      protocol = graft.util.CommitProtocol.Rename)
    val probe = corpus.filter(col("doc_id") < 5)
    def hits(d: String) = Dedup.dedupAgainstMinHashIndex(probe, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(hits(dir) == hits(scratch) && hits(dir).nonEmpty)
    // and the re-driven batch is a no-op
    val n = spark.read.schema(Dedup.BandsSchema).parquet(s"$dir/bands").count()
    Dedup.appendMinHashIndex(newCrawl, dir, batchId = Some("crawl-9"))
    assert(spark.read.schema(Dedup.BandsSchema).parquet(s"$dir/bands").count() == n)
  }

  test("compaction folds deltas + re-lays partitions; probes are identical before/after") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val dir = java.nio.file.Files.createTempDirectory("mhidx_k").toString
    Dedup.saveMinHashIndex(corpus.filter(col("doc_id") % 3 === 0), dir,
      protocol = graft.util.CommitProtocol.Rename)
    Dedup.appendMinHashIndex(corpus.filter(col("doc_id") % 3 === 1), dir,
      batchId = Some("c1"))
    Dedup.appendMinHashIndex(corpus.filter(col("doc_id") % 3 === 2), dir,
      batchId = Some("c2"))
    val probe = corpus.filter(col("doc_id") < 5)
    def hits = Dedup.dedupAgainstMinHashIndex(probe, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def files(sub: String) = {
      val c = new java.util.concurrent.atomic.AtomicLong()
      val p0 = java.nio.file.Paths.get(dir, sub)
      if (java.nio.file.Files.isDirectory(p0))
        java.nio.file.Files.walk(p0)
          .forEach(p => if (p.toString.endsWith(".parquet")) { c.incrementAndGet(); () })
      c.get()
    }
    val hitsBefore = hits
    val totalBefore = files("")
    assert(files("bands_tail") > 0, "appends must have landed in the tail")

    Dedup.compactMinHashIndex(spark, dir)

    assert(hits == hitsBefore && hits.nonEmpty,
      "compaction must not change probe results")
    // the tail folded into the base: fewer files overall, empty tails
    assert(files("") < totalBefore,
      s"index file count must drop (${files("")} vs $totalBefore)")
    assert(files("bands_tail") == 0 && files("widths_tail") == 0,
      "tails must be empty after compaction")
    // widths deltas are FOLDED: one row per (band, bucket) again
    val w = spark.read.schema(Dedup.WidthsSchema).parquet(s"$dir/widths")
    assert(w.groupBy(col("band"), col("bucket")).count()
      .filter(col("count") > 1).count() == 0, "widths must fold to one row per bucket")
    // committed tokens + meta survive; appends keep working after compact
    assert(Dedup.isBatchCommitted(dir, "c1") && Dedup.isBatchCommitted(dir, "c2"))
    Dedup.appendMinHashIndex(probe.withColumn("doc_id", col("doc_id") + 5000000L),
      dir, batchId = Some("c3"))
    assert(Dedup.dedupAgainstMinHashIndex(
      probe.withColumn("doc_id", col("doc_id") + 6000000L), dir)
      .collect().nonEmpty)
  }

  test("degenerate index bucket probes via its min-id anchor, not all-pairs") {
    import spark.implicits._
    // 300 identical docs (> the 256 bucket cap): every band bucket goes
    // degenerate — the pathological boilerplate-accumulation case
    val tpl = (1 to 60).map(i => s"boiler plate token$i").mkString(" ")
    val massDup = (0L until 300L).map(i => (i, tpl, "en", "src", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("mhidx_hot").toString
    Dedup.saveMinHashIndex(massDup, dir,
      protocol = graft.util.CommitProtocol.Rename)
    val twin = Seq((9000L, tpl, "en", "src", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val hits = Dedup.dedupAgainstMinHashIndex(twin, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the dup IS found (est 1.0) but against exactly ONE witness — the
    // bucket's min-id anchor — instead of 300 pairs
    assert(hits.toSeq == Seq((9000L, 0L, 1.0)),
      s"expected the single anchor witness, got ${hits.toSeq}")
  }
}
