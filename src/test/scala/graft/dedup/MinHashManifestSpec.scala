package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.{CommitProtocol, ManifestCommit, ManifestTiered}

/** The MinHash index on the versioned-manifest (object-store) commit
  * protocol: the SAME public entry points (save / append /
  * probeAndAppend / compact / probe) must produce probe results
  * identical to the rename-protocol index — the protocol is a
  * deployment choice, never a semantics choice. Exercised on the local
  * FS with protocol = Manifest (the manifest module itself never
  * renames, so local-FS green implies the same code path an s3a:// dir
  * takes — ManifestCommitSpec holds the primitive-level guarantees).
  */
class MinHashManifestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def conf = spark.sessionState.newHadoopConf()

  private def sf: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  private def hitSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("a LEGACY rename index refuses probes with the migrate pointer; " +
      "after adoption it probes bit-for-bit like a manifest build") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val mDir = java.nio.file.Files.createTempDirectory("mh_mani").toString
    val rDir = java.nio.file.Files.createTempDirectory("mh_ren").toString
    Dedup.saveMinHashIndex(corpus, mDir, protocol = CommitProtocol.Manifest)
    graft.util.RenameFixtures.minhashIndex(spark, rDir) { scratch =>
      Dedup.saveMinHashIndex(corpus, scratch)
    }
    assert(ManifestCommit.exists(conf, mDir), "manifest build must create _manifests")
    assert(!ManifestCommit.exists(conf, rDir), "the legacy fixture must NOT")
    val probe = corpus.filter(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    // the retired protocol's one legal operation is adoption — probing
    // as-is names the fix
    val e = intercept[IllegalStateException] {
      Dedup.dedupAgainstMinHashIndex(probe, rDir).count()
    }
    assert(e.getMessage.contains("index_migrate"), e.getMessage)
    Dedup.migrateMinHashIndexToManifest(spark, rDir)
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, mDir)) ==
      hitSet(Dedup.dedupAgainstMinHashIndex(probe, rDir)))
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, mDir)).nonEmpty)
  }

  test("append folds a delta exactly once; probes equal a from-scratch build; compact is invisible") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val oldCrawl = corpus.filter(col("doc_id") % 3 =!= 0)
    val delta = corpus.filter(col("doc_id") % 3 === 0)
    val grown = java.nio.file.Files.createTempDirectory("mh_mani_g").toString
    val scratch = java.nio.file.Files.createTempDirectory("mh_mani_s").toString
    Dedup.saveMinHashIndex(oldCrawl, grown, protocol = CommitProtocol.Manifest)
    Dedup.saveMinHashIndex(corpus, scratch, protocol = CommitProtocol.Manifest)
    Dedup.appendMinHashIndex(delta, grown, batchId = Some("crawl-7"))
    // the crashed-orchestrator retry: the committed id makes it a no-op
    Dedup.appendMinHashIndex(delta, grown, batchId = Some("crawl-7"))
    assert(ManifestCommit.isBatchCommitted(conf, grown, "crawl-7"))
    val probe = corpus.filter(col("doc_id") < 30)
      .withColumn("doc_id", col("doc_id") + 2000000L)
    def hits(d: String) = hitSet(Dedup.dedupAgainstMinHashIndex(probe, d))
    val fromScratch = hits(scratch)
    assert(hits(grown) == fromScratch, "append+retry must equal a from-scratch build")
    assert(fromScratch.nonEmpty)
    // tail is non-empty pre-compact; Minor folds it into one flat run
    val m0 = ManifestCommit.current(conf, grown)
    assert(m0.rows(ManifestTiered.tailTable("bands")) > 0L)
    Dedup.compactMinHashIndex(spark, grown)
    val m1 = ManifestCommit.current(conf, grown)
    assert(m1.rows(ManifestTiered.tailTable("bands")) == 0L, "tail must empty")
    assert(m1.entries(ManifestTiered.l1Table("bands")).size == 1, "one L1 run")
    assert(m1.rows(ManifestTiered.l1Table("bands")) ==
      m0.rows(ManifestTiered.tailTable("bands")), "Minor folds exactly the tail")
    assert(hits(grown) == fromScratch, "compaction changed probe results")
    // idempotent: nothing left to fold
    Dedup.compactMinHashIndex(spark, grown)
    assert(ManifestCommit.current(conf, grown).gen == m1.gen, "NoOp must not publish")
    // maintenance observability reads tier masses off the manifest
    val (action, sizes) = Dedup.compactionTiers(spark, grown)
    assert(action == "NoOp" && sizes.tail == 0L && sizes.l1 == m1.rows(ManifestTiered.l1Table("bands")))
  }

  test("probe-and-append drains crawls with snapshot-isolated probes; vacuum keeps live readers whole") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val dir = java.nio.file.Files.createTempDirectory("mh_mani_d").toString
    val hitsOut = java.nio.file.Files.createTempDirectory("mh_mani_h").toString
    Dedup.saveMinHashIndex(corpus.filter(col("doc_id") % 4 === 0), dir,
      protocol = CommitProtocol.Manifest)
    // two crawls through the maintenance entry: each probes the
    // PRE-batch snapshot, then appends itself in the same publish
    (1 to 2).foreach { k =>
      Dedup.probeAndAppendMinHashIndex(
        corpus.filter(col("doc_id") % 4 === k), dir, hitsOut.toString,
        batchId = Some(ManifestCommit.seqBatchId("drain", k.toLong)))
    }
    // retried batch (watermark id): a full no-op — no third hits dir,
    // no index growth
    val genBefore = ManifestCommit.current(conf, dir).gen
    Dedup.probeAndAppendMinHashIndex(
      corpus.filter(col("doc_id") % 4 === 2), dir, hitsOut.toString,
      batchId = Some(ManifestCommit.seqBatchId("drain", 2L)))
    assert(ManifestCommit.current(conf, dir).gen == genBefore)
    // a reader pinned to the pre-compaction snapshot keeps its results
    // across compact + vacuum(keepGens=2) — snapshot isolation, the
    // race the rename protocol excludes only by scheduling
    val probe = corpus.filter(col("doc_id") < 25)
      .withColumn("doc_id", col("doc_id") + 3000000L)
    val pinned = Dedup.dedupAgainstMinHashIndex(probe, dir)
    val before = hitSet(pinned)
    Dedup.compactMinHashIndex(spark, dir)
    ManifestCommit.vacuum(conf, dir, keepGens = 2, graceMs = 0L)
    assert(hitSet(pinned) == before, "pinned snapshot broken by compact+vacuum")
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir)) == before,
      "fresh probe changed by compaction")
    // vacuum to the current snapshot only: fresh probes still whole
    ManifestCommit.vacuum(conf, dir, keepGens = 1, graceMs = 0L)
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir)) == before)
    assert(before.nonEmpty)
  }

  test("manifest probes prune the partitioned base statically and push band/bmod to the flat tiers") {
    assume(sf.isDefined)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val dir = java.nio.file.Files.createTempDirectory("mh_mani_p").toString
    Dedup.saveMinHashIndex(corpus, dir, protocol = CommitProtocol.Manifest)
    Dedup.appendMinHashIndex(corpus.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 7000000L), dir,
      batchId = Some("b1"))
    Dedup.compactMinHashIndex(spark, dir) // tail → one flat L1 run
    val probe = Dedup.dedupAgainstMinHashIndex(
      corpus.filter(col("doc_id") < 2), dir)
    val scans = probe.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("data/bands")) => f
    }
    assert(scans.nonEmpty)
    val (baseScans, flatScans) = scans.partition(
      _.relation.location.rootPaths.exists(_.toString.contains("data/bands/")))
    assert(baseScans.nonEmpty, "probe must read the partitioned base")
    baseScans.foreach { f =>
      val static = f.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      assert(static.nonEmpty, s"base scan without static partition filter:\n$f")
      val pruned = f.relation.location.listFiles(static, Nil).map(_.files.size).sum
      val total = f.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
      assert(pruned < total,
        s"2-doc probe must prune the manifest base (pruned=$pruned, total=$total)")
    }
    // flat L1 run scans push the direct band/bmod predicates to
    // parquet footer stats
    assert(flatScans.nonEmpty, "probe must read the flat L1 run")
    flatScans.foreach { f =>
      val pushed = f.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("band") && pushed.contains("bmod"),
        s"flat-tier scan must push band/bmod, got: $pushed")
    }
  }

  test("a REBUILD over a manifest index stays manifest (Auto) and refuses a rename flip") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
      .filter(col("doc_id") < 300)
    val dir = java.nio.file.Files.createTempDirectory("mh_flip").toString
    Dedup.saveMinHashIndex(corpus.filter(col("doc_id") % 2 === 0), dir,
      protocol = CommitProtocol.Manifest)
    val probe = corpus.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 6000000L)
    // an Auto rebuild on LOCAL FS must keep writing manifest-side —
    // a rename-layout rebuild would be invisible to readers, which
    // resolve the surviving manifest (the silent split-protocol trap)
    Dedup.saveMinHashIndex(corpus, dir) // protocol = Auto
    val scratch = java.nio.file.Files.createTempDirectory("mh_flip_s").toString
    Dedup.saveMinHashIndex(corpus, scratch, protocol = CommitProtocol.Manifest)
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir)) ==
      hitSet(Dedup.dedupAgainstMinHashIndex(probe, scratch)),
      "Auto rebuild over a manifest index must land manifest-side")
    // an EXPLICIT rename rebuild request is refused — the protocol is
    // retired, with the adoption pointer in the message
    val e = intercept[IllegalArgumentException] {
      Dedup.saveMinHashIndex(corpus, dir, protocol = CommitProtocol.Rename)
    }
    assert(e.getMessage.contains("retired"), e.getMessage)
    assert(e.getMessage.contains("index_migrate"), e.getMessage)
  }

  test("an un-adopted rename tree resolved as manifest protocol fails loudly instead of reading empty") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
      .filter(col("doc_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("mh_unadopted").toString
    graft.util.RenameFixtures.minhashIndex(spark, dir) { scratch =>
      Dedup.saveMinHashIndex(corpus, scratch)
    } // rename layout, no _manifests
    // what a probe on an object store would do: resolve current() →
    // Empty, then read — the silent-empty trap. The read and the size
    // policy must throw with the index_migrate pointer; appends must
    // refuse to publish a manifest that hides the legacy data.
    val e = intercept[IllegalStateException] {
      graft.util.ManifestTiered.read(spark, dir, ManifestCommit.Empty,
        "bands", Dedup.BandsSchema).count()
    }
    assert(e.getMessage.contains("index_migrate"))
    intercept[IllegalStateException] {
      graft.util.ManifestTiered.sizes(spark, dir, ManifestCommit.Empty,
        "bands", Dedup.BandsSchema)
    }
    // after adoption the same calls work
    Dedup.migrateMinHashIndexToManifest(spark, dir)
    val m = ManifestCommit.current(conf, dir)
    assert(graft.util.ManifestTiered.read(spark, dir, m,
      "bands", Dedup.BandsSchema).count() > 0)
  }

  test("zero-copy migration: a rename index adopts the manifest protocol in place, probes unchanged, legacy dirs GC on supersede") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val dir = java.nio.file.Files.createTempDirectory("mh_migrate").toString
    // a REAL rename-protocol history shape: base + legacy L1 run + live
    // tail, with the two drain tokens committed legacy-style
    graft.util.RenameFixtures.minhashIndex(spark, dir,
      committed = Seq("crawl-2", "crawl-3")) { scratch =>
      Dedup.saveMinHashIndex(corpus.filter(col("doc_id") % 4 <= 1), scratch)
      Dedup.appendMinHashIndex(corpus.filter(col("doc_id") % 4 === 2), scratch)
      Dedup.compactMinHashIndex(spark, scratch) // tail → run
      Dedup.appendMinHashIndex(corpus.filter(col("doc_id") % 4 === 3), scratch)
    } // leaves a live tail
    val probe = corpus.filter(col("doc_id") < 25)
      .withColumn("doc_id", col("doc_id") + 5000000L)
    // the expected hit set: a from-scratch manifest build over the same
    // corpus (the probe a pre-retirement rename reader produced)
    val truth = java.nio.file.Files.createTempDirectory("mh_migrate_t").toString
    Dedup.saveMinHashIndex(corpus, truth)
    val before = hitSet(Dedup.dedupAgainstMinHashIndex(probe, truth))
    assert(before.nonEmpty)
    val filesBefore = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try { import scala.jdk.CollectionConverters._
        st.iterator().asScala.count(_.toString.endsWith(".parquet")) }
      finally st.close()
    }
    Dedup.migrateMinHashIndexToManifest(spark, dir)
    assert(ManifestCommit.exists(conf, dir))
    // not one data byte rewritten
    val filesAfter = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try { import scala.jdk.CollectionConverters._
        st.iterator().asScala.count(_.toString.endsWith(".parquet")) }
      finally st.close()
    }
    assert(filesAfter == filesBefore, "adoption must not rewrite data")
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir)) == before,
      "migration changed probe results")
    // committed ids carried over: the replayed batches no-op
    assert(ManifestCommit.isBatchCommitted(conf, dir, "crawl-2"))
    Dedup.appendMinHashIndex(corpus.filter(col("doc_id") % 4 === 3), dir,
      batchId = Some("crawl-3"))
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir)) == before,
      "carried-over batch id failed to no-op a replay")
    // manifest-side maintenance: l1+tail (50% of docs) ≥ base (50%) →
    // MAJOR — every legacy tier folds into a fresh data/ base; probes
    // invariant
    Dedup.compactMinHashIndex(spark, dir)
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir)) == before)
    val m = ManifestCommit.current(conf, dir)
    Seq("bands", "widths").foreach { t =>
      assert(m.table(t).forall(_.startsWith("data/")),
        s"post-Major base of $t must live under data/")
    }
    // vacuum drops the superseded generations AND the legacy-layout
    // dirs only those generations referenced (the non-data/ GC arm)
    ManifestCommit.vacuum(conf, dir, keepGens = 1, graceMs = 0L)
    Seq("bands", "bands_l1", "bands_tail", "widths", "widths_l1",
      "widths_tail").foreach { legacy =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, legacy)),
        s"superseded legacy dir $legacy must be GC'd by vacuum")
    }
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir)) == before)
  }

  test("a writer crash between lay and publish leaves probes on the old snapshot; the redrive lands clean") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
      .filter(col("doc_id") < 400)
    val dir = java.nio.file.Files.createTempDirectory("mh_mani_c").toString
    Dedup.saveMinHashIndex(corpus.filter(col("doc_id") % 2 === 0), dir,
      protocol = CommitProtocol.Manifest)
    val probe = corpus.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 4000000L)
    val before = hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir))
    // simulate the crash state the protocol promises to tolerate: data
    // dirs fully laid, manifest never published (what a killed
    // appendMinHashIndex leaves behind)
    val orphan = ManifestCommit.newDataDir(dir, "bands.tail")
    graft.util.Tables(spark, sf.get, "documents").limit(0)
      .select(col("doc_id"), col("doc_id").as("bucket"),
        array(col("doc_id")).as("sig"),
        lit(0).as("band"), lit(0).as("bmod"))
      .write.parquet(s"$dir/$orphan")
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir)) == before,
      "unpublished dirs must be invisible to probes")
    // the redrive appends for real and the orphan stays garbage
    Dedup.appendMinHashIndex(corpus.filter(col("doc_id") % 2 === 1), dir,
      batchId = Some("redrive-1"))
    val scratch = java.nio.file.Files.createTempDirectory("mh_mani_c2").toString
    Dedup.saveMinHashIndex(corpus, scratch, protocol = CommitProtocol.Manifest)
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir)) ==
      hitSet(Dedup.dedupAgainstMinHashIndex(probe, scratch)))
  }

  test("AS-OF probes read a retained historical generation; vacuumed " +
      "generations fail loudly; the rename protocol refuses time travel") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
      .filter(col("doc_id") < 400)
    val dir = java.nio.file.Files.createTempDirectory("mh_asof").toString
    Dedup.saveMinHashIndex(corpus.filter(col("doc_id") % 2 === 0), dir,
      protocol = CommitProtocol.Manifest)
    val g1 = ManifestCommit.current(conf, dir).gen
    val probe = corpus.filter(col("doc_id") < 40)
      .withColumn("doc_id", col("doc_id") + 7000000L)
    val oldHits = hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir))
    Dedup.appendMinHashIndex(corpus.filter(col("doc_id") % 2 === 1), dir,
      batchId = Some("crawl-1"))
    // the AS-OF probe reproduces the pre-append result exactly, while
    // the current snapshot sees the appended crawl too
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir,
      asOfGen = Some(g1))) == oldHits)
    val curHits = hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir))
    assert(curHits.size > oldHits.size,
      "the appended crawl must contribute hits the AS-OF probe lacks")
    // vacuum to the current generation: the history is gone and the
    // AS-OF probe must say so (never silently read a different state)
    ManifestCommit.vacuum(conf, dir, keepGens = 1, graceMs = 0L)
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstMinHashIndex(probe, dir, asOfGen = Some(g1)).count()
    }
    assert(e.getMessage.contains("retained generations"))
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir)) == curHits,
      "vacuum must not disturb the current snapshot")
    // a legacy rename index: no probes at all (let alone time travel)
    // until adopted
    val rdir = java.nio.file.Files.createTempDirectory("mh_asof_r").toString
    graft.util.RenameFixtures.minhashIndex(spark, rdir) { scratch =>
      Dedup.saveMinHashIndex(corpus, scratch)
    }
    val e2 = intercept[IllegalStateException] {
      Dedup.dedupAgainstMinHashIndex(probe, rdir, asOfGen = Some(1L)).count()
    }
    assert(e2.getMessage.contains("index_migrate"))
  }

  test("an append never publishes rows banded under superseded params — " +
      "even on an uncontended FIRST attempt") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
      .filter(col("doc_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("mh_toctou").toString
    Dedup.saveMinHashIndex(corpus.filter(col("doc_id") % 2 === 0), dir)
    val m0 = ManifestCommit.current(conf, dir)
    // the appender validated + banded under the defaults; BEFORE its
    // publish, a racing rebuild rewrites the meta marker (its first
    // step — the rebuild's own manifest may not even have landed yet,
    // so the publish CAS alone would see NO contention)
    val banded = Dedup.bandedSignaturesDev(
      corpus.filter(col("doc_id") % 2 === 1)).localCheckpoint()
    val metaPath = java.nio.file.Paths.get(dir, "_graft_minhash_meta")
    val origMeta = new String(java.nio.file.Files.readAllBytes(metaPath), "UTF-8")
    // rewrite through the Hadoop FS, exactly as a real rebuild's
    // writeIndexMeta does (a raw NIO write leaves a stale .crc sidecar)
    val hp = new org.apache.hadoop.fs.Path(dir, "_graft_minhash_meta")
    val out = hp.getFileSystem(conf).create(hp, true)
    try out.write(origMeta.replace("shingle_w=5", "shingle_w=9")
      .getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalStateException] {
      Dedup.appendAtManifest(banded, dir, m0, Some("t1"),
        commuting = true, expectMeta = origMeta)
    }
    assert(e.getMessage.contains("changed the MinHash params"), e.getMessage)
    val cur = ManifestCommit.current(conf, dir)
    assert(cur.rows(ManifestTiered.tailTable("bands")) == 0L &&
      !cur.isCommitted("t1"),
      "the stale-banded batch must not have published")
  }

  test("protocol-crossing rebuild deletes the rename tree only AFTER the " +
      "publish; an adopted index's manifest-referenced legacy dirs survive") {
    assume(sf.isDefined)
    val corpus = graft.util.Tables(spark, sf.get, "documents")
    val dir = java.nio.file.Files.createTempDirectory("mh_cross").toString
    graft.util.RenameFixtures.minhashIndex(spark, dir) { scratch =>
      Dedup.saveMinHashIndex(corpus.filter(col("doc_id") % 2 === 0), scratch)
    }
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "bands")))
    // crossing rebuild (Auto → Manifest): the old rename tree must be
    // gone afterwards — and because the deletion now runs POST-publish,
    // a crash mid-build would have left it (and its readers) whole
    Dedup.saveMinHashIndex(corpus, dir)
    assert(ManifestCommit.exists(conf, dir))
    Seq("bands", "widths", "bands_tail", "widths_tail", "committed").foreach { n =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, n)),
        s"rename-layout dir '$n' must be deleted by the crossing rebuild")
    }
    val probe = corpus.filter(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, dir)).nonEmpty)
    // ADOPTED index: its legacy dirs are manifest-referenced live data —
    // a rebuild must leave them for vacuum's legacy-GC arm (the retained
    // pre-rebuild generation still resolves them via AS-OF)
    val adir = java.nio.file.Files.createTempDirectory("mh_cross_a").toString
    graft.util.RenameFixtures.minhashIndex(spark, adir) { scratch =>
      Dedup.saveMinHashIndex(corpus.filter(col("doc_id") % 2 === 0), scratch)
    }
    Dedup.migrateMinHashIndexToManifest(spark, adir)
    val adoptedGen = ManifestCommit.current(conf, adir).gen
    Dedup.saveMinHashIndex(corpus, adir) // rebuild over the adopted index
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(adir, "bands")),
      "a manifest-referenced legacy dir must survive the rebuild")
    // the retained adoption generation still probes whole
    assert(hitSet(Dedup.dedupAgainstMinHashIndex(probe, adir,
      asOfGen = Some(adoptedGen))).nonEmpty)
  }
}
