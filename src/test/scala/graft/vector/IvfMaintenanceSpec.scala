package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once + tiered-compaction contract of the persisted IVF
  * index family — the r12 gap this round closes: the IVF add was the
  * one index-append sibling without the staged-delta + marker +
  * committed-token treatment (a retried add double-appended vectors)
  * and the only persisted index with no compaction arm. Kill-tests
  * drive recovery from BOTH sides of the append marker; probe results
  * must be identical across every tier state; the PQ flavor's two
  * stores (vectors + codes) must commit atomically as a pair.
  */
class IvfMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 64

  /** Deterministic synthetic vectors: id `from until from+n`. */
  private def vecs(from: Long, n: Long): DataFrame = {
    import spark.implicits._
    (from until from + n).map { i =>
      (i, Array.tabulate(Dim)(j => (((i * 31 + j * 7) % 97).toFloat - 48f) / 48f))
    }.toDF("vec_id", "embedding")
  }

  private def queries(n: Int): DataFrame =
    vecs(0, n).select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  private def probe(dir: String): Set[(Long, Long, Int)] =
    VectorOps.annIvfIndexed(queries(5), VectorOps.loadIvfIndex(spark, dir), topk = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

  private def visible(dir: String): Long =
    VectorOps.loadIvfIndex(spark, dir).vectors.count()

  private def baseFiles(dir: String): Map[String, Long] = {
    val b = scala.collection.mutable.Map[String, Long]()
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "vectors"))
      .filter(_.toString.endsWith(".parquet"))
      .forEach(p => b(p.toString) = java.nio.file.Files.getLastModifiedTime(p).toMillis)
    b.toMap
  }

  private def runsOf(dir: String): Seq[Long] =
    graft.util.TieredIndex.runIds(dir, "vectors")

  private def tailRows(dir: String): Long =
    graft.util.TieredIndex.readTail(spark, dir, "vectors",
      IvfMaintenance.VectorsSchema).count()

  test("append is exactly-once: a re-driven batch id is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_once").toString
    VectorOps.saveIvfIndex(vecs(0, 80), dir, k = 4, iters = 2,
      protocol = graft.util.CommitProtocol.Rename)
    VectorOps.appendIvfIndex(vecs(80, 20), dir, batchId = Some("b1"))
    assert(visible(dir) == 100)
    val r0 = probe(dir)
    // the foreachBatch-retry / re-run-CLI scenario: same batch again
    VectorOps.appendIvfIndex(vecs(80, 20), dir, batchId = Some("b1"))
    assert(visible(dir) == 100, "retried batch double-appended")
    assert(probe(dir) == r0)
    // a NEW batch id still appends
    VectorOps.appendIvfIndex(vecs(100, 20), dir, batchId = Some("b2"))
    assert(visible(dir) == 120)
  }

  test("crash BEFORE the marker: unmarked staging is dropped, batch re-drives cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_pre").toString
    VectorOps.saveIvfIndex(vecs(0, 80), dir, k = 4, iters = 2,
      protocol = graft.util.CommitProtocol.Rename)
    // torn pre-marker state: staged delta exists, no marker — as if the
    // writer died between its parquet write and the commit
    val staged = java.nio.file.Paths.get(dir, "vectors_delta")
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.write(staged.resolve("part-torn.parquet"), Array[Byte](1))
    VectorOps.appendIvfIndex(vecs(80, 20), dir, batchId = Some("b1")) // runs recovery
    assert(!java.nio.file.Files.exists(staged), "unmarked staging must be dropped")
    assert(visible(dir) == 100, "torn rows leaked into the index")
    assert(probe(dir).nonEmpty)
  }

  test("crash AFTER the marker: recovery promotes the staged batch once; the retry is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_post").toString
    VectorOps.saveIvfIndex(vecs(0, 80), dir, k = 4, iters = 2,
      protocol = graft.util.CommitProtocol.Rename)
    val cents = spark.read.schema(IvfMaintenance.CentroidsSchema)
      .parquet(s"$dir/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    // reproduce the writer's exact pre-crash state: delta fully staged,
    // marker (with batch id) atomically placed, then death before the
    // promote — the other side of the decision point
    VectorOps.assignCells(vecs(80, 20), cents)
      .select(col("vec_id"), col("embedding"), col("cell"))
      .write.mode("overwrite").parquet(s"$dir/vectors_delta")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_append_commit"),
      "b1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the orchestrator retries the SAME batch: recovery must finish the
    // interrupted promote + token, and the retry must then no-op
    VectorOps.appendIvfIndex(vecs(80, 20), dir, batchId = Some("b1"))
    assert(visible(dir) == 100, "marked batch promoted twice (or lost)")
    assert(graft.util.IndexCommit.isBatchCommitted(dir, "b1"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_append_commit")))
  }

  test("a second concurrent writer fails loudly; probes stay lock-free") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_lease").toString
    VectorOps.saveIvfIndex(vecs(0, 80), dir, k = 4, iters = 2,
      protocol = graft.util.CommitProtocol.Rename)
    graft.util.IndexCommit.withWriterLease(dir) {
      intercept[IllegalStateException] {
        VectorOps.appendIvfIndex(vecs(80, 20), dir, batchId = Some("b1"))
      }
      // read-only probe takes no lease — must succeed under the lock
      assert(probe(dir).nonEmpty)
    }
  }

  test("tiered compaction: minor folds only the tail, major trips at the size ratio, probes identical") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_tier").toString
    VectorOps.saveIvfIndex(vecs(0, 60), dir, k = 4, iters = 2,
      protocol = graft.util.CommitProtocol.Rename)
    val base0 = baseFiles(dir)
    val truthCents = spark.read.schema(IvfMaintenance.CentroidsSchema)
      .parquet(s"$dir/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

    // cycle 1: tail 20 < base 60 → Minor (run=0, base untouched)
    VectorOps.appendIvfIndex(vecs(60, 20), dir, batchId = Some("c1"))
    val r1 = probe(dir)
    VectorOps.compactIvfIndex(spark, dir)
    assert(runsOf(dir) == Seq(0L) && tailRows(dir) == 0)
    assert(baseFiles(dir) == base0, "minor fold must not touch base files")
    assert(probe(dir) == r1, "compaction changed probe results")

    // cycle 2: l1 20 + tail 20 = 40 < 60 → Minor again (run=1)
    VectorOps.appendIvfIndex(vecs(80, 20), dir, batchId = Some("c2"))
    val r2 = probe(dir)
    VectorOps.compactIvfIndex(spark, dir)
    assert(runsOf(dir) == Seq(0L, 1L))
    assert(baseFiles(dir) == base0)
    assert(probe(dir) == r2)

    // cycle 3: l1 40 + tail 20 = 60 ≥ base 60 → MAJOR: one re-laid base
    VectorOps.appendIvfIndex(vecs(100, 20), dir, batchId = Some("c3"))
    val r3 = probe(dir)
    VectorOps.compactIvfIndex(spark, dir)
    assert(runsOf(dir).isEmpty && tailRows(dir) == 0)
    assert(baseFiles(dir) != base0, "major compaction rewrites the base")
    assert(probe(dir) == r3)
    assert(visible(dir) == 120)
    // the folded index still row-equals assigning everything against
    // the train-once centroids (the FAISS add contract, post-compact)
    val got = VectorOps.loadIvfIndex(spark, dir).vectors
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = VectorOps.assignCells(vecs(0, 120), truthCents)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // compaction is a NoOp when there is nothing to fold
    val files0 = baseFiles(dir)
    VectorOps.compactIvfIndex(spark, dir)
    assert(baseFiles(dir) == files0)
  }

  test("PQ flavor: vectors and codes commit as ONE atomic pair, fold together") {
    val dir = java.nio.file.Files.createTempDirectory("pq_pair").toString
    PqOps.savePqIndex(vecs(0, 80), dir, k = 4, iters = 2,
      protocol = graft.util.CommitProtocol.Rename)
    PqOps.addToPqIndex(vecs(80, 20), dir, batchId = Some("b1"))
    PqOps.addToPqIndex(vecs(80, 20), dir, batchId = Some("b1")) // retry no-ops
    val idx = PqOps.loadPqIndex(spark, dir)
    assert(idx.vectors.count() == 100 && idx.codes.count() == 100,
      "vectors/codes counts diverged — the pair did not commit atomically")
    val r0 = PqOps.annPqIndexed(queries(5), idx, topk = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    VectorOps.compactIvfIndex(spark, dir) // folds BOTH stores under one marker
    assert(tailRows(dir) == 0)
    assert(graft.util.TieredIndex.readTail(spark, dir, "codes",
      IvfMaintenance.CodesSchema).count() == 0)
    val idx1 = PqOps.loadPqIndex(spark, dir)
    assert(idx1.vectors.count() == 100 && idx1.codes.count() == 100)
    val r1 = PqOps.annPqIndexed(queries(5), idx1, topk = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(r1 == r0, "compaction changed PQ probe results")
  }

  test("a FLAT rebuild over a former PQ dir drops the stale codes/codebooks generation") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_downgrade").toString
    PqOps.savePqIndex(vecs(0, 120), dir, k = 4, iters = 2,
      protocol = graft.util.CommitProtocol.Rename)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "codes")))
    // rebuild as a FLAT index: saveIvfIndex never writes codes, so
    // stale codes/codebooks surviving here would make the dir still
    // read as a PQ index and silently join the OLD generation's codes
    // against the NEW vectors
    VectorOps.saveIvfIndex(vecs(0, 140), dir, k = 4, iters = 2,
      protocol = graft.util.CommitProtocol.Rename)
    Seq("codes", "codes_l1", "codes_tail", "codebooks").foreach { n =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, n)),
        s"stale PQ artifact '$n' survived a flat rebuild")
    }
    assert(VectorOps.loadIvfIndex(spark, dir).vectors.count() == 140)
  }

  test("manifest append: a commuting retry across a racing REBUILD fails " +
      "loudly instead of landing rows coded under superseded centroids") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_rebuild_race").toString
    val conf = spark.sessionState.newHadoopConf()
    VectorOps.saveIvfIndex(vecs(0, 80), dir, k = 4, iters = 2,
      protocol = graft.util.CommitProtocol.Manifest)
    val base = graft.util.ManifestCommit.current(conf, dir)
    // the appender's batch was cell-assigned under base's centroids;
    // before its publish lands, a REBUILD retrains and replaces them
    VectorOps.saveIvfIndex(vecs(0, 120), dir, k = 8, iters = 2,
      protocol = graft.util.CommitProtocol.Manifest)
    val batch = vecs(200, 10).withColumn("cell", lit(0L))
    val e = intercept[IllegalStateException] {
      IvfMaintenance.appendManifest(spark, dir, batch, None,
        batchId = Some("race1"), commuting = true, at = Some(base))
    }
    assert(e.getMessage.contains("concurrent rebuild"), e.getMessage)
    // nothing from the vetoed batch is visible, and the batch id was
    // never committed — the re-driven (re-assigned) append still runs
    val cur = graft.util.ManifestCommit.current(conf, dir)
    assert(cur.rows(graft.util.ManifestTiered.tailTable("vectors")) == 0L)
    assert(!cur.isCommitted("race1"))
    // a commuting retry across a mere racing APPEND still lands: both
    // writers resolved the SAME post-rebuild base (centroids unchanged
    // between that base and the retry's re-resolve)
    IvfMaintenance.appendManifest(spark, dir, batch, None,
      batchId = Some("a1"), commuting = true, at = Some(cur))
    IvfMaintenance.appendManifest(spark, dir,
      vecs(210, 10).withColumn("cell", lit(1L)), None,
      batchId = Some("a2"), commuting = true, at = Some(cur))
    val fin = graft.util.ManifestCommit.current(conf, dir)
    assert(fin.isCommitted("a1") && fin.isCommitted("a2"))
    assert(fin.rows(graft.util.ManifestTiered.tailTable("vectors")) == 20L)
    assert(fin.gen == cur.gen + 2, "one generation per append, none lost")
  }
}
