package graft.vector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("persisted IVF index round-trips, prunes to probed cells, and matches build-and-query") {
    val sf = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sf.isDefined)
    val corpus = spark.read.parquet(s"${sf.get}/embeddings.parquet")
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    VectorOps.saveIvfIndex(corpus, dir, k = 10, iters = 2)
    val idx = VectorOps.loadIvfIndex(spark, dir)
    assert(idx.centroids.count() == 10)
    assert(idx.vectors.count() == corpus.count())
    // inverted-list layout on disk: one directory per cell inside the
    // manifest's base dir
    val baseRel = graft.util.ManifestCommit.current(
      spark.sessionState.newHadoopConf(), dir).table("vectors").head
    val cellDirs = new java.io.File(s"$dir/$baseRel").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellDirs.nonEmpty)

    // index built deterministically → loading it must reproduce the
    // build-and-query path exactly
    val (assignments, centroids) = VectorOps.buildIvf(corpus, k = 10, iters = 2)
    val direct = VectorOps.ivfProbe(corpus, queries, assignments, centroids)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val indexed = VectorOps.annIvfIndexed(queries, idx)
    val loaded = indexed.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(loaded == direct)
    assert(loaded.nonEmpty)

    // the probe must scan ONLY probed-cell partitions: the index scan's
    // partition filter carries the cell IN-list, and the scan reads
    // fewer partition dirs than exist (nq=10, nprobe=2 → ≤10 distinct
    // cells probed of 10, but the filter must at least be present and
    // static). Assert via the executed plan's FileSourceScan metadata.
    val planStr = indexed.queryExecution.executedPlan.toString
    // the index scan must carry a STATIC, NON-EMPTY cell partition filter
    // (cell IN (...)): that is what makes the probe read only probed-cell
    // files. Checked on the plan string — robust across AQE stage
    // wrapping, where structural collect() misses scans inside stages.
    val partFilters = """PartitionFilters: \[([^\]]*)\]""".r
      .findAllMatchIn(planStr).map(_.group(1)).toSeq
    assert(partFilters.exists(f => f.contains("cell") && f.trim.nonEmpty),
      s"no non-empty cell partition filter on the index scan in:\n$planStr")
  }

  test("k-means assignment is a pure map stage: zero shuffles in its plan") {
    val sf = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sf.isDefined)
    val corpus = spark.read.parquet(s"${sf.get}/embeddings.parquet")
    val (assignments, _) = VectorOps.buildIvf(corpus, k = 10, iters = 2)
    // the centroids are driver-side literals, so assigning a cell id to
    // every vector must stay inside the scan stage — no exchange of the
    // corpus anywhere in the assignment plan (the 100 TB contract the
    // map-stage argmax rewrite exists for)
    val exchanges = assignments.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"assignment plan shuffles:\n${assignments.queryExecution.executedPlan}")
    assert(assignments.count() == corpus.count())
  }

  test("appendIvfIndex: append-only, centroids untouched, equals same-centroid full assignment") {
    val sf = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sf.isDefined)
    val corpus = spark.read.parquet(s"${sf.get}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_append").toString
    VectorOps.saveIvfIndex(corpus.filter(col("vec_id") % 5 =!= 0), dir, k = 10, iters = 2)
    val conf = spark.sessionState.newHadoopConf()
    val baseRel = graft.util.ManifestCommit.current(conf, dir)
      .table("vectors").head
    def vectorFiles = {
      val b = scala.collection.mutable.Map[String, Long]()
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir, baseRel))
        .filter(_.toString.endsWith(".parquet"))
        .forEach(p => b(p.toString) = java.nio.file.Files.getLastModifiedTime(p).toMillis)
      b.toMap
    }
    def centroids = VectorOps.loadIvfIndex(spark, dir).centroids
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val centroidsBefore = centroids
    val before = vectorFiles
    VectorOps.appendIvfIndex(corpus.filter(col("vec_id") % 5 === 0), dir)
    val after = vectorFiles
    // the BASE cell files are byte-untouched: the batch lands in the
    // flat level-0 tail (compaction owns the re-layout into cell dirs)
    assert(after == before, "base cell files changed by an append")
    assert(graft.util.ManifestCommit.current(conf, dir)
      .rows(graft.util.ManifestTiered.tailTable("vectors")) > 0,
      "no tail rows appended")
    assert(centroids === centroidsBefore)
    // the appended index row-equals assigning the FULL corpus against
    // the same centroids (the invariant that keeps probes correct);
    // read through loadIvfIndex — the base ∪ runs ∪ tail union every
    // probe consumes
    val got = VectorOps.loadIvfIndex(spark, dir).vectors
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = VectorOps.assignCells(corpus, centroidsBefore)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // an untrained index refuses adds (FAISS contract)
    val emptyDir = java.nio.file.Files.createTempDirectory("ivf_empty").toString
    VectorOps.saveIvfIndex(corpus.filter(lit(false)), emptyDir, k = 10, iters = 2)
    intercept[IllegalStateException] {
      VectorOps.appendIvfIndex(corpus.limit(1), emptyDir)
    }
  }
}
