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
    Dedup.saveMinHashIndex(corpus, dir)
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
    Dedup.saveMinHashIndex(corpus, dir)
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
    Dedup.saveMinHashIndex(corpus, dir)

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
    Dedup.saveMinHashIndex(oldCrawl, grown)
    def bandFiles(d: String) = {
      val b = scala.collection.mutable.Map[String, Long]()
      java.nio.file.Files.walk(java.nio.file.Paths.get(d, "bands"))
        .filter(_.toString.endsWith(".parquet"))
        .forEach(p => b(p.toString) = java.nio.file.Files.getLastModifiedTime(p).toMillis)
      b.toMap
    }
    val before = bandFiles(grown)
    Dedup.appendMinHashIndex(newCrawl, grown)
    val after = bandFiles(grown)
    // append-only: every base part-file survives byte-untouched
    before.foreach { case (f, mtime) =>
      assert(after.contains(f) && after(f) == mtime, s"base band file rewritten: $f")
    }
    assert(after.size > before.size, "no delta band files appended")

    val scratch = java.nio.file.Files.createTempDirectory("mhidx_s").toString
    Dedup.saveMinHashIndex(corpus, scratch)
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

  test("degenerate index bucket probes via its min-id anchor, not all-pairs") {
    import spark.implicits._
    // 300 identical docs (> the 256 bucket cap): every band bucket goes
    // degenerate — the pathological boilerplate-accumulation case
    val tpl = (1 to 60).map(i => s"boiler plate token$i").mkString(" ")
    val massDup = (0L until 300L).map(i => (i, tpl, "en", "src", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("mhidx_hot").toString
    Dedup.saveMinHashIndex(massDup, dir)
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
