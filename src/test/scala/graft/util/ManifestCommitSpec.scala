package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The object-store-safe versioned-manifest protocol: data paths are
  * never renamed or overwritten, a publish is one create-no-overwrite
  * manifest file, torn publishes are invisible, readers get snapshot
  * isolation across appends/compactions/vacuums, and a retried batch
  * id is a no-op. Every assertion here holds WITHOUT rename atomicity:
  * the only write primitives used are fresh-file create and delete —
  * exactly what an S3-class store gives.
  */
class ManifestCommitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def conf = spark.sessionState.newHadoopConf()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def rows(from: Long, n: Long): DataFrame = {
    import spark.implicits._
    (from until from + n).map(i => (i, i * 10)).toDF("id", "v")
  }

  /** Append-shaped maintenance step: write a fresh dir, publish. */
  private def append(dir: String, df: DataFrame, batchId: String): Unit = {
    val d = ManifestCommit.newDataDir(dir, "t")
    df.write.parquet(s"$dir/$d")
    ManifestCommit.publish(conf, dir,
      m => m.copy(tables = m.tables.updated("t", m.table("t") :+ d)),
      batchId = Some(batchId)); ()
  }

  private def readIds(dir: String): Set[Long] =
    ManifestCommit.readTable(spark, dir, ManifestCommit.current(conf, dir),
      "t", schema).select(col("id")).collect().map(_.getLong(0)).toSet

  test("append publishes atomically; a retried batch id is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("mc_app").toString
    append(dir, rows(0, 10), "b1")
    assert(readIds(dir) == (0L until 10L).toSet)
    // the crashed-orchestrator retry: same batch, fresh data dir — the
    // publish no-ops, the orphan dir stays invisible
    append(dir, rows(0, 10), "b1")
    assert(readIds(dir) == (0L until 10L).toSet, "retried batch double-appended")
    assert(ManifestCommit.isBatchCommitted(conf, dir, "b1"))
    append(dir, rows(10, 5), "b2")
    assert(readIds(dir) == (0L until 15L).toSet)
  }

  test("a writer that dies before its publish leaves only invisible garbage") {
    val dir = java.nio.file.Files.createTempDirectory("mc_crash").toString
    append(dir, rows(0, 10), "b1")
    // crash: data fully written, no manifest published
    val orphan = ManifestCommit.newDataDir(dir, "t")
    rows(100, 5).write.parquet(s"$dir/$orphan")
    assert(readIds(dir) == (0L until 10L).toSet, "unpublished dir leaked into reads")
    // vacuum GCs the orphan
    ManifestCommit.vacuum(conf, dir, keepGens = 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, orphan)))
    assert(readIds(dir) == (0L until 10L).toSet)
  }

  test("a torn manifest write is invisible: readers resolve the previous generation") {
    val dir = java.nio.file.Files.createTempDirectory("mc_torn").toString
    append(dir, rows(0, 10), "b1")
    val g1 = ManifestCommit.current(conf, dir)
    assert(g1.gen == 1L)
    // a crashed publish that left a PARTIAL manifest object visible
    // (no terminator) — possible on a store without atomic PUT
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_manifests", "m2"),
      "gen=2\ncommitted=b1,b2\ntable=t:data/t/d-junk".getBytes("UTF-8"))
    assert(ManifestCommit.current(conf, dir).gen == 1L,
      "torn manifest must be skipped, not resolved")
    assert(readIds(dir) == (0L until 10L).toSet)
    assert(!ManifestCommit.isBatchCommitted(conf, dir, "b2"),
      "a torn publish must not count as committed")
    // vacuum must NOT count the torn file toward the keep window — the
    // old behavior kept only the torn m2, computed an empty live set,
    // and deleted every dir the real current snapshot referenced
    ManifestCommit.vacuum(conf, dir, keepGens = 1)
    assert(readIds(dir) == (0L until 10L).toSet,
      "vacuum with a torn newest manifest destroyed the live snapshot")
    assert(ManifestCommit.current(conf, dir).gen == 1L)
    // the retried publish SELF-HEALS the torn generation: its occupant
    // is unreadable to every reader by construction (and its writer is
    // dead under the single-writer contract), so the retry clears it
    // and takes the slot — without this the index is write-wedged
    // forever (every retry re-resolves gen 1 and collides again)
    append(dir, rows(10, 5), "b2")
    assert(ManifestCommit.current(conf, dir).gen == 2L)
    assert(readIds(dir) == (0L until 15L).toSet)
    assert(ManifestCommit.isBatchCommitted(conf, dir, "b2"))
  }

  test("a stale writer cannot re-claim a vacuumed generation number") {
    val dir = java.nio.file.Files.createTempDirectory("mc_stale").toString
    append(dir, rows(0, 5), "b1")
    val stale = ManifestCommit.current(conf, dir) // gen 1
    append(dir, rows(5, 5), "b2")
    append(dir, rows(10, 5), "b3")
    ManifestCommit.vacuum(conf, dir, keepGens = 1) // m1, m2 deleted
    // the stale writer targets gen 2 — the file is GONE, so the bare
    // create-no-overwrite would succeed, but readers resolve gen 3 and
    // would never see the "published" manifest: the gen guard must
    // fail it loudly instead of losing the update silently
    val d = ManifestCommit.newDataDir(dir, "t")
    rows(100, 5).write.parquet(s"$dir/$d")
    intercept[IllegalStateException] {
      ManifestCommit.publishAt(conf, dir, stale,
        m => m.copy(tables = m.tables.updated("t", m.table("t") :+ d)),
        batchId = Some("w"))
    }
    assert(readIds(dir) == (0L until 15L).toSet)
    assert(!ManifestCommit.isBatchCommitted(conf, dir, "w"))
  }

  test("two writers racing one generation: exactly one wins, the loser throws") {
    val dir = java.nio.file.Files.createTempDirectory("mc_race").toString
    append(dir, rows(0, 10), "b1")
    val d2 = ManifestCommit.newDataDir(dir, "t")
    val d3 = ManifestCommit.newDataDir(dir, "t")
    rows(10, 5).write.parquet(s"$dir/$d2")
    rows(20, 5).write.parquet(s"$dir/$d3")
    // both writers resolved gen 1 and race to publish gen 2: the first
    // CAS wins, the second — holding the same stale snapshot — must
    // fail loudly on the occupied generation, never overwrite it
    val stale = ManifestCommit.current(conf, dir)
    ManifestCommit.publishAt(conf, dir, stale,
      m => m.copy(tables = m.tables.updated("t", m.table("t") :+ d2)),
      batchId = Some("w1"))
    intercept[IllegalStateException] {
      ManifestCommit.publishAt(conf, dir, stale,
        m => m.copy(tables = m.tables.updated("t", m.table("t") :+ d3)),
        batchId = Some("w2"))
    }
    // winner's commit survives intact; the loser's batch is uncommitted
    assert(readIds(dir) == (0L until 15L).toSet)
    assert(ManifestCommit.isBatchCommitted(conf, dir, "w1"))
    assert(!ManifestCommit.isBatchCommitted(conf, dir, "w2"))
    // the loser retries against a FRESH snapshot and lands cleanly
    ManifestCommit.publish(conf, dir,
      m => m.copy(tables = m.tables.updated("t", m.table("t") :+ d3)),
      batchId = Some("w2"))
    assert(readIds(dir) == ((0L until 15L) ++ (20L until 25L)).toSet)
  }

  test("compaction replaces a table's dir list; readers keep their snapshot mid-swap and mid-vacuum") {
    val dir = java.nio.file.Files.createTempDirectory("mc_compact").toString
    append(dir, rows(0, 10), "b1")
    append(dir, rows(10, 10), "b2")
    val snapshot = ManifestCommit.current(conf, dir) // gen 2: two dirs
    val pinned = ManifestCommit.readTable(spark, dir, snapshot, "t", schema)
    assert(snapshot.table("t").size == 2)
    // compact: rewrite both dirs into ONE new dir, publish a REPLACE
    val folded = ManifestCommit.newDataDir(dir, "t")
    ManifestCommit.readTable(spark, dir, snapshot, "t", schema)
      .repartition(1).write.parquet(s"$dir/$folded")
    ManifestCommit.publish(conf, dir,
      m => m.copy(tables = m.tables.updated("t", Seq(folded))))
    assert(ManifestCommit.current(conf, dir).table("t") == Seq(folded))
    assert(readIds(dir) == (0L until 20L).toSet, "compaction changed reads")
    // the pre-compaction reader still scans its snapshot's dirs — they
    // exist until vacuum drops generations beyond the keep window
    assert(pinned.select(col("id")).collect().map(_.getLong(0)).toSet ==
      (0L until 20L).toSet, "snapshot reader broken by a concurrent compaction")
    // vacuum keeping 2 gens retains the snapshot's dirs; keeping 1 drops them
    ManifestCommit.vacuum(conf, dir, keepGens = 2)
    assert(pinned.select(col("id")).collect().map(_.getLong(0)).toSet ==
      (0L until 20L).toSet, "keepGens=2 vacuum must retain the previous snapshot")
    ManifestCommit.vacuum(conf, dir, keepGens = 1)
    assert(readIds(dir) == (0L until 20L).toSet)
    val dataDirs = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "data", "t"))
    try assert(dataDirs.count() == 1, "superseded dirs must be GCed at keepGens=1")
    finally dataDirs.close()
  }

  test("empty index reads as empty; manifest round-trips its encoding") {
    val dir = java.nio.file.Files.createTempDirectory("mc_empty").toString
    assert(ManifestCommit.current(conf, dir) == ManifestCommit.Empty)
    assert(readIds(dir) == Set.empty[Long])
    val m = ManifestCommit.Manifest(7L,
      Map("bands" -> Seq("data/bands/d-a", "data/bands/d-b"),
        "widths" -> Nil),
      Set("b1", "b2"))
    // decode(encode(m)) — through the private codec via a real publish
    append(dir, rows(0, 1), "b1")
    val cur = ManifestCommit.current(conf, dir)
    assert(cur.gen == 1L && cur.committed == Set("b1") && cur.table("t").size == 1)
    assert(m.table("widths").isEmpty)
  }
}
