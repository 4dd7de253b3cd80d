package graft.util

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The shared index-commit protocol, exercised on synthetic dirs (no
  * Spark): marker-arbitrated promote/swap recovery, batch tokens, and
  * the OS-file-lock writer lease that makes single-writer an enforced
  * contract instead of a documented one.
  */
class IndexCommitSpec extends AnyFunSuite {

  private def tmp() = Files.createTempDirectory("idxcommit").toString

  private def put(dir: String, rel: String, body: String = "x"): Unit = {
    val p = Paths.get(dir, rel)
    Files.createDirectories(p.getParent)
    Files.write(p, body.getBytes("UTF-8")); ()
  }

  private def ls(dir: String): Set[String] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Set.empty
    val st = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => root.relativize(p).toString).toSet
    } finally st.close()
  }

  test("commit promotes staged part-files, swaps _new dirs, records the token") {
    val dir = tmp()
    val layout = IndexCommit.Layout("_m",
      staged = Seq("delta" -> "tail"), swaps = Seq("stats"))
    put(dir, "tail/part-0.parquet")
    put(dir, "delta/part-1.parquet")
    put(dir, "delta/k=1/part-2.parquet")
    put(dir, "stats/old.parquet")
    put(dir, "stats_new/new.parquet")
    IndexCommit.commit(dir, layout, Some("b1"))
    assert(IndexCommit.isBatchCommitted(dir, "b1"))
    val files = ls(dir)
    assert(files.contains("tail/part-0.parquet") &&
      files.contains("tail/part-1.parquet") &&
      files.contains("tail/k=1/part-2.parquet"))
    assert(files.contains("stats/new.parquet") && !files.contains("stats/old.parquet"))
    assert(!files.exists(_.startsWith("delta")) && !files.contains("_m"))
  }

  test("recover with marker present finishes the step; absent rolls it back") {
    val layout = IndexCommit.Layout("_m",
      staged = Seq("delta" -> "tail"), swaps = Seq("stats"))
    // crashed AFTER the marker: promote the remainder + token
    val a = tmp()
    put(a, "delta/part-1.parquet"); put(a, "stats_new/new.parquet")
    put(a, "stats/old.parquet"); put(a, "_m", "b9")
    IndexCommit.recover(a, Seq(layout))
    assert(IndexCommit.isBatchCommitted(a, "b9"))
    assert(ls(a).contains("tail/part-1.parquet") && ls(a).contains("stats/new.parquet"))
    // crashed BEFORE the marker: staged + _new are torn writes — dropped
    val b = tmp()
    put(b, "delta/part-1.parquet"); put(b, "stats_new/new.parquet")
    put(b, "stats/old.parquet")
    IndexCommit.recover(b, Seq(layout))
    assert(!IndexCommit.isBatchCommitted(b, "b9"))
    assert(ls(b) == Set("stats/old.parquet"))
    // swap died between its two renames (live gone, _old surviving)
    val c = tmp()
    put(c, "stats_old/old.parquet")
    IndexCommit.recover(c, Seq(layout))
    assert(ls(c) == Set("stats/old.parquet"))
  }

  test("recovery is idempotent to re-drive") {
    val dir = tmp()
    val layout = IndexCommit.Layout("_m", staged = Seq("delta" -> "tail"))
    put(dir, "delta/part-1.parquet"); put(dir, "_m", "b2")
    IndexCommit.recover(dir, Seq(layout))
    IndexCommit.recover(dir, Seq(layout))
    assert(ls(dir).contains("tail/part-1.parquet"))
    assert(IndexCommit.isBatchCommitted(dir, "b2"))
  }

  test("writer lease: a second concurrent writer throws loudly; the first survives") {
    val dir = tmp()
    @volatile var inner: Option[Throwable] = None
    IndexCommit.withWriterLease(dir) {
      // same-process contention arrives on another thread (FileLock is
      // per-JVM-per-file: overlap from any thread must fail loudly)
      val t = new Thread(() => {
        inner = Some(intercept[IllegalStateException] {
          IndexCommit.withWriterLease(dir) { fail("second writer must not enter") }
        })
      })
      t.start(); t.join()
      put(dir, "delta/part-1.parquet") // first writer's work is intact
    }
    assert(inner.exists(_.getMessage.contains("another writer holds")))
    assert(ls(dir).contains("delta/part-1.parquet"))
    // lease released: a later writer proceeds
    IndexCommit.withWriterLease(dir) { put(dir, "delta/part-2.parquet") }
    assert(ls(dir).contains("delta/part-2.parquet"))
  }

  test("batchId must be a plain token") {
    intercept[IllegalArgumentException] {
      IndexCommit.isBatchCommitted(tmp(), "../escape")
    }
  }
}
