package graft.util

import java.nio.file.{Files, Path, Paths}

/** THE commit protocol for persisted-index maintenance — one
  * implementation shared by all three indexes (dedup/Dedup's MinHash
  * bands, text/InvertedIndex's BM25 postings, vector/VectorOps' IVF
  * inverted lists) instead of a hand-rolled copy per index. The copies
  * drifted exactly the way duplication invites: the IVF add shipped
  * without crash-idempotence while its two siblings had it.
  *
  * A maintenance step publishes two kinds of changes, both prepared
  * COMPLETELY before a single atomic decision point (the marker file):
  *
  *  - staged promotes: part-files written under a staging dir move into
  *    a live dir (append-shaped changes — delta rows landing in a tail).
  *    File moves are same-FS renames and idempotent to re-drive: a file
  *    is either still staged or already live, so crash recovery moves
  *    exactly the remainder.
  *  - dir swaps: `${name}_new` replaces the live `name` wholesale
  *    (rewrite-shaped changes — a compaction's re-laid base, a re-
  *    aggregated stats table), via the rename-aside pair in
  *    [[FileTrees.swapLive]].
  *
  * The marker file appears ATOMICALLY (tmp + ATOMIC_MOVE) and carries
  * the batch id, so recovery can finish the `committed/<batchId>` token
  * too; the token makes a re-driven batch a no-op — the foreachBatch
  * exactly-once recipe the durable streaming sinks use. Marker present →
  * every staged/`_new` artifact was complete, recovery PROMOTES the
  * remainder; marker absent → staged dirs and `_new` dirs are untrusted
  * torn writes and are dropped, with live dirs restored from `_old`.
  *
  * Single-writer is ENFORCED, not documented: every mutating step runs
  * under [[withWriterLease]], an OS file lock on `_writer_lease` inside
  * the index dir. A second concurrent writer (a CLI update racing a
  * streaming drain on the same index) fails loudly instead of silently
  * overwriting the first writer's staged delta through the fixed
  * staging paths. The lock is released by the OS on process death, so a
  * crashed writer never deadlocks the index (no stale lease files to
  * break); a probe takes no lease — reads stay lock-free.
  *
  * Local-filesystem by design (same-FS atomic renames + OS file locks);
  * [[assertRenameCommitFs]] fails fast when an index dir resolves to a
  * non-local Hadoop filesystem instead of half-writing a mixed state —
  * the object-store deployment uses [[ManifestCommit]]'s versioned-
  * manifest protocol (no renames on data paths) instead.
  */
object IndexCommit {

  /** What one maintenance step changes, all paths relative to the index
    * dir. `staged` = (stagingDir, liveDir) promote pairs; `swaps` = dir
    * names replaced from `${name}_new`. Recovery takes the UNION layout
    * of every step that shares a marker name and acts only on the
    * artifacts that exist, so one recovery pass serves an index whose
    * append and compact steps publish different subsets.
    */
  final case class Layout(marker: String,
                          staged: Seq[(String, String)] = Nil,
                          swaps: Seq[String] = Nil)

  private val LeaseName = "_writer_lease"

  private def contention(indexDir: String) = new IllegalStateException(
    s"another writer holds the maintenance lease on index $indexDir " +
      s"($LeaseName is locked). Index maintenance is single-writer: a " +
      s"concurrent append/compact would silently overwrite this writer's " +
      s"staged delta. Serialize maintenance (one orchestrator per index) " +
      s"and retry; probes are read-only and take no lease.")

  /** Run `body` holding the index's exclusive writer lease; throws
    * loudly if another process (or another thread of this one) holds
    * it. NOT reentrant — public maintenance entry points acquire once
    * and call lease-free internals.
    */
  def withWriterLease[A](indexDir: String)(body: => A): A = {
    val p = Paths.get(indexDir, LeaseName)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val ch = java.nio.channels.FileChannel.open(p,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock =
      try ch.tryLock()
      catch {
        case _: java.nio.channels.OverlappingFileLockException =>
          ch.close(); throw contention(indexDir)
      }
    if (lock == null) { ch.close(); throw contention(indexDir) }
    try body
    finally { lock.release(); ch.close() }
  }

  /** Fail fast when `indexDir` does not resolve to a local filesystem:
    * this protocol mixes Spark parquet IO with java.nio markers and
    * renames, so an HDFS/S3 index dir would write its deltas remotely
    * and then no-op (or corrupt) the local-path commit steps — a
    * confusing mixed state instead of a clean error. Object-store
    * deployments use [[ManifestCommit]].
    */
  def assertRenameCommitFs(hadoopConf: org.apache.hadoop.conf.Configuration,
                           indexDir: String, what: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val scheme = p.getFileSystem(hadoopConf).getUri.getScheme
    if (scheme != null && scheme != "file")
      throw new IllegalArgumentException(
        s"$what uses the local-FS rename commit protocol but $indexDir " +
          s"resolves to scheme '$scheme'. Atomic same-FS renames and OS " +
          s"file locks do not exist there; use the versioned-manifest " +
          s"protocol (graft.util.ManifestCommit) for object stores.")
  }

  def committedToken(indexDir: String, batchId: String): Path = {
    require(batchId.nonEmpty && batchId.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"batchId must be a plain token, got '$batchId'")
    Paths.get(indexDir, "committed", batchId)
  }

  /** True iff `batchId` was already folded in — the caller must treat
    * the whole maintenance step as a completed no-op. The token files
    * accumulate one per batch for the index's lifetime (exact replay
    * detection at any age, at one empty inode each) — fine at this
    * protocol's local/dev cadence; a 24/7 deployment belongs on
    * [[ManifestCommit]], whose committed state is bounded by
    * construction (writer~seq watermarks + a windowed free-form set).
    */
  def isBatchCommitted(indexDir: String, batchId: String): Boolean =
    Files.exists(committedToken(indexDir, batchId))

  /** Publish a fully-prepared step: the caller has already written every
    * staging dir and every `${name}_new`. The marker (with the batch-id
    * payload) is the single atomic decision point; everything after it
    * is re-driveable by [[recover]].
    */
  def commit(indexDir: String, layout: Layout,
             batchId: Option[String] = None): Unit = {
    // the marker must appear ATOMICALLY with its payload: a crash
    // mid-write would otherwise leave a committed-looking marker with a
    // truncated id, and recovery would promote the rows but never
    // record the token — the retry then double-appends
    val tmp = Paths.get(indexDir, layout.marker + ".tmp")
    Files.write(tmp, batchId.getOrElse("")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(indexDir, layout.marker),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    finish(indexDir, layout, batchId)
  }

  /** The post-marker half: promote staged remainders, finish swaps,
    * record the token, clear the marker. Idempotent — recovery re-drives
    * it from any intermediate crash state.
    */
  private def finish(indexDir: String, layout: Layout,
                     batchId: Option[String]): Unit = {
    layout.staged.foreach { case (stagingName, liveName) =>
      FileTrees.promoteStaged(
        Paths.get(indexDir, stagingName), Paths.get(indexDir, liveName))
    }
    layout.swaps.foreach { name =>
      val dir = Paths.get(indexDir)
      if (Files.exists(dir.resolve(s"${name}_new")))
        FileTrees.swapLive(dir, name)
      else if (!Files.exists(dir.resolve(name)) &&
               Files.exists(dir.resolve(s"${name}_old")))
        // a swap died between its two renames: _new already moved live,
        // then live→? no — _new became live, _old awaits deletion; or
        // live moved aside before _new landed: restore it
        { Files.move(dir.resolve(s"${name}_old"), dir.resolve(name)); () }
      FileTrees.rmTree(dir.resolve(s"${name}_old"))
    }
    batchId.foreach { bid =>
      val tok = committedToken(indexDir, bid)
      Files.createDirectories(tok.getParent)
      Files.write(tok, Array.emptyByteArray); ()
    }
    Files.deleteIfExists(Paths.get(indexDir, layout.marker)); ()
  }

  /** Remove every maintenance artifact a REBUILD must not inherit from
    * the previous generation, derived from the index's own layouts
    * rather than a hand-kept list per index (the duplication-drift
    * failure mode this module exists to end — a tier dir added to a
    * Layout but missed in a hand list would make rebuilds silently
    * inherit stale tail rows or committed tokens): every staging dir
    * and its promote target (tails, level-1 runs), every swap's
    * `_new`/`_old` temp, the `committed/` tokens (a surviving token
    * would silently no-op a new ingest that reuses a batch id), and
    * the markers. Swap names themselves (the live base tables) are NOT
    * removed — the rebuild overwrites them.
    */
  def clearMaintenanceState(indexDir: String, layouts: Seq[Layout]): Unit = {
    val dirs = layouts.flatMap(l =>
      l.staged.flatMap { case (staging, live) => Seq(staging, live) } ++
        l.swaps.flatMap(n => Seq(s"${n}_new", s"${n}_old"))).distinct :+ "committed"
    dirs.foreach(n => FileTrees.rmTree(Paths.get(indexDir, n)))
    layouts.map(_.marker).distinct
      .foreach(m => Files.deleteIfExists(Paths.get(indexDir, m)))
  }

  /** Probe-side self-heal for MARKED commits. A writer that dies
    * between a layout's marker and its last dir swap can leave a live
    * dir transiently missing (mid-[[FileTrees.swapLive]]: the old dir
    * moved aside, the new one not yet in place) — the one crash state
    * a READ-ONLY consumer can observe as an error rather than as
    * old-or-new rows, and without healing every probe fails until the
    * next maintenance open runs recovery (hours of query outage in a
    * probe-heavy, nightly-fold deployment). Marker present + lease
    * ACQUIRABLE ⇒ the writer is dead and every published artifact is
    * complete, so FINISHING the commit is the documented recovery and
    * is safe from any process; lease held ⇒ a live writer is
    * mid-commit and will finish in moments — do nothing. Marker
    * absent ⇒ nothing runs: unmarked staging is NEVER touched from a
    * probe (dropping a live writer's staged delta was the hazard that
    * made probes read-only in the first place).
    */
  def healMarkedCommit(indexDir: String, layouts: Seq[Layout]): Unit =
    if (layouts.exists(l => Files.exists(Paths.get(indexDir, l.marker))))
      try withWriterLease(indexDir)(recover(indexDir, layouts))
      catch { case _: IllegalStateException => () } // live writer owns it

  /** Finish (or roll back) any maintenance step interrupted mid-flight;
    * called on every index open under the writer lease. At most one
    * marker exists (the lease serializes writers), but each layout is
    * checked independently so an index family can keep distinct marker
    * names for its append and compact arms.
    */
  def recover(indexDir: String, layouts: Seq[Layout]): Unit =
    layouts.foreach { layout =>
      // a leftover marker .tmp is a torn pre-commit write
      Files.deleteIfExists(Paths.get(indexDir, layout.marker + ".tmp"))
      val m = Paths.get(indexDir, layout.marker)
      if (Files.exists(m)) {
        val bid = new String(Files.readAllBytes(m),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finish(indexDir, layout, if (bid.isEmpty) None else Some(bid))
      } else {
        layout.staged.foreach { case (stagingName, _) =>
          FileTrees.rmTree(Paths.get(indexDir, stagingName))
        }
        layout.swaps.foreach { name =>
          val dir = Paths.get(indexDir)
          FileTrees.rmTree(dir.resolve(s"${name}_new"))
          if (!Files.exists(dir.resolve(name)) &&
              Files.exists(dir.resolve(s"${name}_old")))
            { Files.move(dir.resolve(s"${name}_old"), dir.resolve(name)); () }
          FileTrees.rmTree(dir.resolve(s"${name}_old"))
        }
      }
    }
}
