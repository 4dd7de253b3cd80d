package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The OBJECT-STORE-SAFE commit protocol for persisted indexes — the
  * versioned-manifest alternative to [[IndexCommit]]'s rename-based
  * protocol (which is local-FS-only by design: atomic same-FS renames
  * + OS file locks do not exist on S3-class stores, and the
  * reference's own deployment story is an object store).
  *
  * Invariants, in place of renames:
  *
  *  - DATA PATHS ARE NEVER RENAMED OR OVERWRITTEN. A writer lays new
  *    rows under a fresh uniquely-named dir ([[newDataDir]]) and
  *    publishes by writing ONE new manifest file naming, per table,
  *    the complete live dir set. Append = old dirs + the new one;
  *    compaction/replace = a brand-new list. Either way the publish
  *    is a single-file decision point.
  *  - Manifests are numbered `_manifests/m<gen>` with gen strictly
  *    increasing, created with create-NO-overwrite — the put-if-absent
  *    every store offers (HDFS atomic create, S3 conditional PUT
  *    If-None-Match, GCS precondition). Two racing writers cannot
  *    both win a generation: the loser's create fails LOUDLY. This
  *    replaces the OS-file-lock lease (advisory locks don't exist on
  *    object stores).
  *  - Readers resolve the HIGHEST COMPLETE manifest and read exactly
  *    its dir set — a consistent snapshot with no torn-window reads:
  *    a concurrent publish only adds a new manifest file, and
  *    superseded dirs stay on disk until [[vacuum]], so a reader that
  *    resolved gen k keeps reading gen k's files even while gen k+1
  *    lands. This gives probe-during-compaction SNAPSHOT ISOLATION
  *    for free — the race the rename protocol must exclude by
  *    scheduling (a probe between two dir swaps double-counts; see
  *    compactMinHashIndex's scheduling note).
  *  - Torn manifest writes are INVISIBLE, not fatal: the writer
  *    streams a `end=<line-count>` terminator as the last line and
  *    readers skip any manifest whose terminator is absent or wrong —
  *    no rename-into-place needed to make the publish atomic, so the
  *    protocol holds even on stores where a crashed PUT could leave a
  *    visible partial object.
  *  - Exactly-once folds ride the manifest itself: the committed
  *    batch-id set is part of the published state, so a retried batch
  *    checks [[isBatchCommitted]] against the same snapshot it would
  *    append to (no separate token files whose visibility could lag
  *    the data's).
  *  - Crash recovery is a NO-OP by construction: a writer that died
  *    before its manifest landed left only unreferenced data dirs
  *    (invisible to every reader); [[vacuum]] garbage-collects them
  *    along with superseded generations.
  *
  * All IO goes through the Hadoop FileSystem API, so the same code
  * runs on file:, hdfs:, s3a:, etc. The spec exercises it with
  * rename-free assertions on the local FS.
  */
object ManifestCommit {

  /** One published index state: per-table live data dirs (relative to
    * the index dir) and the committed batch-id set.
    */
  final case class Manifest(gen: Long,
                            tables: Map[String, Seq[String]],
                            committed: Set[String]) {
    def table(name: String): Seq[String] = tables.getOrElse(name, Nil)
  }

  val Empty: Manifest = Manifest(0L, Map.empty, Set.empty)

  private def manifestsDir(indexDir: String) = new Path(indexDir, "_manifests")

  private def fs(conf: Configuration, indexDir: String): FileSystem =
    new Path(indexDir).getFileSystem(conf)

  private def requireToken(s: String, what: String): String = {
    require(s.nonEmpty && s.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"$what must be a plain token, got '$s'")
    s
  }

  /** Serialized line format (no JSON dependency, trivially greppable):
    * `gen=N`, `committed=b1,b2`, one `table=name:dir1,dir2` per table,
    * then the completeness terminator `end=<total line count>`.
    */
  private def encode(m: Manifest): String = {
    val body = Seq(s"gen=${m.gen}",
      s"committed=${m.committed.toSeq.sorted.mkString(",")}") ++
      m.tables.toSeq.sortBy(_._1).map { case (t, dirs) =>
        s"table=$t:${dirs.mkString(",")}"
      }
    (body :+ s"end=${body.size + 1}").mkString("\n")
  }

  /** None for a torn/incomplete file (terminator absent or wrong) —
    * the reader-side half of publish atomicity.
    */
  private[util] def decode(text: String): Option[Manifest] = {
    val lines = text.split("\n", -1).toSeq.filter(_.nonEmpty)
    val kv = lines.map(_.split("=", 2)).collect {
      case Array(k, v) => (k, v)
    }
    val end = kv.collectFirst { case ("end", v) => v }
    if (!end.exists(v => v.toLongOption.contains(lines.size.toLong))) return None
    for {
      gen <- kv.collectFirst { case ("gen", v) => v }.flatMap(_.toLongOption)
    } yield Manifest(
      gen,
      kv.collect { case ("table", v) =>
        val Array(name, dirs) = v.split(":", 2)
        name -> dirs.split(",").toSeq.filter(_.nonEmpty)
      }.toMap,
      kv.collectFirst { case ("committed", v) =>
        v.split(",").toSet.filter(_.nonEmpty)
      }.getOrElse(Set.empty))
  }

  private def readManifestFile(f: FileSystem, p: Path): Option[Manifest] = {
    val in = f.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    decode(text)
  }

  /** Every manifest generation present on disk, newest first — names
    * only (one LIST, no reads). Shared by the reader resolve, the
    * publish CAS guard, and vacuum — all three must agree on what
    * exists; each decodes only the files it actually needs (readers
    * stop at the first complete one), keeping the common resolve at
    * one LIST + one GET on an object store.
    */
  private def listGens(f: FileSystem, indexDir: String): Seq[(Long, Path)] = {
    val dir = manifestsDir(indexDir)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).toSeq
      .map(_.getPath)
      .flatMap(p => p.getName.stripPrefix("m").toLongOption
        .filter(_ => p.getName.startsWith("m")).map(g => (g, p)))
      .sortBy(-_._1)
  }

  /** Resolve the newest COMPLETE manifest — the reader's snapshot.
    * Torn files (a crashed publish) and non-manifest names are
    * skipped; an index with no manifests reads as [[Empty]].
    */
  def current(conf: Configuration, indexDir: String): Manifest = {
    val f = fs(conf, indexDir)
    listGens(f, indexDir).iterator
      .flatMap { case (_, p) => readManifestFile(f, p) }
      .nextOption().getOrElse(Empty)
  }

  def isBatchCommitted(conf: Configuration, indexDir: String,
                       batchId: String): Boolean =
    current(conf, indexDir).committed.contains(requireToken(batchId, "batchId"))

  /** A fresh never-published data dir for `table` — unique name, so
    * concurrent/crashed writers can never collide on a data path and
    * an unpublished dir is garbage, not corruption.
    */
  def newDataDir(indexDir: String, table: String): String = {
    requireToken(table, "table")
    s"data/$table/d-${java.util.UUID.randomUUID().toString.take(12)}"
  }

  private def contention(indexDir: String, gen: Long) = new IllegalStateException(
    s"concurrent manifest publish on index $indexDir: generation $gen " +
      s"already exists. Index maintenance is single-writer; a second " +
      s"writer lost the create-no-overwrite race (the object-store " +
      s"analogue of the writer lease). Re-resolve the current manifest " +
      s"and retry, or serialize maintenance (one orchestrator per index).")

  /** Publish the next generation on top of the current snapshot —
    * resolve-then-[[publishAt]] in one call.
    */
  def publish(conf: Configuration, indexDir: String,
              update: Manifest => Manifest,
              batchId: Option[String] = None): Manifest =
    publishAt(conf, indexDir, current(conf, indexDir), update, batchId)

  /** Publish generation `base.gen + 1`: apply `update` to the caller's
    * resolved snapshot (add dirs for an append, replace a table's list
    * for a compaction), record the optional batch id, and write
    * `_manifests/m<gen+1>` with create-NO-overwrite — the explicit
    * compare-and-swap: if ANY other writer published after `base` was
    * resolved (or a crashed publish left even a torn object on the
    * target generation), the create fails and this throws
    * [[IllegalStateException]] — fail-loudly single-writer
    * arbitration, no advisory locks needed. A batch id already
    * committed in `base` makes the whole publish a NO-OP (returns
    * `base` unchanged) — the exactly-once retry contract.
    */
  def publishAt(conf: Configuration, indexDir: String, base: Manifest,
                update: Manifest => Manifest,
                batchId: Option[String] = None): Manifest = {
    batchId.foreach(requireToken(_, "batchId"))
    val cur = base
    if (batchId.exists(cur.committed.contains)) return cur
    val next0 = update(cur)
    val next = next0.copy(gen = cur.gen + 1,
      committed = cur.committed ++ batchId)
    val f = fs(conf, indexDir)
    f.mkdirs(manifestsDir(indexDir))
    // stale-snapshot guard: the target generation must be STRICTLY
    // above every generation on disk (complete or torn). Without it,
    // a writer holding a snapshot from before a vacuum could re-claim
    // a vacuumed generation NUMBER: its create would succeed, but
    // readers resolve the highest gen, so the "published" manifest
    // would never become current — a silent lost update through the
    // very mechanism that is supposed to fail loudly.
    val existing = listGens(f, indexDir)
    if (existing.headOption.exists(_._1 >= next.gen)) {
      // one self-heal: if the occupant of OUR target gen is a TORN
      // object (a crashed publish — unreadable to every reader by
      // construction) and nothing newer exists, clear it and take the
      // slot. Safe under the single-writer contract (a torn object's
      // writer is dead; object stores never expose in-progress PUTs),
      // and without it a torn top manifest would wedge every future
      // publish forever — the retry re-resolves the same base and
      // collides with the same dead object.
      val (topGen, topPath) = existing.head
      if (topGen == next.gen && readManifestFile(f, topPath).isEmpty)
        { f.delete(topPath, false); () }
      else throw contention(indexDir, next.gen)
    }
    val p = new Path(manifestsDir(indexDir), s"m${next.gen}")
    val out =
      try f.create(p, /*overwrite=*/ false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw contention(indexDir, next.gen)
        case _: java.io.IOException if f.exists(p) =>
          throw contention(indexDir, next.gen)
      }
    try out.write(encode(next).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    next
  }

  /** Read one manifested table as a DataFrame — the union of its live
    * dirs' parquet, schema-read so an empty table (or empty index)
    * loads as empty. The frame is pinned to the SNAPSHOT the caller
    * resolved: a concurrent publish or compaction does not disturb it.
    */
  def readTable(spark: SparkSession, indexDir: String, m: Manifest,
                table: String, schema: StructType): DataFrame = {
    val dirs = m.table(table).map(d => s"$indexDir/$d")
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** Garbage-collect: delete data dirs referenced by NO manifest in
    * the newest `keepGens` generations (crashed writers' orphans and
    * compaction-superseded dirs) and manifests older than that window.
    * `keepGens` ≥ 1 keeps the current snapshot; a deployment sizes the
    * window to its longest-running reader, which keeps resolving its
    * (retained) snapshot mid-vacuum — the snapshot-isolation story.
    */
  def vacuum(conf: Configuration, indexDir: String, keepGens: Int = 2): Unit = {
    require(keepGens >= 1, "vacuum must keep at least the current generation")
    val f = fs(conf, indexDir)
    // newest first, decoded (vacuum genuinely needs the contents)
    val all = listGens(f, indexDir)
      .map { case (g, p) => (g, p, readManifestFile(f, p)) }
    // kept = the newest keepGens COMPLETE manifests. Torn files do NOT
    // count toward the window: a torn newest manifest references
    // nothing, and counting it once deleted every dir the real current
    // snapshot referenced — total index loss from the crash state the
    // protocol promises to tolerate.
    val kept = all.filter(_._3.isDefined).take(keepGens)
    if (kept.isEmpty) return // nothing complete: nothing is safely known garbage
    val live: Set[String] =
      kept.flatMap(_._3).flatMap(_.tables.values.flatten).toSet
    // data dirs live under data/<table>/<dir>
    val dataRoot = new Path(indexDir, "data")
    if (f.exists(dataRoot)) {
      f.listStatus(dataRoot).foreach { t =>
        f.listStatus(t.getPath).foreach { d =>
          val rel = s"data/${t.getPath.getName}/${d.getPath.getName}"
          if (!live.contains(rel)) { f.delete(d.getPath, true); () }
        }
      }
    }
    // drop only manifests OLDER than the oldest kept complete gen —
    // never a newer torn object (publishAt's CAS self-heal owns that;
    // deleting it here could race the in-flight write that file IS on
    // a filesystem where partial writes are visible)
    val floor = kept.last._1
    all.filter(_._1 < floor).foreach { case (_, p, _) => f.delete(p, false); () }
  }
}
