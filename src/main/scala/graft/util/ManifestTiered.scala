package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import ManifestCommit.{DirEntry, Manifest}

/** The size-tiered LSM layout ([[TieredIndex]]'s policy) expressed
  * over [[ManifestCommit]]'s versioned manifests. One tiered table
  * `name` maps to three manifest tables:
  *
  *  - `name`       — the BASE: normally one dir holding a partitioned
  *    file tree (probes prune it statically, exactly like the rename
  *    layout's `<name>/`),
  *  - `name.l1`    — LEVEL-1 runs: one dir per minor fold, each a few
  *    FLAT files range-sorted on the probe keys (footer min/max
  *    pruning — see [[TieredIndex.layFlatSorted]]),
  *  - `name.tail`  — the flat level-0 tail: one small dir per append.
  *
  * Every maintenance step writes FRESH dirs and publishes ONE new
  * manifest, so append+compact touch disjoint paths and probes resolve
  * a consistent snapshot — the probe-during-compaction race the rename
  * protocol excludes by scheduling simply does not exist here.
  *
  * Tier masses ride the manifest (each [[DirEntry]] carries its row
  * count, recorded once at lay time), so the [[TieredIndex]] size
  * policy runs with ZERO Spark jobs — on an object store the
  * rename-protocol `rowSizes` was a LIST across a many-file base per
  * maintenance cycle.
  *
  * Operational contract: each append adds ONE tail dir and reads
  * union per-dir scans, so the compaction cadence bounds the probe's
  * scan count (the size policy folds the tail on every cycle with a
  * non-empty tail — at compact-every-K the union never exceeds
  * base + MaxL1Runs + K scans per table). An orchestrator that
  * appends forever without compacting degrades probe PLANNING cost
  * linearly — same as the rename tail's file count, and with the same
  * fix: run the compact arm on a cadence.
  */
object ManifestTiered {

  def l1Table(name: String): String = s"$name.l1"
  def tailTable(name: String): String = s"$name.tail"

  /** The reserved sequenced-id writer [[adoptRenameTiered]] seeds from
    * the highest carried rename-era `b<N>` drain token. Rename-era
    * drains committed free-form `b<batch>` ids, which the manifest
    * prunes once they age past the committed-retention window — after
    * which a very late replay of a pre-migration batch would read as
    * uncommitted and double-fold. Recording their high-water mark
    * under this writer makes the replay no-op at ANY age (sequenced
    * watermarks never prune). Sound because a streaming drain commits
    * its batches in order: batch N committed ⇒ every batch ≤ N of
    * that query committed (an index shared by several rename-era
    * drains had colliding `b<N>` tokens already — the defect the
    * checkpoint-derived writers fixed going forward).
    */
  val LegacyDrainWriter = "legacy-drain"

  /** Fail loudly on the silent-empty trap: a rename-protocol index
    * tree copied to an object store (or any dir that protocol
    * resolution maps to Manifest) with NO published manifest reads as
    * an EMPTY index — a probe would silently return zero rows over a
    * dir visibly full of data. If the resolved snapshot is
    * generation 0 but a legacy table dir exists, the tree is an
    * un-adopted rename layout: point the operator at index_migrate
    * instead of answering wrong.
    */
  def assertAdopted(conf: Configuration, indexDir: String,
                    m: Manifest, legacyProbe: String): Unit = {
    if (m.gen != 0L) return
    val p = new org.apache.hadoop.fs.Path(indexDir, legacyProbe)
    if (p.getFileSystem(conf).exists(p))
      throw new IllegalStateException(
        s"$indexDir resolves to the manifest commit protocol but has no " +
          s"published manifest, while a rename-layout table ('$legacyProbe') " +
          s"is present — this is a COPIED rename-protocol index that was " +
          s"never adopted. Probing it as-is would silently return empty " +
          s"results. Run JobRunner index_migrate (or the index's " +
          s"migrate*ToManifest API) once; after that every probe and " +
          s"maintenance step runs manifest-side.")
  }

  /** Base ∪ runs ∪ tail of one tiered table, pinned to the caller's
    * snapshot. The optional filter prunes the (partitioned) base
    * statically and the flat runs/tail via parquet footer stats —
    * callers must keep it to direct column predicates for the latter
    * to engage.
    */
  def read(spark: SparkSession, indexDir: String, m: Manifest, name: String,
           schema: StructType, filter: Option[Column] = None): DataFrame = {
    assertAdopted(spark.sessionState.newHadoopConf(), indexDir, m, name)
    def f(df: DataFrame) = filter.map(df.filter).getOrElse(df)
    f(ManifestCommit.readTable(spark, indexDir, m, name, schema))
      .unionByName(f(ManifestCommit.readTable(spark, indexDir, m, l1Table(name), schema)))
      .unionByName(f(ManifestCommit.readTable(spark, indexDir, m, tailTable(name), schema)))
  }

  /** Rows of the tail only (what a Minor fold rewrites). */
  def readTail(spark: SparkSession, indexDir: String, m: Manifest,
               name: String, schema: StructType): DataFrame =
    ManifestCommit.readTable(spark, indexDir, m, tailTable(name), schema)

  /** Rows of the level-1 + tail mass only (what a MergeRuns fold
    * rewrites — the base is deliberately not read).
    */
  def readAboveBase(spark: SparkSession, indexDir: String, m: Manifest,
                    name: String, schema: StructType): DataFrame =
    ManifestCommit.readTable(spark, indexDir, m, l1Table(name), schema)
      .unionByName(ManifestCommit.readTable(spark, indexDir, m, tailTable(name), schema))

  /** Tier masses straight off the manifest — no Spark counts. A -1
    * (unknown — a v1 manifest) only ever over-triggers compaction
    * toward Major, which is correct, just not lazy: treat as 0 base /
    * large delta is wrong either way, so map unknown to the
    * conservative "recount" via a real Spark count.
    */
  def sizes(spark: SparkSession, indexDir: String, m: Manifest, name: String,
            schema: StructType): TieredIndex.TierSizes = {
    assertAdopted(spark.sessionState.newHadoopConf(), indexDir, m, name)
    def mass(table: String): Long = m.rows(table) match {
      case -1L =>
        ManifestCommit.readTable(spark, indexDir, m, table, schema).count()
      case n => n
    }
    TieredIndex.TierSizes(
      base = mass(name), l1 = mass(l1Table(name)), tail = mass(tailTable(name)),
      runCount = m.entries(l1Table(name)).size)
  }

  /** Lay `rows` into a FRESH unpublished data dir of `table` and
    * return its manifest entry. Three write shapes:
    * `partitionBy` non-empty → the base's partition-dir tree (sorted
    * within partitions on `sortKeys`); empty with `sortKeys` → flat
    * run files range-sorted via [[TieredIndex.layFlatSorted]]
    * (`sizeHintRows` drives the file count — an upper bound is fine);
    * neither → a plain flat write (the tail-append shape: cheapest
    * possible lay, compaction owns the re-sort). The entry's row
    * count always comes from one metadata-only count over the freshly
    * written footers — exact, and what lets the size policy skip
    * Spark counts forever after.
    */
  def layDir(spark: SparkSession, indexDir: String, table: String,
             rows: DataFrame, partitionBy: Seq[String], sortKeys: Seq[Column],
             sizeHintRows: Long = -1L, rowsPerFile: Long = 4L * 1000 * 1000)
      : DirEntry = {
    val d = ManifestCommit.newDataDir(indexDir, table)
    val path = s"$indexDir/$d"
    if (partitionBy.nonEmpty)
      rows.repartition(partitionBy.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(sortKeys: _*)
        .write.mode("overwrite").partitionBy(partitionBy: _*).parquet(path)
    else if (sortKeys.nonEmpty)
      TieredIndex.layFlatSorted(rows, path, sortKeys,
        math.max(0L, sizeHintRows), rowsPerFile)
    else
      rows.write.mode("overwrite").parquet(path)
    // exact row count off the fresh footers, driver-side — the
    // Spark-job count was a fixed per-lay scheduling constant the
    // streaming drains paid twice per micro-batch; footer reads are
    // the same metadata, no job. Falls back to the distributed count
    // when the lay is wide (a Major-compacted base at corpus scale).
    val n = ParquetFooters
      .rowCount(spark.sessionState.newHadoopConf(), path)
      .getOrElse(spark.read.schema(rows.schema).parquet(path).count())
    DirEntry(d, n)
  }

  /** ZERO-COPY adoption of a rename-protocol index into the manifest
    * protocol — the local-to-object-store migration path (copy the
    * index tree with any tool, then adopt where it lands): the first
    * manifest references the rename layout's dirs IN PLACE (base
    * `name/`, level-1 runs `name_l1/run=K/`, tail `name_tail/`, plain
    * tables by dir name), so not one data byte is rewritten. From then
    * on every fold lays fresh dirs under `data/` and [[ManifestCommit
    * .vacuum]] GCs a legacy dir in the same pass that drops its last
    * referencing manifest. `committed/` batch tokens carry over as
    * free-form ids at the adoption generation (their retention window
    * restarts — sized far above any retry horizon).
    *
    * Caller contract: the rename side must be QUIESCED — no in-flight
    * maintenance. A leftover commit marker means a crashed step whose
    * staged artifacts recovery must finish or roll back first; this
    * fails loudly rather than adopt a half-published layout (unmarked
    * staging dirs, by contrast, are invisible garbage on both
    * protocols and are simply never referenced).
    */
  def adoptRenameTiered(spark: SparkSession, indexDir: String,
                        tiered: Seq[(String, StructType)],
                        plain: Seq[(String, StructType)],
                        markers: Seq[String] = Seq("_append_commit", "_compact_commit"))
      : Manifest = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(indexDir).getFileSystem(conf)
    require(!ManifestCommit.exists(conf, indexDir),
      s"$indexDir already runs the manifest protocol")
    markers.foreach { mk =>
      require(!fs.exists(new org.apache.hadoop.fs.Path(indexDir, mk)),
        s"$indexDir has an unfinished rename-protocol commit ($mk) — run " +
          s"the index's recovery (any maintenance open) before adopting")
    }
    def entry(rel: String, schema: StructType): Option[DirEntry] = {
      val p = new org.apache.hadoop.fs.Path(indexDir, rel)
      if (!fs.exists(p)) None
      else Some(DirEntry(rel,
        spark.read.schema(schema).parquet(p.toString).count())) // footer-only
    }
    def runRels(name: String): Seq[String] = {
      val d = new org.apache.hadoop.fs.Path(indexDir, s"${name}_l1")
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("run="))
        .sortBy(_.stripPrefix("run=").toLong)
        .map(r => s"${name}_l1/$r")
    }
    val tables: Map[String, Seq[DirEntry]] =
      tiered.flatMap { case (name, schema) =>
        Seq(
          name -> entry(name, schema).toSeq,
          l1Table(name) -> runRels(name).flatMap(entry(_, schema)),
          tailTable(name) -> entry(s"${name}_tail", schema).toSeq)
      }.toMap ++
        plain.flatMap { case (name, schema) =>
          entry(name, schema).map(e => name -> Seq(e))
        }.toMap
    // committed/ tokens carry over (free-form, committed "now") — and
    // the drain-token high-water mark ALSO seeds the reserved legacy
    // writer, so a pre-migration batch replay still no-ops after the
    // free-form window has pruned the b<N> ids themselves
    val committedDir = new org.apache.hadoop.fs.Path(indexDir, "committed")
    val carried: Seq[String] =
      if (!fs.exists(committedDir)) Nil
      else fs.listStatus(committedDir).toSeq.map(_.getPath.getName)
    val legacyDrainMax: Option[Long] = carried.flatMap { t =>
      if (t.startsWith("b")) t.stripPrefix("b").toLongOption else None
    }.maxOption
    ManifestCommit.publish(conf, indexDir, m => m.copy(
      tables = tables,
      committed = carried.map(_ -> (m.gen + 1)).toMap,
      writers = legacyDrainMax.map(LegacyDrainWriter -> _).toMap,
      floor = 0L))
  }

  /** One tiered table's fold parameters for [[compactTables]]:
    * `refold` re-aggregates the folded mass (the widths sidecar's
    * sum/min — identity for plain tables); run files are flat-sorted
    * on `runSortKeys`, a Major's base partition-dir tree sorts within
    * partitions on `baseSortKeys`.
    */
  final case class FoldSpec(name: String, schema: StructType,
                            basePartitionBy: Seq[String],
                            baseSortKeys: Seq[Column],
                            runSortKeys: Seq[Column],
                            runRowsPerFile: Long,
                            refold: DataFrame => DataFrame = identity)

  /** The ONE size-tiered manifest compaction driver all three indexes
    * share (the rename protocol keeps per-index bodies because its
    * staging paths and markers differ; here the shape is fully
    * uniform): the FIRST spec is the dominant table and decides the
    * action; every table folds the SAME action, and all new dirs land
    * in ONE publish — sidecars can never commit to a different tier
    * state than their main table.
    */
  def compactTables(spark: SparkSession, indexDir: String,
                    specs: Seq[FoldSpec]): Unit = {
    require(specs.nonEmpty)
    val conf = spark.sessionState.newHadoopConf()
    val m = ManifestCommit.current(conf, indexDir)
    val szs = sizes(spark, indexDir, m, specs.head.name, specs.head.schema)
    val action = TieredIndex.plan(szs)
    if (action == TieredIndex.NoOp) return
    def fold(spec: FoldSpec): ManifestCommit.DirEntry = {
      val (rows0, mass) = action match {
        case TieredIndex.Minor(_) =>
          (readTail(spark, indexDir, m, spec.name, spec.schema), szs.tail)
        case TieredIndex.MergeRuns =>
          (readAboveBase(spark, indexDir, m, spec.name, spec.schema),
            szs.l1 + szs.tail)
        case _ =>
          (read(spark, indexDir, m, spec.name, spec.schema),
            szs.base + szs.l1 + szs.tail)
      }
      val rows = spec.refold(rows0)
      action match {
        case TieredIndex.Major =>
          layDir(spark, indexDir, spec.name, rows,
            partitionBy = spec.basePartitionBy, sortKeys = spec.baseSortKeys)
        case _ =>
          layDir(spark, indexDir, l1Table(spec.name), rows,
            partitionBy = Nil, sortKeys = spec.runSortKeys,
            sizeHintRows = mass, rowsPerFile = spec.runRowsPerFile)
      }
    }
    // per-table folds are independent (disjoint tables, fresh dirs,
    // one publish below) — overlap their jobs from driver threads
    // (§2.6): the widths sidecar's fold rides the bands fold's wall
    val laid = specs.zip(
      DriverPar.inParallel(spark.sparkContext)(specs.map(s => () => fold(s))))
    ManifestCommit.publishAt(conf, indexDir, m, mm =>
      laid.foldLeft(mm) { case (acc, (s, e)) =>
        foldUpdate(acc, s.name, action, e)
      }); ()
  }

  /** Delete an old RENAME-protocol layout AFTER a manifest-protocol
    * REBUILD into the same dir published (Auto now resolves manifest,
    * so this is the protocol-crossing rebuild path): the fresh
    * manifest replaces every table, which makes the rename tree —
    * `<t>/`, `<t>_l1/`, `<t>_tail/`, `<t>_delta/` staging,
    * `committed/` tokens, commit markers — unreachable garbage no
    * vacuum pass would ever see (only manifest-referenced dirs and
    * `data/` are in vacuum's universe).
    *
    * Call ONLY after the rebuild's first publish succeeds: until the
    * manifest lands, readers still resolve the rename protocol and
    * keep serving the OLD index off this very tree — deleting it first
    * left a crash window (delete → crash → no readable index at all)
    * where deleting late is equally correct and crash-safe (a crash
    * between the publish and this call leaks the tree; the next
    * rebuild's own post-publish call collects it). Dirs a retained
    * manifest still REFERENCES (a zero-copy adopted index's legacy
    * dirs) are never touched — those are live data and belong to
    * vacuum's legacy-GC arm.
    */
  def clearRenameLayout(conf: Configuration, indexDir: String,
                        tables: Seq[String],
                        markers: Seq[String] = Seq("_append_commit", "_compact_commit"))
      : Unit = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return
    val referenced = ManifestCommit.referencedDirs(conf, indexDir)
    val rels = tables.flatMap(t =>
      Seq(t, s"${t}_l1", s"${t}_tail", s"${t}_delta", s"${t}_l1_delta",
        s"${t}_new", s"${t}_l1_new", s"${t}_tail_new")) ++
      Seq("committed") ++ markers
    rels.foreach { rel =>
      val live = referenced.exists(r => r == rel || r.startsWith(s"$rel/"))
      val p = new org.apache.hadoop.fs.Path(root, rel)
      if (!live && fs.exists(p)) { fs.delete(p, true); () }
    }
  }

  /** BENCH-HARNESS time travel — NOT a production operation
    * (production never deletes a published manifest): drop every
    * generation above `gen` and vacuum to the restored snapshot, so a
    * repeated bench invocation measures one REAL fold each time
    * instead of a NoOp re-probe. O(fold output).
    */
  def benchRewind(conf: Configuration, indexDir: String, gen: Long): Unit = {
    val mdir = new org.apache.hadoop.fs.Path(indexDir, "_manifests")
    val f = mdir.getFileSystem(conf)
    if (f.exists(mdir)) f.listStatus(mdir).foreach { st =>
      st.getPath.getName.stripPrefix("m").toLongOption.foreach { g =>
        if (g > gen) { f.delete(st.getPath, false); () }
      }
    }
    // 60s grace: a CONCURRENT invocation of the same registered query
    // (parallel test suites) may still be reading the dirs of the
    // generations just dropped — its resolved Manifest lives in memory,
    // so leaving young data dirs in place keeps that reader whole; the
    // next rewind past the grace window collects them (bounded: one
    // fold output per invocation)
    ManifestCommit.vacuum(conf, indexDir, keepGens = 1, graceMs = 60000L)
  }

  /** The manifest update for one tiered table's compaction fold:
    * Minor adds a run and empties the tail; MergeRuns replaces the
    * runs with one and empties the tail; Major replaces the base and
    * empties both.
    */
  def foldUpdate(m: Manifest, name: String, action: TieredIndex.CompactAction,
                 newDir: DirEntry): Manifest = action match {
    case TieredIndex.Minor(_) =>
      ManifestCommit.setDirs(
        ManifestCommit.addDir(m, l1Table(name), newDir.dir, newDir.rows),
        tailTable(name), Nil)
    case TieredIndex.MergeRuns =>
      ManifestCommit.setDirs(
        ManifestCommit.setDirs(m, l1Table(name), Seq(newDir)),
        tailTable(name), Nil)
    case TieredIndex.Major =>
      ManifestCommit.setDirs(
        ManifestCommit.setDirs(
          ManifestCommit.setDirs(m, name, Seq(newDir)),
          l1Table(name), Nil),
        tailTable(name), Nil)
    case TieredIndex.NoOp => m
  }
}

/** Which commit protocol a persisted index runs on. The RENAME
  * protocol (atomic same-FS renames + OS file locks — local-FS only)
  * is RETIRED as a build/maintenance target: [[ManifestCommit]]'s
  * versioned manifests need only fresh-file create + delete, run
  * anywhere (the object-store deployment the reference targets), and
  * measured perf-equal at every depth (SCALE.md) — so every build
  * resolves Manifest, and `Rename` survives only as (a) the DETECTED
  * protocol of a legacy index dir ([[ofIndex]]), whose one legal
  * operation is zero-copy adoption ([[ManifestTiered
  * .adoptRenameTiered]] / JobRunner index_migrate), and (b) a refused
  * build request with that pointer.
  */
sealed trait CommitProtocol
object CommitProtocol {
  /** Resolves [[Manifest]] at build time (see [[forBuild]]); an
    * EXISTING index still dispatches off its own layout ([[ofIndex]]).
    */
  case object Auto extends CommitProtocol
  /** Retired. A legacy rename-protocol index resolves this from
    * [[ofIndex]]; requesting it for a build throws in [[forBuild]].
    */
  case object Rename extends CommitProtocol
  case object Manifest extends CommitProtocol

  private def isLocal(conf: Configuration, dir: String): Boolean = {
    val scheme = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf).getUri.getScheme
    scheme == null || scheme == "file"
  }

  /** Resolve the protocol to BUILD (or rebuild) an index with: always
    * [[Manifest]] — a `Rename` request is refused (the rename
    * maintenance bodies are retired; the protocols were proven
    * bit-identical and perf-equal before retirement, SCALE.md). A
    * rebuild over an old rename tree is a REBUILD: the new manifest
    * replaces the index, and the save's [[ManifestTiered
    * .clearRenameLayout]] call deletes the then-unreachable rename
    * tree after the publish (to KEEP a rename index's bytes, migrate
    * with adoptRenameTiered / index_migrate instead of rebuilding).
    * Resolving also proves the store PUBLISHABLE
    * (ManifestCommit.assertPublishable) — a store with no atomic
    * create-no-overwrite story fails here, before any data is laid.
    */
  def forBuild(conf: Configuration, dir: String,
               chosen: CommitProtocol): CommitProtocol = {
    chosen match {
      case Rename => throw new IllegalArgumentException(
        s"the rename commit protocol is retired: index builds run the " +
          s"versioned-manifest protocol everywhere (proven bit-identical " +
          s"and perf-equal before retirement). Build $dir with " +
          s"protocol=Auto or Manifest; to keep an EXISTING rename " +
          s"index's bytes, adopt it zero-copy with JobRunner " +
          s"index_migrate (or the index's migrate*ToManifest API).")
      case _ => ()
    }
    ManifestCommit.assertPublishable(conf, dir)
    Manifest
  }

  /** The protocol an EXISTING index at `dir` runs on: the `_manifests`
    * dir is the marker a manifest-protocol build always creates (its
    * first publish writes there); without one, a local dir is a legacy
    * rename-protocol index and a non-local dir can only legally hold a
    * manifest one (the rename protocol never built there).
    */
  def ofIndex(conf: Configuration, dir: String): CommitProtocol =
    if (ManifestCommit.exists(conf, dir)) Manifest
    else if (isLocal(conf, dir)) Rename
    else Manifest

  /** Every probe/maintenance entry point's gate: the index at `dir`
    * must run the manifest protocol. A legacy rename index fails
    * loudly with the one supported path — zero-copy adoption — instead
    * of running the retired rename arms (and instead of resolving the
    * manifest protocol over a manifest-less tree, which would silently
    * read an EMPTY index).
    */
  def requireManifest(conf: Configuration, dir: String, what: String): Unit =
    if (ofIndex(conf, dir) != Manifest)
      throw new IllegalStateException(
        s"$what: the index at $dir runs the RETIRED rename commit " +
          s"protocol (no _manifests dir on a local filesystem). Adopt it " +
          s"onto the manifest protocol zero-copy — JobRunner " +
          s"index_migrate (or the index's migrate*ToManifest API), a " +
          s"one-time metadata-only step — after which every probe and " +
          s"maintenance verb runs manifest-side.")
}
