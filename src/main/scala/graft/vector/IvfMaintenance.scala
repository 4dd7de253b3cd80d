package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

import graft.util.{IndexCommit, TieredIndex}

/** Maintenance protocol for the persisted IVF-family indexes — the flat
  * IVF layout ([[VectorOps.saveIvfIndex]]: `vectors/` + `centroids/`)
  * and its IVF-PQ superset ([[PqOps.savePqIndex]]: + `codes/` +
  * `codebooks/`). One module because the two layouts share every
  * maintained table: `codes/` is simply absent from the flat flavor,
  * and both [[IndexCommit]] recovery and [[TieredIndex]] policy act
  * only on the artifacts that exist.
  *
  * This closes the r12 gap: the IVF add was the one index-append
  * sibling WITHOUT the exactly-once treatment (a bare
  * `mode("append").partitionBy("cell")` — a retried micro-batch or
  * re-run CLI `ann_index_update` double-appended the same vectors,
  * duplicating candidates in every later probe), and the only
  * persisted index with no compaction arm (each add sprayed one
  * part-file set across touched `cell=` dirs forever — small-files
  * rot). Both fixes reuse the modules the MinHash index proved:
  *
  *  - adds stage under `vectors_delta/` (+ `codes_delta/`) as FLAT
  *    files (cell as a data column) and move into the level-0 tails
  *    only under the `_append_commit` marker; `committed/<batchId>`
  *    tokens make a re-driven batch a no-op, and the whole step runs
  *    under the OS-file-lock writer lease.
  *  - [[compact]] folds tiers by [[TieredIndex]]'s size policy: tail →
  *    new cell-partitioned level-1 run (O(tail)); runs re-merge past
  *    the run cap (O(L1), base untouched); the base rewrites only at
  *    the size-ratio trip, so per-cycle IO follows the tail.
  *
  * Probes read base ∪ runs ∪ tail through [[TieredIndex.read]]: the
  * probed-cell IN-filter pushes through the union, so base and run
  * scans stay statically pruned to probed `cell=` dirs and only the
  * (compaction-bounded) flat tail is row-filtered. Centroids and
  * codebooks are train-once artifacts — never touched by maintenance
  * (the FAISS add-without-retrain contract).
  *
  * Probe/maintenance concurrency follows the MinHash contract: probes
  * run no recovery and may race an APPEND (staged files are invisible;
  * a half-promoted tail at worst hides part of the newest batch, which
  * the next probe sees), but NOT a compaction, whose multi-dir publish
  * can transiently double-read rows across a promoted run and the
  * not-yet-emptied tail — schedule compaction from the single
  * maintenance orchestrator, between probes. Rename-protocol caveat
  * only: an index built with `protocol = CommitProtocol.Manifest`
  * runs every step through the versioned-manifest arms below
  * ([[saveManifest]]/[[appendManifest]]/[[compactManifest]]), where
  * probes resolve one snapshot and need no scheduling.
  */
private[vector] object IvfMaintenance {

  val VectorsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("cell", LongType)))
  val CodesSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("codes", ArrayType(IntegerType)),
    StructField("cell", LongType)))
  val CentroidsSchema: StructType = StructType(Seq(
    StructField("cell", LongType),
    StructField("centroid", ArrayType(DoubleType))))
  val CodebooksSchema: StructType = StructType(Seq(
    StructField("m", IntegerType),
    StructField("code", IntegerType),
    StructField("centroid", ArrayType(DoubleType))))

  // adds stage both tables (codes_delta simply never exists for the
  // flat layout) and promote into the flat tails under ONE marker
  private val AppendLayout = IndexCommit.Layout("_append_commit",
    staged = Seq("vectors_delta" -> "vectors_tail", "codes_delta" -> "codes_tail"))
  // compaction publishes one of three artifact subsets under one
  // marker name; recovery uses the union and acts on what exists
  private val MinorCompactLayout = IndexCommit.Layout("_compact_commit",
    staged = Seq("vectors_l1_delta" -> "vectors_l1", "codes_l1_delta" -> "codes_l1"),
    swaps = Seq("vectors_tail", "codes_tail"))
  private val MergeCompactLayout = IndexCommit.Layout("_compact_commit",
    swaps = Seq("vectors_l1", "codes_l1", "vectors_tail", "codes_tail"))
  private val MajorCompactLayout = IndexCommit.Layout("_compact_commit",
    swaps = Seq("vectors", "codes", "vectors_l1", "codes_l1",
      "vectors_tail", "codes_tail"))
  private val CompactRecoveryLayout = IndexCommit.Layout("_compact_commit",
    staged = MinorCompactLayout.staged, swaps = MajorCompactLayout.swaps)

  def isBatchCommitted(indexDir: String, batchId: String): Boolean =
    IndexCommit.isBatchCommitted(indexDir, batchId)

  /** Finish (or roll back) a maintenance step interrupted mid-flight;
    * runs on every maintenance open, under the writer lease.
    */
  def recover(indexDir: String): Unit =
    IndexCommit.recover(indexDir, Seq(CompactRecoveryLayout, AppendLayout))

  /** A rebuild into a previously-maintained dir must not inherit the
    * old generation's tails, runs, staging, markers, or committed
    * tokens (a surviving token would silently no-op a new ingest that
    * reuses a batch id). Called by the save paths under their lease;
    * the artifact set derives from the layouts
    * (IndexCommit.clearMaintenanceState).
    */
  def clearMaintenanceState(indexDir: String): Unit =
    IndexCommit.clearMaintenanceState(indexDir,
      Seq(CompactRecoveryLayout, AppendLayout))

  /** Stage a fully-assigned (and, for PQ, fully-encoded) batch, then
    * commit it into the tails under the marker. Both parquet writes
    * complete BEFORE the marker appears; a crash on either side of it
    * is re-driven (or rolled back) by [[recover]], and `batchId` makes
    * the retried step a no-op. Tail files are FLAT (cell as a data
    * column): a micro-batch add costs one small unpartitioned write
    * per table, never a k-partition-dir commit — compaction owns the
    * re-layout into pruned `cell=` dirs.
    */
  def stageAndCommitAdd(indexDir: String, vectors: DataFrame,
                        codes: Option[DataFrame],
                        batchId: Option[String]): Unit = {
    vectors.select(col("vec_id"), col("embedding"), col("cell"))
      .write.mode("overwrite").parquet(s"$indexDir/vectors_delta")
    codes.foreach(_.select(col("vec_id"), col("codes"), col("cell"))
      .write.mode("overwrite").parquet(s"$indexDir/codes_delta"))
    IndexCommit.commit(indexDir, AppendLayout, batchId)
  }

  /** Probe-side self-heal — see [[IndexCommit.healMarkedCommit]]: a
    * compaction's dir swap can leave `vectors/` transiently missing
    * after a post-marker crash; loads finish the marked commit (never
    * touching unmarked staging) instead of failing until the next
    * maintenance open.
    */
  def healMarked(indexDir: String): Unit =
    IndexCommit.healMarkedCommit(indexDir,
      Seq(CompactRecoveryLayout, AppendLayout))

  def readVectors(spark: SparkSession, indexDir: String): DataFrame = {
    healMarked(indexDir)
    TieredIndex.read(spark, indexDir, "vectors", VectorsSchema)
  }

  def readCodes(spark: SparkSession, indexDir: String): DataFrame =
    TieredIndex.read(spark, indexDir, "codes", CodesSchema)

  // ---- versioned-manifest (object-store) protocol arms ----
  //
  // Tables: `vectors` (+ `codes` for the PQ flavor) tiered — base
  // partitioned by cell (statically pruned probes), flat
  // (cell, vec_id)-sorted L1 runs (footer-stat pruned: the probe's
  // cell IN-filter is a direct column predicate), flat tails;
  // `centroids`/`codebooks` are train-once single-dir tables replaced
  // only by a rebuild. Probes resolve ONE snapshot covering every
  // table, so a probe can never see new vectors with old codes — the
  // cross-table atomicity the rename protocol needs a shared marker
  // for, a single manifest file gives outright.

  import graft.util.{CommitProtocol, ManifestCommit, ManifestTiered}

  def isManifest(spark: SparkSession, indexDir: String): Boolean =
    CommitProtocol.ofIndex(spark.sessionState.newHadoopConf(), indexDir) ==
      CommitProtocol.Manifest

  /** Rebuild-publish: lay every table fresh and publish a manifest
    * replacing the whole index state (committed-batch state reset — a
    * new logical index must not inherit tokens).
    */
  def saveManifest(spark: SparkSession, indexDir: String, vectors: DataFrame,
                   centroids: DataFrame, codes: Option[DataFrame],
                   codebooks: Option[DataFrame]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val vd = ManifestTiered.layDir(spark, indexDir, "vectors", vectors,
      partitionBy = Seq("cell"), sortKeys = Seq(col("vec_id")))
    val ctd = ManifestTiered.layDir(spark, indexDir, "centroids", centroids,
      partitionBy = Nil, sortKeys = Nil)
    val cd = codes.map(c => ManifestTiered.layDir(spark, indexDir, "codes", c,
      partitionBy = Seq("cell"), sortKeys = Seq(col("vec_id"))))
    val cbd = codebooks.map(cb => ManifestTiered.layDir(spark, indexDir,
      "codebooks", cb, partitionBy = Nil, sortKeys = Nil))
    ManifestCommit.publish(conf, indexDir, m => m.copy(
      tables = Map("vectors" -> Seq(vd), "centroids" -> Seq(ctd)) ++
        cd.map("codes" -> Seq(_)) ++ cbd.map("codebooks" -> Seq(_)),
      committed = Map.empty, writers = Map.empty, floor = 0L))
    // protocol-crossing rebuild: drop the now-unreachable rename tree
    // AFTER the publish (readers keep serving the old rename index
    // until the manifest lands; a crash in the gap only leaks the
    // tree until the next rebuild's pass here)
    ManifestTiered.clearRenameLayout(conf, indexDir,
      Seq("vectors", "centroids", "codes", "codebooks"))
  }

  /** FAISS add on the manifest protocol: flat unsorted tail dirs for
    * vectors (+ codes), ONE publish, exactly-once under the batch id.
    */
  /** `commuting = false` is for probe-paired callers (the streaming
    * drain): fail LOUDLY on contention so the re-driven batch
    * re-probes the post-racer snapshot — see the MinHash
    * appendAtManifest contract. Such callers must ALSO pass the
    * snapshot their probe read via `at`: without it the append
    * re-resolves current() internally, and a racer landing between
    * the probe's resolve and this one would commit silently — the
    * exact gap the fail-loud contract exists to close.
    */
  def appendManifest(spark: SparkSession, indexDir: String, vectors: DataFrame,
                     codes: Option[DataFrame],
                     batchId: Option[String],
                     commuting: Boolean = true,
                     at: Option[ManifestCommit.Manifest] = None): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val m = at.getOrElse(ManifestCommit.current(conf, indexDir))
    ManifestTiered.assertAdopted(conf, indexDir, m, "vectors")
    if (batchId.exists(m.isCommitted)) return
    val vd = ManifestTiered.layDir(spark, indexDir,
      ManifestTiered.tailTable("vectors"),
      vectors.select(col("vec_id"), col("embedding"), col("cell")),
      partitionBy = Nil, sortKeys = Nil)
    val cd = codes.map(c => ManifestTiered.layDir(spark, indexDir,
      ManifestTiered.tailTable("codes"),
      c.select(col("vec_id"), col("codes"), col("cell")),
      partitionBy = Nil, sortKeys = Nil))
    // COMMUTING update (pure tail addDirs): lost CAS → retry against
    // the fresh snapshot, the laid dirs stay valid (probe-paired
    // callers opt out and fail loudly instead)
    val update = (mm: ManifestCommit.Manifest) => {
      val withV = ManifestCommit.addDir(mm,
        ManifestTiered.tailTable("vectors"), vd.dir, vd.rows)
      cd.map(d => ManifestCommit.addDir(withV,
        ManifestTiered.tailTable("codes"), d.dir, d.rows)).getOrElse(withV)
    }
    if (commuting)
      ManifestCommit.publishCommuting(conf, indexDir, m, update, batchId,
        // the lay cell-assigned (and PQ-encoded) this batch under the
        // base snapshot's train-once artifacts; a racing REBUILD
        // replaces them, and re-applying would land rows coded under
        // superseded centroids/codebooks — appends commute across
        // other appends and compactions (which never touch these
        // tables), never across a rebuild
        invariant = fresh => {
          val changed = Seq("centroids", "codebooks")
            .filter(t => fresh.table(t) != m.table(t))
          if (changed.nonEmpty) throw new IllegalStateException(
            s"a concurrent rebuild of $indexDir replaced " +
              s"${changed.mkString(" and ")} while this append was " +
              s"retrying a lost publish race: the batch's cell " +
              s"assignments/codes derive from the superseded artifacts " +
              s"and must not land in the rebuilt index. Re-run the " +
              s"append against the new index (re-assigning the batch).")
        })
    else ManifestCommit.publishAt(conf, indexDir, m, update, batchId)
    ()
  }

  /** One snapshot's tiered reads — every consumer of a manifest index
    * resolves [[ManifestCommit.current]] ONCE and reads all tables
    * through it.
    */
  def readVectorsManifest(spark: SparkSession, indexDir: String,
                          m: ManifestCommit.Manifest): DataFrame =
    ManifestTiered.read(spark, indexDir, m, "vectors", VectorsSchema)

  def readCodesManifest(spark: SparkSession, indexDir: String,
                        m: ManifestCommit.Manifest): DataFrame =
    ManifestTiered.read(spark, indexDir, m, "codes", CodesSchema)

  /** Size-tiered compaction on the manifest protocol: `vectors` (the
    * dominant table) decides; `codes` — row-for-row the same ids when
    * present — folds alongside in the SAME publish, so the two stores
    * can never commit to different tier states.
    */
  def compactManifest(spark: SparkSession, indexDir: String): Unit = {
    val m = ManifestCommit.current(
      spark.sessionState.newHadoopConf(), indexDir)
    val pq = m.entries("codes").nonEmpty ||
      m.entries(ManifestTiered.tailTable("codes")).nonEmpty
    def spec(name: String, schema: org.apache.spark.sql.types.StructType,
             rowsPerFile: Long) =
      ManifestTiered.FoldSpec(name, schema,
        basePartitionBy = Seq("cell"), baseSortKeys = Seq(col("vec_id")),
        runSortKeys = Seq(col("cell"), col("vec_id")),
        runRowsPerFile = rowsPerFile)
    ManifestTiered.compactTables(spark, indexDir,
      spec("vectors", VectorsSchema, 250L * 1000) +:
        (if (pq) Seq(spec("codes", CodesSchema, 4L * 1000 * 1000)) else Nil))
  }

  private def hasCodes(spark: SparkSession, indexDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/codes")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** SIZE-TIERED compaction of the inverted lists (policy in
    * [[TieredIndex]]): Minor folds the flat tails into one new
    * cell-partitioned level-1 run; MergeRuns re-merges runs+tail into
    * a single run past the run cap; Major rewrites the base only at
    * the size-ratio trip. `vectors` (the dominant table) makes the
    * policy decision; `codes` — row-for-row the same ids when present
    * — folds alongside under the same marker, so the two stores can
    * never commit to different tier states. Restores the probed-cell
    * static pruning for all folded rows (tail rows are row-filtered
    * until their fold) and collapses the per-add small-file rot.
    */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    import java.nio.file.{Files, Paths}
    IndexCommit.assertRenameCommitFs(
      spark.sessionState.newHadoopConf(), indexDir, "IvfMaintenance.compact")
    val pq = hasCodes(spark, indexDir)
    // one sorted cell-partitioned file set from `rows`
    def lay(rows: DataFrame, path: String): Unit =
      rows.repartition(col("cell"))
        .sortWithinPartitions(col("vec_id"))
        .write.mode("overwrite").partitionBy("cell").parquet(path)
    def emptyNew(names: String*): Unit =
      names.filter(n => pq || !n.startsWith("codes"))
        .foreach(n => Files.createDirectories(Paths.get(indexDir, s"${n}_new")))
    IndexCommit.withWriterLease(indexDir) {
      recover(indexDir)
      TieredIndex.plan(spark, indexDir, "vectors", VectorsSchema) match {
        case TieredIndex.NoOp => ()
        case TieredIndex.Minor(k) =>
          lay(TieredIndex.readTail(spark, indexDir, "vectors", VectorsSchema),
            s"$indexDir/vectors_l1_delta/run=$k")
          if (pq)
            lay(TieredIndex.readTail(spark, indexDir, "codes", CodesSchema),
              s"$indexDir/codes_l1_delta/run=$k")
          emptyNew("vectors_tail", "codes_tail")
          IndexCommit.commit(indexDir, MinorCompactLayout)
        case TieredIndex.MergeRuns =>
          lay(TieredIndex.readAboveBase(spark, indexDir, "vectors", VectorsSchema),
            s"$indexDir/vectors_l1_new/run=0")
          if (pq)
            lay(TieredIndex.readAboveBase(spark, indexDir, "codes", CodesSchema),
              s"$indexDir/codes_l1_new/run=0")
          emptyNew("vectors_tail", "codes_tail")
          IndexCommit.commit(indexDir, MergeCompactLayout)
        case TieredIndex.Major =>
          lay(readVectors(spark, indexDir), s"$indexDir/vectors_new")
          if (pq) lay(readCodes(spark, indexDir), s"$indexDir/codes_new")
          emptyNew("vectors_l1", "codes_l1", "vectors_tail", "codes_tail")
          IndexCommit.commit(indexDir, MajorCompactLayout)
      }
    }
  }
}
