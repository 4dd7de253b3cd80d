package graft.util

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Size-tiered LSM layout shared by the persisted indexes. A tiered
  * table `name` under an index dir lives as:
  *
  *  - `<name>/`          — the partitioned BASE (one sorted file set per
  *    partition; probes prune it statically),
  *  - `<name>_l1/run=K/` — LEVEL-1 runs, same partitioned layout, one
  *    run per minor compaction (probes prune each run the same way),
  *  - `<name>_tail/`     — the flat LEVEL-0 tail where appends land as a
  *    handful of unpartitioned files (partition keys as data columns), so
  *    a micro-batch append never pays a 100+-partition-dir commit,
  *  - `<name>_delta/`, `<name>_l1_delta/` — staging dirs owned by the
  *    [[IndexCommit]] marker protocol.
  *
  * Why tiers: the r12 design folded the tail straight into the base, so
  * EVERY compaction rewrote the whole index (measured 48.6 s / 27.2 GB
  * of shuffle at 1 M docs to fold appends that cost 0.5 s each) — on a
  * years-deep index each maintenance cycle becomes a full rewrite. With
  * tiers, the routine fold is tail → one new L1 run (O(tail) IO); runs
  * re-merge into ONE run when their count passes [[MaxL1Runs]] (O(L1)
  * IO, base untouched); the base rewrite happens only when the L1 mass
  * reaches [[MajorRatio]] × base — so its O(base) cost amortizes over
  * O(base) of appended bytes, and per-cycle compaction IO follows the
  * TAIL, not the accumulated index. Every row is rewritten at most
  * ~2+maxRuns/…≈3 times on its way into the base (tail → run → base,
  * plus at most one run re-merge between), the classic size-tiered
  * write-amplification bound.
  *
  * This module owns the layout, the read-side union, and the policy
  * decision; the index-specific code owns the parquet writes (sort
  * keys and sidecar folds differ per index) and publishes them through
  * [[IndexCommit]].
  */
object TieredIndex {

  /** Rewrite the base only when level-1 (+tail) mass reaches this
    * fraction of the base — the size-ratio trip that makes major
    * compaction IO amortize to O(appended bytes).
    */
  val MajorRatio = 1.0

  /** Run-count backstop: probes union one scan per run, so runs
    * re-merge into a single run (base untouched) past this count even
    * when the size ratio hasn't tripped.
    */
  val MaxL1Runs = 8

  /** What this compaction cycle should do to a tiered table. */
  sealed trait CompactAction
  /** Nothing to fold (empty tail, no runs worth touching). */
  case object NoOp extends CompactAction
  /** Fold the tail into a NEW level-1 run (`run=<newRunId>`); O(tail). */
  final case class Minor(newRunId: Long) extends CompactAction
  /** Re-merge all runs + tail into ONE run (`run=0`); O(L1), base untouched. */
  case object MergeRuns extends CompactAction
  /** Fold base + runs + tail into a new base; O(base), ratio-gated. */
  case object Major extends CompactAction

  def l1Dir(indexDir: String, name: String): Path =
    Paths.get(indexDir, s"${name}_l1")

  /** Existing level-1 run ids, ascending (bounded by [[MaxL1Runs]]). */
  def runIds(indexDir: String, name: String): Seq[Long] = {
    val d = l1Dir(indexDir, name)
    if (!Files.isDirectory(d)) return Nil
    val st = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("run="))
        .map(_.stripPrefix("run=").toLong)
        .toSeq.sorted
    } finally st.close()
  }

  /** Per-tier mass of one table. Measured in ROWS, not file bytes:
    * index rows are fixed-width, so rows ∝ data bytes at any scale,
    * while raw file sizes are skewed by the per-file parquet footer
    * overhead of the base's many small partition files (at small scale
    * a 512-file base "outweighs" a compact flat tail holding twice its
    * rows, and the ratio trip would mis-fire). Row counts come from
    * parquet footers (a metadata-only Spark count per tier).
    */
  final case class TierSizes(base: Long, l1: Long, tail: Long, runCount: Int)

  def rowSizes(spark: SparkSession, indexDir: String, name: String,
               schema: org.apache.spark.sql.types.StructType): TierSizes = {
    def rows(read: => DataFrame): Long = read.count()
    val runs = runIds(indexDir, name)
    TierSizes(
      base = rows(spark.read.schema(schema).parquet(s"$indexDir/$name")),
      l1 = runs.map(k =>
        rows(spark.read.schema(schema).parquet(s"$indexDir/${name}_l1/run=$k"))).sum,
      tail = rows(readTail(spark, indexDir, name, schema)),
      runCount = runs.size)
  }

  /** The policy decision for a tiered table, from its per-tier mass. */
  def plan(sizes: TierSizes,
           majorRatio: Double = MajorRatio,
           maxRuns: Int = MaxL1Runs): CompactAction = {
    if (sizes.tail + sizes.l1 == 0L) NoOp
    else if (sizes.tail + sizes.l1 >= majorRatio * sizes.base) Major
    else if (sizes.runCount + (if (sizes.tail > 0) 1 else 0) > maxRuns) MergeRuns
    else if (sizes.tail > 0) Minor(-1L) // run id resolved by the caller
    else NoOp
  }

  /** Policy + next-run-id resolution for table `name` of an index.
    * Returns the measured tier masses alongside the decision so the
    * fold can size its output files without re-counting.
    */
  def planWithSizes(spark: SparkSession, indexDir: String, name: String,
                    schema: org.apache.spark.sql.types.StructType)
      : (CompactAction, TierSizes) = {
    val sizes = rowSizes(spark, indexDir, name, schema)
    val action = plan(sizes) match {
      case Minor(_) =>
        Minor(runIds(indexDir, name).lastOption.getOrElse(-1L) + 1L)
      case other => other
    }
    (action, sizes)
  }

  /** Policy + next-run-id resolution for table `name` of an index. */
  def plan(spark: SparkSession, indexDir: String, name: String,
           schema: org.apache.spark.sql.types.StructType): CompactAction =
    planWithSizes(spark, indexDir, name, schema)._1

  /** Lay `rows` as a handful of FLAT range-partitioned files sorted on
    * `sortKeys` — the LEVEL-1 run layout. Runs deliberately skip the
    * base's partition-dir tree: a Minor fold's cost floor was the
    * 2×(partition count)-dir commit (~12 ms/dir — at toy scale the
    * whole fold was commit machinery, rows irrelevant), while a flat
    * sorted lay is one small write whose files prune by parquet footer
    * min/max on the leading sort keys — the same pruning the
    * zorder_layout path proves, effective exactly because the range
    * partitioning gives each file a tight key rectangle. Readers
    * filter runs with DIRECT column predicates (band/bucket/cell
    * isin), which parquet pushes to row-group stats.
    */
  def layFlatSorted(rows: DataFrame, path: String,
                    sortKeys: Seq[org.apache.spark.sql.Column],
                    rowCount: Long, rowsPerFile: Long): Unit = {
    val n = math.max(1L, (rowCount + rowsPerFile - 1) / rowsPerFile)
      .min(10000L).toInt
    rows.repartitionByRange(n, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** The ONE base ∪ runs ∪ tail reader every consumer goes through,
    * with the probes' explicit-schema discipline (a just-seeded index
    * may hold ZERO part files and schema inference over a part-less
    * partitioned dir throws; an empty index must read as empty). The
    * optional filter prunes base and run partitions statically and
    * applies as a row filter on the flat tail.
    */
  def read(spark: SparkSession, indexDir: String, name: String,
           schema: org.apache.spark.sql.types.StructType,
           filter: Option[Column] = None): DataFrame = {
    def f(df: DataFrame) = filter.map(df.filter).getOrElse(df)
    def exists(sub: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/$sub")
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    var out = f(spark.read.schema(schema).parquet(s"$indexDir/$name"))
    runIds(indexDir, name).foreach { k =>
      out = out.unionByName(
        f(spark.read.schema(schema).parquet(s"$indexDir/${name}_l1/run=$k")))
    }
    if (exists(s"${name}_tail"))
      out = out.unionByName(
        f(spark.read.schema(schema).parquet(s"$indexDir/${name}_tail")))
    out
  }

  /** Rows of the LEVEL-1 + tail mass only — what a [[MergeRuns]] fold
    * rewrites (the base is deliberately not read).
    */
  def readAboveBase(spark: SparkSession, indexDir: String, name: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame = {
    def exists(sub: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/$sub")
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    var out = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    runIds(indexDir, name).foreach { k =>
      out = out.unionByName(
        spark.read.schema(schema).parquet(s"$indexDir/${name}_l1/run=$k"))
    }
    if (exists(s"${name}_tail"))
      out = out.unionByName(
        spark.read.schema(schema).parquet(s"$indexDir/${name}_tail"))
    out
  }

  /** Rows of the tail only (what a [[Minor]] fold rewrites). */
  def readTail(spark: SparkSession, indexDir: String, name: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/${name}_tail")
    if (p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
      spark.read.schema(schema).parquet(s"$indexDir/${name}_tail")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
