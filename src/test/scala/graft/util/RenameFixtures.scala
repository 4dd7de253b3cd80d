package graft.util

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** TEST FIXTURE: materialize a legacy RENAME-layout index tree.
  *
  * The rename-protocol maintenance bodies are retired from production
  * (builds/probes/folds all run the manifest protocol), but the
  * zero-copy migration path (`ManifestTiered.adoptRenameTiered` /
  * JobRunner index_migrate) must keep working against real legacy
  * trees — so tests SYNTHESIZE one: build the index manifest-side in a
  * scratch dir, then copy its table dirs into the physical layout the
  * rename protocol used (`<t>/`, `<t>_l1/run=K/`, `<t>_tail/`,
  * `committed/<id>`, root marker files). The resulting tree is
  * faithful to what a pre-retirement deployment left on disk: same
  * partition-dir shapes, same marker/meta files, same token form.
  */
object RenameFixtures {

  /** Copy `src`'s files into `dst` (created), prefixing file names with
    * `prefix` so several source dirs can merge into one flat legacy dir
    * without collisions. Skips Spark's _SUCCESS markers.
    */
  private def copyFilesPrefixed(src: String, dst: String, prefix: String): Unit = {
    Files.createDirectories(Paths.get(dst))
    val st = Files.list(Paths.get(src))
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toVector.foreach { p =>
        val name = p.getFileName.toString
        if (Files.isDirectory(p)) copyFilesPrefixed(p.toString, s"$dst/$name", prefix)
        else if (!name.startsWith("_") && !name.startsWith("."))
          // hidden sidecars (.crc checksums, _SUCCESS) stay behind: a
          // renamed data file's old checksum would poison local reads
          Files.copy(p, Paths.get(dst, s"$prefix$name"),
            StandardCopyOption.REPLACE_EXISTING)
      }
    } finally st.close()
  }

  /** Lay `srcDir`'s CURRENT manifest snapshot as a legacy rename tree
    * at `dstDir`.
    *
    *  - `layout` maps manifest table names to legacy rel dirs — e.g.
    *    `"bands" -> "bands"`, `"bands.tail" -> "bands_tail"`,
    *    `"bands.l1" -> "bands_l1"` (a `_l1` target gets one `run=<i>`
    *    subdir per manifest dir; a multi-dir table mapped to any other
    *    target merges its dirs' files with per-dir prefixes — the flat
    *    tail shape).
    *  - `rootFiles`: marker files copied from the source index root
    *    (e.g. `_graft_minhash_meta`).
    *  - `committed`: legacy batch tokens written as empty
    *    `committed/<id>` files — the rename protocol's committed form.
    */
  def fromManifest(spark: SparkSession, srcDir: String, dstDir: String,
                   layout: Map[String, String],
                   rootFiles: Seq[String] = Nil,
                   committed: Seq[String] = Nil): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val m = ManifestCommit.current(conf, srcDir)
    require(m.gen > 0, s"$srcDir holds no manifest index to copy from")
    Files.createDirectories(Paths.get(dstDir))
    layout.foreach { case (table, rel) =>
      val dirs = m.table(table)
      if (rel.endsWith("_l1"))
        dirs.zipWithIndex.foreach { case (d, i) =>
          FileTrees.copyTree(s"$srcDir/$d", s"$dstDir/$rel/run=$i")
        }
      else if (dirs.size == 1)
        FileTrees.copyTree(s"$srcDir/${dirs.head}", s"$dstDir/$rel")
      else
        dirs.zipWithIndex.foreach { case (d, i) =>
          copyFilesPrefixed(s"$srcDir/$d", s"$dstDir/$rel", s"d$i-")
        }
    }
    rootFiles.foreach { f =>
      val src = Paths.get(srcDir, f)
      if (Files.exists(src))
        Files.copy(src, Paths.get(dstDir, f), StandardCopyOption.REPLACE_EXISTING)
    }
    if (committed.nonEmpty) {
      Files.createDirectories(Paths.get(dstDir, "committed"))
      committed.foreach(id =>
        Files.write(Paths.get(dstDir, "committed", id), Array.empty[Byte]))
    }
  }

  /** A legacy MinHash index at `dstDir`: `build` populates a scratch
    * dir through the normal (manifest) API — build / append / compact
    * as the test's shape needs — and the scratch's current snapshot is
    * copied into the legacy layout (base, l1 runs, tail, meta marker,
    * committed tokens), scratch removed.
    */
  def minhashIndex(spark: SparkSession, dstDir: String,
                   committed: Seq[String] = Nil)(build: String => Unit): Unit = {
    val scratch = Files.createTempDirectory("graft_renfix").toString
    try {
      build(scratch)
      fromManifest(spark, scratch, dstDir,
        layout = Map("bands" -> "bands", "widths" -> "widths",
          "bands.l1" -> "bands_l1", "widths.l1" -> "widths_l1",
          "bands.tail" -> "bands_tail", "widths.tail" -> "widths_tail"),
        rootFiles = Seq("_graft_minhash_meta"),
        committed = committed)
    } finally FileTrees.rmTree(scratch)
  }

  /** A legacy BM25 index at `dstDir` — same contract as
    * [[minhashIndex]].
    */
  def bm25Index(spark: SparkSession, dstDir: String,
                committed: Seq[String] = Nil)(build: String => Unit): Unit = {
    val scratch = Files.createTempDirectory("graft_renfix_bm25").toString
    try {
      build(scratch)
      fromManifest(spark, scratch, dstDir,
        layout = Map("postings" -> "postings",
          "postings.l1" -> "postings_l1",
          "postings.tail" -> "postings_tail",
          "terms" -> "terms", "stats" -> "stats"),
        committed = committed)
    } finally FileTrees.rmTree(scratch)
  }

  /** A legacy IVF / IVF-PQ index at `dstDir` — same contract as
    * [[minhashIndex]] (codes/codebooks appear when the scratch index
    * has them).
    */
  def ivfIndex(spark: SparkSession, dstDir: String,
               committed: Seq[String] = Nil)(build: String => Unit): Unit = {
    val scratch = Files.createTempDirectory("graft_renfix_ivf").toString
    try {
      build(scratch)
      fromManifest(spark, scratch, dstDir,
        layout = Map("vectors" -> "vectors",
          "vectors.l1" -> "vectors_l1", "vectors.tail" -> "vectors_tail",
          "codes" -> "codes", "codes.l1" -> "codes_l1",
          "codes.tail" -> "codes_tail",
          "centroids" -> "centroids", "codebooks" -> "codebooks"),
        committed = committed)
    } finally FileTrees.rmTree(scratch)
  }
}
