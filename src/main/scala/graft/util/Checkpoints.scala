package graft.util

import org.apache.spark.sql.DataFrame

/** Reliable eager checkpointing for iterative jobs (PageRank, connected
  * components). `localCheckpoint` stores blocks on executors: on a real
  * cluster a single lost executor kills the lineage-less job mid-iteration.
  * `checkpoint()` writes to the (HDFS-able) checkpoint dir, so recovery
  * reads files instead of dying. Configure `spark.graft.checkpointDir` to
  * point at durable storage on a cluster; local runs fall back to a temp
  * dir.
  */
object Checkpoints {

  /** Eagerly checkpoint `df` to reliable storage, setting the checkpoint
    * dir on first use if the session has none.
    *
    * On a non-local master the fallback temp dir would be a *driver-local*
    * path that executors can't read back — silently reintroducing the
    * failure mode this class exists to fix — so there it is an error, not
    * a fallback: require `spark.graft.checkpointDir` (or a pre-set
    * SparkContext checkpoint dir) pointing at shared storage.
    */
  /** Resolve the dir to use: the configured one, or — only under a local
    * master — a temp-dir fallback.
    */
  private[util] def resolveDir(isLocal: Boolean, master: String,
                               configured: Option[String]): String =
    configured.getOrElse {
      require(isLocal,
        "spark.graft.checkpointDir must point at durable shared storage " +
          s"on a cluster (master=$master); a local temp-dir fallback " +
          "would leave checkpoint partitions on per-node disks")
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    }

  def reliable(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val dir = resolveDir(sc.isLocal, sc.master,
        df.sparkSession.conf.getOption("spark.graft.checkpointDir"))
      sc.setCheckpointDir(dir)
      // iterative jobs checkpoint every round; without this the files
      // accumulate for the life of the session
      if (!sc.getConf.contains("spark.cleaner.referenceTracking.cleanCheckpoints"))
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          "set spark.cleaner.referenceTracking.cleanCheckpoints=true to " +
            s"reclaim per-iteration checkpoints under $dir")
    }
    df.checkpoint()
  }
}
