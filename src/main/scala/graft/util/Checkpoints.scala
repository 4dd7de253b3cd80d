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
    */
  def reliable(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val dir = df.sparkSession.conf.getOption("spark.graft.checkpointDir")
        .getOrElse(java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      sc.setCheckpointDir(dir)
    }
    df.checkpoint()
  }
}
