package graft.tools

import org.apache.spark.sql.SparkSession

/** Run every batch query against zero-row tables — the empty-shard /
  * empty-new-crawl robustness property a 100 TB deployment exercises
  * constantly. Used by EmptyInputSpec and runnable standalone.
  */
object EmptyCheck {

  /** Returns (query name, error) for every batch query that throws. */
  def failures(s: SparkSession, srcSf: String): Seq[(String, Throwable)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      graft.util.Tables(s, srcSf, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val streaming = graft.streaming.StreamQueries.all.map(_.name).toSet
    graft.SparkEntry.allDefs.filterNot(d => streaming.contains(d.name)).flatMap { d =>
      try { d.fn(s, dir).count(); None }
      catch { case e: Throwable => Some(d.name -> e) }
    }
  }

  def main(args: Array[String]): Unit = {
    val s = graft.util.Sessions.local(appName = "empty-check")
    val fs = failures(s, "/root/testdata/sf0.001")
    fs.foreach { case (n, e) => println(s"EMPTYFAIL $n: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}") }
    println(s"EMPTYOK ${graft.SparkEntry.allDefs.size - graft.streaming.StreamQueries.all.size - fs.size} queries")
    s.stop()
  }
}
