package graft.tools

import graft.util.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Dump `explain("formatted")` for the internal sub-plans the
  * registered index-maintenance queries are built from (dev tool) —
  * their registered fns collect a bounded summary and return a
  * parallelized frame, so `tools/Explain` on the query name shows a
  * trivial plan; the plans that matter (and that the optimization
  * rounds diff) are the probe/fold/signature sub-plans dumped here.
  *
  *   runMain graft.tools.PlanDump [sfDir] [name ...]
  *
  * Names: banded_signatures, minhash_probe.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "plan-dump")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("banded_signatures", "minhash_probe")
    val docs = Tables(spark, dir, "documents")
    names.foreach {
      case "banded_signatures" =>
        println("\n===== banded_signatures (build/append/probe signature pass) =====")
        graft.dedup.Dedup.bandedSignaturesDev(docs).explain("formatted")
      case "minhash_probe" =>
        println("\n===== minhash_probe (dedupAgainstMinHashIndex candidate join) =====")
        val idx = java.nio.file.Files.createTempDirectory("plandump_idx").toString
        try {
          graft.dedup.Dedup.saveMinHashIndex(
            docs.filter(pmod(col("doc_id"), lit(4L)) =!= 3L), idx)
          graft.dedup.Dedup.dedupAgainstMinHashIndex(
            docs.filter(pmod(col("doc_id"), lit(4L)) === 3L), idx)
            .explain("formatted")
        } finally graft.util.FileTrees.rmTree(idx)
      case other => println(s"[plandump] unknown name: $other")
    }
    spark.stop()
  }
}
