package graft.tools

import graft.util.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Sub-stage profiler for ONE MinHash index probe (dev tool): splits
  * the per-micro-batch probe constant the streaming drain pays —
  * signature build + checkpoint, the batch-stats driver job, and the
  * candidate join itself — so the drain trim targets the measured
  * stage, not a guess.
  */
object ProbeProf {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "probe-prof")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables(spark, dir, "documents")
    docs.count() // warm
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val idx = java.nio.file.Files.createTempDirectory("pprof").toString
    graft.dedup.Dedup.saveMinHashIndex(
      docs.filter(pmod(col("doc_id"), lit(4L)) =!= 3L), idx)
    val batch = docs.filter(pmod(col("doc_id"), lit(4L)) === 3L)
    // warm the whole path once
    graft.dedup.Dedup.dedupAgainstMinHashIndex(batch, idx).count()
    (1 to 3).foreach { i =>
      val hits = time(s"probe_$i total")(
        graft.dedup.Dedup.dedupAgainstMinHashIndex(batch, idx))
      time(s"probe_$i collect")(hits.count())
    }
    // per-job decomposition of one full probe: which Spark jobs a
    // single probe+count schedules and what each costs
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val done = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.put(e.jobId, (e.time, e.stageInfos.map(_.numTasks).sum))
          e.stageInfos.foreach(si => println(
            f"[pprofstage] job=${e.jobId}%3d stage=${si.stageId}%3d tasks=${si.numTasks}%4d ${si.name.take(90)}")) }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        { done.put(e.jobId, e.time); () }
    }
    spark.sparkContext.addSparkListener(listener)
    time("probe_jobs total")(
      graft.dedup.Dedup.dedupAgainstMinHashIndex(batch, idx).count())
    Thread.sleep(1000) // let the listener bus drain
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (t0, nt)) =>
      val dur = done.asScala.get(id).map(t => (t - t0) / 1000.0).getOrElse(-1.0)
      println(f"[pprofjob] job=$id%3d dur=$dur%6.2f s tasks=$nt%4d")
    }
    // A/B: same probe with splits packed to ~one per table read —
    // isolates the per-task/per-file scan constant from everything else
    jobs.clear(); done.clear()
    spark.conf.set("spark.sql.files.openCostInBytes", "8192")
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    (1 to 2).foreach { i =>
      time(s"probe_packed_$i")(
        graft.dedup.Dedup.dedupAgainstMinHashIndex(batch, idx).count())
    }
    Thread.sleep(1000)
    spark.sparkContext.removeSparkListener(listener)
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (t0, nt)) =>
      val dur = done.asScala.get(id).map(t => (t - t0) / 1000.0).getOrElse(-1.0)
      println(f"[pprofjob2] job=$id%3d dur=$dur%6.2f s tasks=$nt%4d")
    }
    // decomposition: signatures alone (the probe's dominant CPU claim)
    (1 to 2).foreach { i =>
      val b = time(s"banded_$i build+checkpoint")(
        graft.dedup.Dedup.bandedSignaturesDev(batch).localCheckpoint())
      time(s"banded_$i stats job")(
        b.agg(collect_set(col("band").cast("long") * 16 + col("bmod")),
          countDistinct(col("band"), col("bucket"))).collect())
      time(s"banded_$i keys distinct collect")(
        b.select(col("band"), col("bucket")).distinct().count())
    }
    graft.util.FileTrees.rmTree(idx)
    spark.stop()
  }
}
