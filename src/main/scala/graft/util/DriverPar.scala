package graft.util

/** Run INDEPENDENT Spark-action-bearing thunks from separate driver
  * threads (guide §2.6 idle-capacity overlap): Spark schedules the
  * jobs concurrently, so the tail of one back-fills executors the
  * other freed — e.g. an index append's two sidecar lays, or a
  * compaction's per-table folds. Worker threads inherit the caller's
  * job group / description / scheduler pool (thread-local in Spark,
  * so a bare Future would break cancellation and fair-pool routing),
  * and the await is FINITE so a hung job fails the caller instead of
  * hanging it forever. Results keep the input order.
  */
object DriverPar {

  def inParallel[T](sc: org.apache.spark.SparkContext)
                   (thunks: Seq[() => T]): Seq[T] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    if (thunks.sizeIs <= 1) return thunks.map(_())
    // mirror the caller's properties EXACTLY, nulls included: the
    // global pool reuses threads, and a stale jobGroup left by a
    // previous task (e.g. a streaming micro-batch body) would tag this
    // job into a group a concurrent StreamingQuery.stop() cancels
    val inherit = Seq("spark.jobGroup.id", "spark.job.description",
      "spark.job.interruptOnCancel", "spark.scheduler.pool")
      .map(k => k -> sc.getLocalProperty(k))
    Await.result(
      Future.sequence(thunks.map(t => Future {
        inherit.foreach { case (k, v) => sc.setLocalProperty(k, v) }
        t()
      })),
      Duration(30, java.util.concurrent.TimeUnit.MINUTES))
  }
}
