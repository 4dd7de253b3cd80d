package graft.operators

import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Task-retry determinism: the hash-deterministic sampling / splitting /
  * packing operators claim their output is a pure function of the data —
  * independent of which tasks fail and recompute. This spec makes that
  * claim load-bearing: every partition's FIRST attempt throws (then
  * succeeds on retry, `local[4, 2]` = maxFailures 2), and the output
  * must be byte-identical to the clean run. A design that leaked
  * attempt-local state (rand(), monotonically_increasing_id,
  * accumulator-fed values) into row content would diverge here.
  */
class RetrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]") // second arg: task maxFailures — retries enabled
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sf: Option[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())

  /** Re-emits `df` through an RDD stage whose tasks throw on their
    * first attempt (keyed by (marker, partition) in a process-global
    * set, so the retried attempt passes).
    */
  private def faulty(df: DataFrame, marker: String): DataFrame = {
    val s = df.sparkSession
    val schema = df.schema
    val rdd = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (RetrySpec.failedOnce.add(s"$marker:$pid"))
        throw new RuntimeException(s"injected first-attempt failure p$pid")
      it
    }
    s.createDataFrame(rdd, schema)
  }

  private def docs: DataFrame = Tables(spark, sf.get, "documents")

  private def collected(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => math.rint(d * 1e9) // bit-stable compare key
      case x => x
    }.toSeq).toSeq.sortBy(_.mkString("|"))

  test("curation_split output is byte-identical under injected task retries") {
    assume(sf.isDefined)
    val clean = collected(Curation.splitAssign(docs))
    val retried = collected(Curation.splitAssign(faulty(docs, "split")))
    assert(retried === clean)
    assert(RetrySpec.failedOnce.stream().anyMatch(_.startsWith("split:")),
      "injection must actually have fired")
  }

  test("curation_priority_sample output is byte-identical under injected task retries") {
    assume(sf.isDefined)
    def run(d: DataFrame) = Curation.priorityTopK(
      Curation.priorityScores(d, "doc_id", col("n_chars"), col("lang")),
      "doc_id", 50)
      .select(col("grp"), col("doc_id"), col("xi"), col("rk"))
    val clean = collected(run(docs))
    val retried = collected(run(faulty(docs, "psample")))
    assert(retried === clean)
  }

  test("curation_pack_sequences layout is byte-identical under injected task retries") {
    assume(sf.isDefined)
    def run(d: DataFrame) = SeqPack.packDocs(d, maxLen = 512).toDF()
    val clean = collected(run(docs))
    val retried = collected(run(faulty(docs, "pack")))
    assert(retried === clean)
    assert(clean.nonEmpty)
  }
}

object RetrySpec {
  /** (marker, partition) pairs whose first attempt already threw —
    * process-global so retried attempts (same JVM in local mode) pass.
    */
  val failedOnce: java.util.concurrent.ConcurrentHashMap.KeySetView[String, java.lang.Boolean] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
