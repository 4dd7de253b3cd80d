package graft.dedup

import graft.functions.GraftFunctions.tokens
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale guards for the LSH pipelines: a degenerate corpus (every doc
  * identical → every doc in the same bucket of every band) must complete
  * with a bounded pair set, not a quadratic one — the MaxBucket cap is
  * what a 100 TB run relies on when a pathological bucket shows up.
  */
class DedupScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("simhash: 1000 identical docs → spanning star, sub-quadratic AND connected") {
    import spark.implicits._
    val docs = (0 until 1000).map(i => (i.toLong, "the same exact document text repeated"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(docs)
    val n = pairs.count()
    // uncapped this would be 1000*999/2 ≈ 500k pairs; over-cap buckets
    // emit a star to the min doc: exactly 999 pairs, all anchored at 0
    assert(n == 999, s"expected spanning star of 999 pairs, got $n")
    assert(pairs.filter(col("id1") === 0L).count() == 999)
    // CC over the star finds ONE cluster of 1000 — the dedup decision
    // the old cap-and-drop could never make
    val labels = Dedup.connectedComponents(pairs.select(col("id1"), col("id2")))
    assert(labels.select(col("label")).distinct().count() == 1)
    assert(labels.count() == 1000)
  }

  test("minhash candidates: 1000 identical docs → spanning star per band") {
    import spark.implicits._
    val docs = (0 until 1000).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val sh = Dedup.wordShingles(docs, 5)
    val cand = Dedup.candidatePairs(
      Dedup.bands(Dedup.minHashSignature(sh, 64), 64, 4))
    // the cap sizing is groupBy-based: the plan must contain NO window
    // operator — a window over (band,bucket) would sort this entire
    // degenerate bucket inside one task before the cap could act
    val plan = cand.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "bucket sizing must not use a window")
    assert(cand.count() == 999, s"expected 999 star pairs")
    // and the full pipeline (verify + CC) dedups the whole cluster
    val verified = Dedup.verifyJaccard(cand, sh, 0.5)
    assert(verified.count() == 999) // identical docs: jaccard 1.0 everywhere
  }

  test("test-data buckets are under the cap (cap is behavior-neutral there)") {
    val dir = Seq("/root/testdata/sf0.1", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(dir.isDefined)
    val docs = spark.read.parquet(s"${dir.get}/documents.parquet")
    val sigs = docs.select(col("doc_id"),
      graft.functions.SimHashSig.simhashSig(tokens(col("text"))).as("sig"))
    val widths = sigs.select(explode(array((0 until 4).map(k =>
        expr(s"shiftrightunsigned(sig, ${k * 16}) & 65535")): _*)).as("bucket"))
      .groupBy(col("bucket")).count()
    val maxSimhash = widths.agg(max(col("count"))).head().getLong(0)
    assert(maxSimhash <= 256, s"sf bucket wider than cap: $maxSimhash — cap would change results")

    val emb = spark.read.parquet(s"${dir.get}/embeddings.parquet")
      .withColumn("bucket", graft.vector.VectorOps.lshSignature(col("embedding"), 16))
      .groupBy(col("bucket")).count()
    val maxEmb = emb.agg(max(col("count"))).head().getLong(0)
    assert(maxEmb <= 64, s"sf embedding bucket wider than cap: $maxEmb")
  }

  test("exact jaccard plans ONE corpus scan and no window") {
    val dir = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.001")
      .find(d => new java.io.File(d).exists())
    assume(dir.isDefined)
    val docs = spark.read.parquet(s"${dir.get}/documents.parquet")
    // AQE wraps the tree in AdaptiveSparkPlanExec; audit the static plan
    val wasAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try Dedup.jaccardExactPairs(docs).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", wasAqe)
    // the bounded-collect rewrite's whole point: tokenize+shingle runs in
    // exactly one scan stage (the old df-agg/semi-join/two-join-sides
    // shape re-scanned the corpus four times), and the skew cap acts in
    // the aggregation, never via a window sort
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected 1 corpus scan, got ${scans.size}:\n$plan")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"window in the capping path:\n$plan")
  }
}
