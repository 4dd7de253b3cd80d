package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SummaryAggRewrite: eligible aggregates must EXECUTE against the
  * summary table (not just return the right values — the oracle covers
  * that), and every ineligible shape must decline and keep scanning
  * the fact.
  */
class MvRewriteSpec extends AnyFunSuite {

  // own newSession(): conf and extraOptimizations are session-scoped,
  // so concurrently-running suites (sbt runs suites in parallel in one
  // forked JVM) that invoke the registered mv query — which declares
  // its own summary on the DEFAULT session — can't clobber this
  // spec's declaration between planning and collect
  lazy val spark: SparkSession = {
    val base = SparkSession.builder()
      .master("local[4, 2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val s = base.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s
  }

  private val sf = "/root/testdata/sf0.01"
  private lazy val sumPath = {
    val p = java.nio.file.Files.createTempDirectory("graft_mv_spec").toString
    SummaryAggRewrite.writeSummary(graft.util.Tables(spark, sf, "lineitem"),
      Seq("l_returnflag", "l_linestatus"), Seq("l_quantity", "l_extendedprice"), p)
    p
  }

  private def withRule[T](f: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(SummaryAggRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SummaryAggRewrite
    SummaryAggRewrite.declare(spark, s"$sf/lineitem.parquet", sumPath,
      Seq("l_returnflag", "l_linestatus"), Seq("l_quantity", "l_extendedprice"))
    try f finally spark.conf.unset(SummaryAggRewrite.ConfKey)
  }

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val top = df.queryExecution.executedPlan
    val plan = top match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect {
      case s: FileSourceScanExec => s.relation.location.rootPaths.map(_.toString)
    }.flatten
  }

  private def li = graft.util.Tables(spark, sf, "lineitem")

  test("eligible aggregate reads the summary and matches the fact-scan values") {
    withRule {
      val q = li.filter(col("l_linestatus") === "F")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(25,6)")).cast("double").as("sum_qty"),
          min(col("l_extendedprice")).as("min_p"),
          max(col("l_extendedprice")).as("max_p"))
      val paths = scanPaths(q)
      assert(paths.nonEmpty && paths.forall(_.contains(sumPath)),
        s"expected summary scan, got $paths")
      val got = q.orderBy("l_returnflag").collect().map(_.toSeq).toSeq
      spark.conf.unset(SummaryAggRewrite.ConfKey) // direct fact plan
      val want = li.filter(col("l_linestatus") === "F")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(25,6)")).cast("double").as("sum_qty"),
          min(col("l_extendedprice")).as("min_p"),
          max(col("l_extendedprice")).as("max_p"))
        .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
      assert(got == want, "rewritten values must equal the fact-scan values bit for bit")
    }
  }

  test("subset grouping re-aggregates across the collapsed dim (rollup navigation)") {
    withRule {
      val q = li.groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(25,6)")).cast("double").as("s"))
      val paths = scanPaths(q)
      assert(paths.nonEmpty && paths.forall(_.contains(sumPath)),
        s"rollup grain should still read the summary, got $paths")
      val got = q.orderBy("l_linestatus").collect().map(_.toSeq).toSeq
      spark.conf.unset(SummaryAggRewrite.ConfKey)
      val want = li.groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(25,6)")).cast("double").as("s"))
        .orderBy("l_linestatus").collect().map(_.toSeq).toSeq
      assert(got == want)
    }
  }

  test("ineligible shapes decline: non-dim grouping, measure filter, avg, bare double sum, global agg") {
    withRule {
      val shapes = Seq(
        // grouping key outside the declared dims
        li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n")),
        // filter touches a measure — cannot commute with pre-agg
        li.filter(col("l_quantity") > 10)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")),
        // BARE double avg is not recomposable bit-exactly (the
        // decimal-cast form is — see the avg navigation test below)
        li.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a")),
        // COUNT(NULL) is 0 per group, not the row count (r9 advice)
        li.groupBy(col("l_returnflag")).agg(count(lit(null)).as("n")),
        // bare double SUM would change low bits under reassociation
        li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s")),
        // global aggregate: empty-input row semantics differ
        li.agg(count(lit(1)).as("n")))
      shapes.zipWithIndex.foreach { case (q, i) =>
        val paths = scanPaths(q)
        assert(paths.nonEmpty && paths.forall(p => !p.contains(sumPath)),
          s"shape $i must NOT be rewritten, scans=$paths")
      }
    }
  }

  test("decimal-cast avg navigates to the summary and matches the fact values") {
    withRule {
      def q(frame: org.apache.spark.sql.DataFrame) = frame
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_linestatus"))
        .agg(avg(col("l_quantity").cast("decimal(25,6)")).as("aq"),
          avg(col("l_extendedprice").cast("decimal(25,6)")).as("ap"),
          count(lit(1)).as("n"))
      val rewritten = q(li)
      val paths = scanPaths(rewritten)
      assert(paths.nonEmpty && paths.forall(_.contains(sumPath)),
        s"expected summary scan for decimal avg, got $paths")
      val got = rewritten.orderBy("l_linestatus").collect().map(_.toSeq).toSeq
      spark.conf.unset(SummaryAggRewrite.ConfKey)
      val want = q(li).orderBy("l_linestatus").collect().map(_.toSeq).toSeq
      assert(got == want, "avg navigation must be value-exact, digit for digit")
    }
  }

  test("a multi-path scan that merely INCLUDES the fact declines") {
    withRule {
      // fact ∪ another same-schema file: rewriting would silently drop
      // the second path's rows
      val q = spark.read.parquet(s"$sf/lineitem.parquet",
          "/root/testdata/sf0.001/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val paths = scanPaths(q)
      assert(paths.nonEmpty && paths.forall(p => !p.contains(sumPath)),
        s"multi-path scan must not be rewritten, scans=$paths")
    }
  }

  test("declines when the declared fact path does not match the scan") {
    withRule {
      SummaryAggRewrite.declare(spark, "/nonexistent/other.parquet", sumPath,
        Seq("l_returnflag", "l_linestatus"), Seq("l_quantity", "l_extendedprice"))
      val q = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val paths = scanPaths(q)
      assert(paths.nonEmpty && paths.forall(p => !p.contains(sumPath)))
    }
  }
}
