package graft.tools

import graft.operators.{AsOfJoinOps, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale harness for the point-in-time family: synthesize an events
  * corpus far beyond the test SFs (default 20 M events over 200 k
  * users, Zipf-ish skew — the hottest user holds ~1 % of all events)
  * and run the three batch routes — composed window, custom AsOfJoin
  * operator, SCD2 build + interval join — recording wall time, tasks,
  * shuffle bytes, and peak per-task memory (the ScalePipeline listener)
  * plus a value checksum that must agree across routes.
  *
  * What it demonstrates: every route is one keyed shuffle class — no
  * route degrades super-linearly with volume or collapses onto a hot
  * key (skew shows up as a longer sorted run, bounded task memory),
  * and the custom operator's merge holds O(1) state per partition at
  * sizes where a buffering implementation would spill or die.
  *
  * Usage: AsofScale [nEvents] [nUsers]
  */
object AsofScale {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val users = args.lift(1).map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-asof-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = new ScalePipeline.StageMetrics
    spark.sparkContext.addSparkListener(m)

    // Zipf(1)-ish user skew via a log-uniform map: P(user=k) ∝ 1/k, the
    // hottest user holds ~1/ln(users) ≈ 8% of all events — the shape
    // that breaks per-key buffering while leaving enough parallelism
    // that the harness measures the plan, not one task.
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) +
        pmod(xxhash64(col("id")), lit(30L * 24 * 3600 * 1000000L))).as("ts"),
      floor(exp((pmod(xxhash64(col("id") + 7), lit(1000000L)) / lit(1000000.0)) *
        log(lit(users.toDouble)))).cast("long").as("user_id"),
      when(pmod(col("id"), lit(10)) < 7, "click").otherwise("purchase")
        .as("event_type"),
      (pmod(xxhash64(col("id") + 13), lit(10000)) / lit(100.0)).as("value"))

    def stage(name: String)(f: => DataFrame): Unit = {
      m.reset()
      val t0 = System.nanoTime()
      val out = f
      val checksum = out.agg(
        count(lit(1)).as("rows"),
        round(sum(col("asof_value")), 2).as("sum_v")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"""[asof-scale] {"route":"$name","n":$n,"users":$users,"wall_s":$wall%.1f,"rows":${checksum.getLong(0)},"sum_value":${checksum.getDouble(1)},"tasks":${m.tasks.sum},"shuffle_write_mb":${m.shuffleWrite.sum / 1e6}%.1f,"peak_task_mem_mb":${m.peakTaskMem.get / 1e6}%.1f}""")
    }

    stage("window") {
      val e = ev.filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          when(col("event_type") === "purchase", 0).otherwise(1).as("kind"),
          when(col("event_type") === "purchase", col("value")).as("pv"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Long.MinValue, 0)
      e.withColumn("av", last(col("pv"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          round(coalesce(col("av"), lit(-1.0)), 6).as("asof_value"))
    }

    stage("custom-operator") { AsOfJoinOps.enrichClicks(ev) }

    stage("scd2-interval") {
      val dim = Relational.scd2(ev)
        .select(col("user_id").as("d_user"), col("value"),
          col("valid_from_us"), col("valid_to_us"))
      ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .join(dim,
          col("user_id") === col("d_user") &&
            col("ts_us") >= col("valid_from_us") &&
            (col("valid_to_us").isNull || col("ts_us") < col("valid_to_us")),
          "left")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          coalesce(col("value"), lit(-1.0)).as("asof_value"))
    }

    spark.stop()
  }
}
