package graft.operators

import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.util.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over the events table — calendar
  * gap-filling, last-observation-carried-forward, and linear
  * interpolation: the standard "resample" step a metrics/feature
  * pipeline needs before any autoregressive model (no reference
  * counterpart; cc-pyspark never touches time series).
  *
  * Scale shape: the expensive step is the per-series daily
  * pre-aggregation — one partial+final hash agg that collapses event
  * volume to (series × days) rows. Everything after (calendar
  * generation via `sequence`+`explode`, the left join, the fill
  * windows) runs on the AGGREGATED table, whose size is
  * data-model-bounded (series count × calendar span), not
  * corpus-bounded — so the window sorts are safe at any event volume,
  * and they partition by series, never globally. A deployment with
  * years-long series would additionally partition the fill window by
  * (series, year) with a carried boundary row, the same carry trick
  * the sessionizer uses.
  */
object SeriesOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Daily totals per (event_type, user_id mod 100) series,
    * gap-filled to each series' observed calendar span: missing days
    * appear with n=0, a forward-filled total (LOCF), and a linearly
    * interpolated total between the surrounding observed days. Every
    * gap day has both neighbors because the calendar spans exactly
    * [min(day), max(day)] of OBSERVED days — the endpoints are
    * observations. The mod-100 series key keeps output cardinality
    * bounded while leaving ~half the calendar slots empty at test SF,
    * so both fill paths are genuinely exercised.
    *
    * Float discipline: the interpolation is computed with the same
    * association on both engines — `prev + (next - prev) * (Δdays /
    * span)` — so the doubles agree bit for bit before the 6dp round.
    */
  val tsGapfill: QueryDef = QueryDef(
    "ts_gapfill",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val daily = ev
        .select(col("event_type"), (col("user_id") % 100).as("series"),
          to_date(Tables.tsTimestamp(ev)).as("day"), col("value"))
        .groupBy(col("event_type"), col("series"), col("day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      val cal = daily.groupBy(col("event_type"), col("series"))
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(col("event_type"), col("series"),
          explode(sequence(col("lo"), col("hi"))).as("day"))
      val joined = cal.join(daily, Seq("event_type", "series", "day"), "left")
      val back = Window.partitionBy(col("event_type"), col("series")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy(col("event_type"), col("series")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prevTotal = last(col("total"), ignoreNulls = true).over(back)
      val nextTotal = first(col("total"), ignoreNulls = true).over(fwd)
      val prevDay = last(when(col("total").isNotNull, col("day")), ignoreNulls = true).over(back)
      val nextDay = first(when(col("total").isNotNull, col("day")), ignoreNulls = true).over(fwd)
      val frac = datediff(col("day"), prevDay).cast("double") /
        datediff(nextDay, prevDay).cast("double")
      joined.select(col("event_type"), col("series"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(prevTotal, 6).as("ffill_total"),
        round(when(col("total").isNotNull, col("total"))
          .otherwise(prevTotal + (nextTotal - prevTotal) * frac), 6).as("interp_total"))
    },
    Some("""WITH d AS (SELECT event_type, user_id % 100 AS series, CAST(ts AS DATE) AS day,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2, 3),
      span AS (SELECT event_type, series, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY 1, 2),
      cal AS (SELECT event_type, series, CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
          CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM span),
      j AS (SELECT c.event_type, c.series, c.day, d.n, d.total FROM cal c
        LEFT JOIN d ON c.event_type = d.event_type AND c.series = d.series AND c.day = d.day),
      w AS (SELECT event_type, series, day, n, total,
          LAST_VALUE(total IGNORE NULLS) OVER (PARTITION BY event_type, series ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS prev_total,
          FIRST_VALUE(total IGNORE NULLS) OVER (PARTITION BY event_type, series ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_total,
          LAST_VALUE(CASE WHEN total IS NOT NULL THEN day END IGNORE NULLS)
            OVER (PARTITION BY event_type, series ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS prev_day,
          FIRST_VALUE(CASE WHEN total IS NOT NULL THEN day END IGNORE NULLS)
            OVER (PARTITION BY event_type, series ORDER BY day
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
        FROM j)
      SELECT event_type, series, day, COALESCE(n, 0) AS n,
        ROUND(prev_total, 6) AS ffill_total,
        ROUND(CASE WHEN total IS NOT NULL THEN total
          ELSE prev_total + (next_total - prev_total)
               * (CAST(day - prev_day AS DOUBLE) / CAST(next_day - prev_day AS DOUBLE)) END,
          6) AS interp_total
      FROM w"""))

  val all: Seq[QueryDef] = Seq(tsGapfill)
}
