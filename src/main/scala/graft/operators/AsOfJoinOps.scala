package graft.operators

import graft.QueryDef
import graft.plans.{AsOfJoin, AsOfJoinStrategy}
import graft.util.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{Bridge, PlanBridge}
import org.apache.spark.sql.types.LongType

/** DataFrame API over the custom [[graft.plans.AsOfJoin]] operator, and
  * its registered oracle query. `j6_asof_join` keeps the composed
  * window-over-union route (no extension surface needed); this is the
  * whole-operator route — same semantics, one merge pass, and the two
  * are cross-checked row-for-row in AsOfJoinSpec.
  */
object AsOfJoinOps {

  /** Left-outer point-in-time join: for each `left` row, append
    * `valueCols` from the single `right` row with equal `keys` and the
    * greatest `rightTsCol` at-or-before `leftTsCol` (within
    * `toleranceUs` if given). Timestamp columns must be LongType — the
    * µs normal form every events consumer already uses
    * ([[Tables.tsMicros]]).
    *
    * `tiebreak` pins the winner among right rows sharing (keys, ts) —
    * the last row in ascending tiebreak order — so results are a pure
    * function of the data (and reproducible in an oracle); without it,
    * equal-ts winners would follow partition-internal order.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTsCol: String, rightTsCol: String,
               valueCols: Seq[String], tiebreak: Seq[String] = Nil,
               toleranceUs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    PlanBridge.ensureStrategy(spark, AsOfJoinStrategy)

    // Re-alias every right-side input to a fresh, uniquely-NAMED
    // attribute before building the node. Both sides often scan the
    // same relation (the j6 query filters one events scan twice); the
    // analyzer's DeduplicateRelations then renumbers the right subtree
    // but cannot remap this node's right-side references when the same
    // exprId also lives in the left child (ambiguous) — the classic
    // self-join hazard. Fresh aliases make every right reference
    // unambiguous; the distinct names mean RemoveRedundantAliases
    // (which only strips same-name aliases) can never undo them.
    val rKeyNames = keys.indices.map(i => s"__asof_k$i")
    val tbNames = tiebreak.indices.map(i => s"__asof_tb$i")
    val valNames = valueCols.indices.map(i => s"__asof_v$i")
    val rProj = right.select(
      keys.zip(rKeyNames).map { case (c, n) => col(c).as(n) } ++
        Seq(col(rightTsCol).as("__asof_ts")) ++
        tiebreak.zip(tbNames).map { case (c, n) => col(c).as(n) } ++
        valueCols.zip(valNames).map { case (c, n) => col(c).as(n) }: _*)

    def resolve(df: DataFrame, name: String): Expression = {
      val e = Bridge.expression(df(name))
      require(e.resolved, s"column $name did not resolve")
      e
    }
    def asLong(e: Expression, side: String): Expression = {
      require(e.dataType == LongType,
        s"$side ts column must be LongType µs (got ${e.dataType}); " +
          "normalize with Tables.tsMicros first")
      e
    }
    val rightValues = valNames.map(resolve(rProj, _))
    // fresh output attributes under the CALLER's value names (never
    // right-child pass-throughs), so output exprIds stay unique
    val valueAttrs = rightValues.zip(valueCols).map { case (e, n) =>
      AttributeReference(n, e.dataType, nullable = true)()
    }
    val node = AsOfJoin(
      PlanBridge.analyzed(left), PlanBridge.analyzed(rProj),
      keys.map(resolve(left, _)), rKeyNames.map(resolve(rProj, _)),
      asLong(resolve(left, leftTsCol), "left"),
      asLong(resolve(rProj, "__asof_ts"), "right"),
      rightValues, valueAttrs.toSeq,
      tbNames.map(resolve(rProj, _)), toleranceUs)
    PlanBridge.ofRows(spark, node)
  }

  /** The j6 point-in-time lookup on the custom operator: every click
    * picks up the same user's most recent purchase value at-or-before
    * it. Oracle = the same window formulation `j6_asof_join` uses
    * (DuckDB's native ASOF JOIN leaves equal-timestamp winners
    * unspecified, so the deterministic window form is the comparable
    * truth); the (ts, kind, event_id) window order means a purchase at
    * the click's exact µs wins (allowExactMatches) and among purchases
    * sharing (user, ts) the max event_id wins — precisely the
    * operator's `rightTs <= leftTs` + ascending `event_id` tiebreak.
    */
  /** Click enrichment over a raw events frame via the custom operator —
    * shared by the registered query and the `asof` CLI arm.
    */
  def enrichClicks(raw: DataFrame): DataFrame = {
    val tsUs: Column = Tables.tsMicros(raw)
    val clicks = raw.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), tsUs.as("ts_us"))
    val purchases = raw.filter(col("event_type") === "purchase")
      .select(col("user_id"), tsUs.as("ts_us"), col("event_id"), col("value"))
    asofJoin(clicks, purchases, keys = Seq("user_id"),
      leftTsCol = "ts_us", rightTsCol = "ts_us",
      valueCols = Seq("value"), tiebreak = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        round(coalesce(col("value"), lit(-1.0)), 6).as("asof_value"))
  }

  val j6AsofCustom: QueryDef = QueryDef(
    "j6_asof_custom",
    (s, dir) => enrichClicks(Tables(s, dir, "events")),
    Some("""WITH u AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind,
          CASE WHEN event_type = 'purchase' THEN value END AS pv
        FROM events WHERE event_type IN ('click', 'purchase')),
      f AS (SELECT event_id, user_id, ts_us, kind,
          last_value(pv IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts_us, kind, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS av
        FROM u)
      SELECT event_id, user_id, ts_us,
        round(COALESCE(av, -1.0), 6) AS asof_value
      FROM f WHERE kind = 1"""))

  val all: Seq[QueryDef] = Seq(j6AsofCustom)
}
