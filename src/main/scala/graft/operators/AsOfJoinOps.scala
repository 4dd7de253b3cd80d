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
               toleranceUs: Option[Long] = None,
               direction: graft.plans.AsOfDirection = graft.plans.AsOfBackward)
      : DataFrame = {
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
      tbNames.map(resolve(rProj, _)), toleranceUs, direction)
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

  /** Directional variants on the same click/purchase frame: forward =
    * the NEXT purchase at-or-after the click (equal-ts ties to the
    * lowest event_id — the first row in tiebreak order), nearest =
    * closer of backward/forward with equal distance preferring
    * backward. Completes pandas merge_asof's direction surface on the
    * O(1)-state merge.
    */
  def enrichClicksDirectional(raw: DataFrame,
                              direction: graft.plans.AsOfDirection): DataFrame = {
    val tsUs: Column = Tables.tsMicros(raw)
    val clicks = raw.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), tsUs.as("ts_us"))
    val purchases = raw.filter(col("event_type") === "purchase")
      .select(col("user_id"), tsUs.as("ts_us"), col("event_id"), col("value"))
    asofJoin(clicks, purchases, keys = Seq("user_id"),
      leftTsCol = "ts_us", rightTsCol = "ts_us",
      valueCols = Seq("value"), tiebreak = Seq("event_id"),
      direction = direction)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        round(coalesce(col("value"), lit(-1.0)), 6).as("asof_value"))
  }

  /** Forward oracle: first purchase value at-or-after each click. In
    * the window form, purchases must sort AFTER clicks at equal µs
    * (kind: click 0, purchase 1) so an exact-timestamp purchase lands
    * in the CURRENT ROW..FOLLOWING frame; among equal-ts purchases the
    * ascending event_id order makes first_value pick the lowest id —
    * exactly the operator's first-in-tiebreak contract.
    */
  val j6AsofForward: QueryDef = QueryDef(
    "j6_asof_forward",
    (s, dir) => enrichClicksDirectional(Tables(s, dir, "events"),
      graft.plans.AsOfForward),
    Some("""WITH u AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind,
          CASE WHEN event_type = 'purchase' THEN value END AS pv
        FROM events WHERE event_type IN ('click', 'purchase')),
      f AS (SELECT event_id, user_id, ts_us, kind,
          first_value(pv IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts_us, kind, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS av
        FROM u)
      SELECT event_id, user_id, ts_us,
        round(COALESCE(av, -1.0), 6) AS asof_value
      FROM f WHERE kind = 0"""))

  /** Nearest oracle: both directional candidates with their
    * timestamps, then the distance comparison with the backward
    * preference on ties — the operator's exact rule.
    */
  val j6AsofNearest: QueryDef = QueryDef(
    "j6_asof_nearest",
    (s, dir) => enrichClicksDirectional(Tables(s, dir, "events"),
      graft.plans.AsOfNearest),
    Some("""WITH u AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          event_type, value
        FROM events WHERE event_type IN ('click', 'purchase')),
      b AS (SELECT event_id, user_id, ts_us, kind,
          last_value(pv IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts_us, kind, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bv,
          last_value(pts IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts_us, kind, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bts
        FROM (SELECT event_id, user_id, ts_us,
            CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind,
            CASE WHEN event_type = 'purchase' THEN value END AS pv,
            CASE WHEN event_type = 'purchase' THEN ts_us END AS pts
          FROM u)),
      fw AS (SELECT event_id, kind2,
          first_value(pv2 IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts_us, kind2, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fv,
          first_value(pts2 IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts_us, kind2, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fts
        FROM (SELECT event_id, user_id, ts_us,
            CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind2,
            CASE WHEN event_type = 'purchase' THEN value END AS pv2,
            CASE WHEN event_type = 'purchase' THEN ts_us END AS pts2
          FROM u)),
      j AS (SELECT b.event_id, b.user_id, b.ts_us, b.bv, b.bts, fw.fv, fw.fts
        FROM b JOIN fw ON fw.event_id = b.event_id AND fw.kind2 = 1
        WHERE b.kind = 1)
      SELECT event_id, user_id, ts_us,
        round(COALESCE(
          CASE WHEN bts IS NOT NULL AND
                    (fts IS NULL OR (ts_us - bts) <= (fts - ts_us)) THEN bv
               WHEN fts IS NOT NULL THEN fv END, -1.0), 6) AS asof_value
      FROM j"""))

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

  val all: Seq[QueryDef] = Seq(j6AsofCustom, j6AsofForward, j6AsofNearest)
}
