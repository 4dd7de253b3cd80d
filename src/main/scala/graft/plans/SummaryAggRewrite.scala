package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Aggregate navigation onto a materialized summary table — the
  * classic OLAP rewrite (Oracle MV rewrite / BigQuery BI Engine /
  * Delta OPTIMIZE+cube pattern): a 100 TB fact table is scanned ONCE
  * to build a per-(dims) summary carrying count, exact-decimal sums,
  * and min/max per measure; every later aggregate whose grouping is a
  * subset of the dims and whose aggregates re-compose from those
  * partials reads the summary instead of the corpus. The rewrite is
  * value-exact by construction for the forms it accepts:
  *
  *   - `COUNT(literal)`          → `SUM(cnt)`               (exact ints)
  *   - `SUM(CAST(m AS DECIMAL))` → `SUM(sum_m)`             (decimal sums
  *     re-aggregate associatively — the graft `dsum` house style; bare
  *     double SUM is deliberately NOT accepted, float reassociation
  *     would change low bits)
  *   - `MIN(m)` / `MAX(m)`       → `MIN(min_m)` / `MAX(max_m)`
  *
  * plus dims-only `Filter`s (a predicate over grouping dims commutes
  * with the group-by pre-aggregation). Anything else — other
  * aggregates, expressions of measures, DISTINCT, agg-level FILTER,
  * global (ungrouped) aggregation (whose empty-input row differs), a
  * filter touching a measure — declines and the plan is untouched.
  *
  * No reference counterpart (cc-pyspark re-reads the corpus per job);
  * this is the `injectOptimizerRule`/`extraOptimizations` leg of the
  * extension surface, conf-gated so it is inert unless a session
  * declares a summary:
  *
  *   spark.graft.summary.fact     path of the fact parquet dir
  *   spark.graft.summary.path     path of the summary built by
  *                                [[writeSummary]]
  *   spark.graft.summary.dims     comma-separated dim columns
  *   spark.graft.summary.measures comma-separated measure columns
  */
object SummaryAggRewrite extends Rule[LogicalPlan] {

  /** Single conf key carrying the whole declaration
    * (`fact|path|dim,dim|measure,measure`): the four fields must be
    * read consistently — concurrent sessions/suites each re-declaring
    * a summary must never interleave a fact from one declaration with
    * a path from another (a torn read could silently aggregate the
    * wrong summary). One key makes every read atomic; a mismatched
    * but CONSISTENT declaration merely declines.
    */
  val ConfKey = "spark.graft.summary"

  /** Declare (or clear, with empty fact) the session's summary.
    *
    * STALENESS CONTRACT (standard MV semantics): the declarer owns
    * refresh. The rule trusts the declaration — if the fact mutates
    * after [[writeSummary]], eligible aggregates read the stale
    * summary until the declarer rebuilds it and re-declares (which
    * also drops the cached relation below). Undeclare with
    * `spark.conf.unset(ConfKey)` to route everything back to the fact.
    */
  def declare(spark: SparkSession, fact: String, path: String,
              dims: Seq[String], measures: Seq[String]): Unit = {
    relCache.remove(canonical(path))
    spark.conf.set(ConfKey,
      s"$fact|$path|${dims.mkString(",")}|${measures.mkString(",")}")
  }

  /** Analyzed summary relation per canonical path — avoids a
    * driver-side file listing + footer read during optimization of
    * every eligible query (the rule's use case is high-frequency
    * dashboard aggregates). Each use takes `newInstance()` for fresh
    * exprIds; [[declare]] drops the entry so a rebuilt summary is
    * re-listed.
    */
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[String, LogicalRelation]()

  /** The decimal type `dsum` accumulates in — the only SUM input type
    * accepted, because decimal re-aggregation is exact.
    */
  private val Dec = DecimalType(25, 6)

  /** One corpus pass: per-dims count + exact-decimal sum + min/max for
    * each measure. The summary is orders of magnitude smaller than the
    * fact (|dims cross-product| rows) and is the only thing rewritten
    * queries scan.
    */
  def writeSummary(fact: DataFrame, dims: Seq[String], measures: Seq[String],
                   path: String): Unit =
    fact.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        measures.flatMap(m => Seq(
          sum(col(m).cast(Dec)).as(s"sum_$m"),
          min(col(m)).as(s"min_$m"),
          max(col(m)).as(s"max_$m"))): _*)
      .write.mode("overwrite").parquet(path)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val decl = conf.getConfString(ConfKey, "")
    if (decl.isEmpty) return plan
    val parts = decl.split("\\|", -1)
    if (parts.length != 4) return plan
    val Array(fact, path, dimsCsv, measCsv) = parts
    if (fact.isEmpty || path.isEmpty) return plan
    val dims = dimsCsv.split(",").map(_.trim).toSet
    val measures = measCsv.split(",").map(_.trim).toSet
    plan.transformDown {
      case agg @ Aggregate(groups, aggExprs, child, _) if groups.nonEmpty =>
        rewrite(agg, groups, aggExprs, child, fact, path, dims, measures)
          .getOrElse(agg)
    }
  }

  /** Scheme+authority+path canonical form: a bare `/x` and `file:/x`
    * must compare equal, but the authority must stay in the key — two
    * buckets with the same path component are different tables, and
    * matching on path alone would rewrite one onto the other's
    * summary.
    */
  private def canonical(s: String): String = {
    val u = new org.apache.hadoop.fs.Path(s).toUri
    val scheme = Option(u.getScheme).getOrElse("file")
    val auth = Option(u.getAuthority).getOrElse("")
    s"$scheme://$auth${u.getPath}"
  }

  /** Strip attribute-only projections and dims-only filters down to
    * the fact scan; returns the filter conditions passed on the way.
    * The scan must read the declared fact and NOTHING ELSE: a
    * multi-path relation that merely includes the fact (fact ∪
    * increment) rewrites to a fact-only summary and silently drops
    * the other paths' rows — so every root path must match.
    */
  private def factScan(p: LogicalPlan, fact: String, dims: Set[String])
      : Option[Seq[Expression]] = p match {
    case Project(projs, c) if projs.forall(_.isInstanceOf[AttributeReference]) =>
      factScan(c, fact, dims)
    case Filter(cond, c) if cond.references.forall(a => dims.contains(a.name)) &&
        cond.deterministic =>
      factScan(c, fact, dims).map(cond +: _)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation
          if fs.location.rootPaths.nonEmpty &&
            fs.location.rootPaths.forall(rp => canonical(rp.toString) == canonical(fact)) =>
        Some(Nil)
      case _ => None
    }
    case _ => None
  }

  private def rewrite(agg: Aggregate, groups: Seq[Expression],
                      aggExprs: Seq[NamedExpression], child: LogicalPlan,
                      fact: String, path: String,
                      dims: Set[String], measures: Set[String]): Option[Aggregate] = {
    val filters = factScan(child, fact, dims).getOrElse(return None)
    if (!groups.forall {
      case a: AttributeReference => dims.contains(a.name)
      case _ => false
    }) return None

    // every AggregateExpression anywhere in the output list must be a
    // supported shape; scan first so a partial match never rewrites
    val aggs = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
    def supported(ae: AggregateExpression): Boolean =
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        // COUNT(NULL) is 0 per group, not the group row count — only a
        // non-null literal (COUNT(*)/COUNT(1)) may map to SUM(cnt)
        case Count(Seq(l: Literal)) if l.value != null => true
        case Sum(Cast(a: AttributeReference, Dec, _, _), _) => measures.contains(a.name)
        // AVG of the decimal-cast measure decomposes into the summary's
        // exact partials: sum = SUM(sum_m) (decimal re-aggregation is
        // exact, and its type equals Average's internal sum buffer over
        // a Dec input), count = SUM(cnt) — then Average's OWN
        // evaluateExpression runs over those, so division semantics are
        // identical by construction. Bare double AVG stays declined
        // (float reassociation). NULL-measure caveat: the summary's cnt
        // counts rows, not non-null measure values, so the decomposed
        // count is exact only for non-nullable measures — declare only
        // non-null measure columns (the fixture fact's are), or extend
        // writeSummary with per-measure non-null counts.
        case Average(Cast(a: AttributeReference, Dec, _, _), _) =>
          measures.contains(a.name)
        case Min(a: AttributeReference) => measures.contains(a.name)
        case Max(a: AttributeReference) => measures.contains(a.name)
        case _ => false
      })
    if (aggs.isEmpty || !aggs.forall(supported)) return None
    // any attribute referenced OUTSIDE an aggregate function must be a
    // dim (measure refs inside the aggs are handled by the agg rewrite)
    def nonAggRefs(e: Expression): Seq[AttributeReference] = e match {
      case _: AggregateExpression => Nil
      case a: AttributeReference => Seq(a)
      case other => other.children.flatMap(nonAggRefs)
    }
    if (!aggExprs.flatMap(nonAggRefs).forall(a => dims.contains(a.name))) return None

    // fresh exprIds per rewrite (newInstance) over the cached analyzed
    // relation, so the same summary can serve several aggs in one plan
    val cached = graft.util.Caches.fill(relCache, canonical(path))(SparkSession.active.read.parquet(path)
        .queryExecution.analyzed.collectFirst { case l: LogicalRelation => l }
        .orNull)
    if (cached == null) return None
    val sumRel = cached.newInstance()
    val byName = sumRel.output.map(a => a.name -> a).toMap
    // the declared summary must actually carry the needed columns
    if (!dims.forall(byName.contains)) return None
    if (!measures.forall(m => byName.contains(s"sum_$m") &&
      byName.contains(s"min_$m") && byName.contains(s"max_$m"))) return None
    if (!byName.contains("cnt")) return None

    def remapAttr(a: AttributeReference): Attribute = byName(a.name)
    def rewriteAgg(ae: AggregateExpression): Expression = {
      val rewritten = ae.aggregateFunction match {
        case Count(Seq(_: Literal)) => ae.copy(aggregateFunction = Sum(byName("cnt")))
        case Sum(Cast(a: AttributeReference, Dec, _, _), _) =>
          ae.copy(aggregateFunction = Sum(byName(s"sum_${a.name}")))
        case avg @ Average(Cast(a: AttributeReference, Dec, _, _), _) =>
          // sum/count decomposition, evaluated by the ORIGINAL Average's
          // evaluateExpression with its buffer attrs substituted — the
          // division (type, scale, overflow mode) is Average's own, so
          // the rewrite cannot change a digit. Types line up exactly:
          // SUM over the decimal(25,6) partial widens to the same
          // decimal(35,6) Average's internal sum buffer uses over a
          // Dec(25,6) input, and SUM(cnt: long) is LongType like its
          // count buffer. Fresh resultIds per partial — two aggregates
          // sharing one resultId would collide in the physical agg.
          val Seq(avgSum, avgCnt) = avg.aggBufferAttributes
          // the summary's sum_m is itself a widened SUM (25,6 → 35,6),
          // so re-summing widens once more (38,6); cast back to
          // Average's sum-buffer type — same scale, exact by the same
          // 25-digit headroom the original aggregation relies on
          val sumPart: Expression = Cast(
            AggregateExpression(Sum(byName(s"sum_${a.name}")),
              ae.mode, ae.isDistinct, ae.filter, NamedExpression.newExprId),
            avgSum.dataType)
          val cntPart = AggregateExpression(Sum(byName("cnt")),
            ae.mode, ae.isDistinct, ae.filter, NamedExpression.newExprId)
          require(cntPart.dataType == avgCnt.dataType,
            s"avg decomposition type drift: ${cntPart.dataType} vs ${avgCnt.dataType}")
          avg.evaluateExpression.transform {
            case b: AttributeReference if b.exprId == avgSum.exprId => sumPart
            case b: AttributeReference if b.exprId == avgCnt.exprId => cntPart
          }
        case Min(a: AttributeReference) =>
          ae.copy(aggregateFunction = Min(byName(s"min_${a.name}")))
        case Max(a: AttributeReference) =>
          ae.copy(aggregateFunction = Max(byName(s"max_${a.name}")))
        case _ => return ae // unreachable: pre-checked
      }
      // re-aggregated partials can widen (sum of decimal sums gains
      // precision digits); cast back so the output type is unchanged.
      // Values fit by the same 25-digit headroom the original relies on.
      if (rewritten.dataType == ae.dataType) rewritten
      else Cast(rewritten, ae.dataType)
    }

    val newGroups = groups.map { case a: AttributeReference => remapAttr(a) }
    // explicit recursion, NOT transformUp: a bottom-up transform would
    // remap the measure attrs inside the aggregate functions (which
    // have no same-name summary column) before the agg case fires
    def rebuild(e: Expression): Expression = e match {
      case ae: AggregateExpression => rewriteAgg(ae)
      case a: AttributeReference => remapAttr(a)
      case other => other.withNewChildren(other.children.map(rebuild))
    }
    val newAggExprs = aggExprs.map { ne =>
      val transformed = rebuild(ne)
      transformed match {
        case a: Attribute =>
          // bare grouping column: keep the original exprId visible
          Alias(a, ne.name)(exprId = ne.exprId, qualifier = ne.qualifier)
        case al: Alias =>
          Alias(al.child, ne.name)(exprId = ne.exprId, qualifier = ne.qualifier)
        case other =>
          Alias(other, ne.name)(exprId = ne.exprId, qualifier = ne.qualifier)
      }
    }
    val newChild = filters.foldLeft(sumRel: LogicalPlan) { (p, cond) =>
      Filter(cond.transformUp { case a: AttributeReference => remapAttr(a) }, p)
    }
    Some(Aggregate(newGroups, newAggExprs, newChild, None))
  }
}
