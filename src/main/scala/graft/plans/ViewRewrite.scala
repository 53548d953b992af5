package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Divide, EvalMode, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, ShortType}

/** A registered materialized aggregate view: queries that group the fact
  * at `basePath` by a subset of `keys` and compute distributive
  * aggregates over `values` can be answered from the maintained state
  * table instead of the fact.
  *
  * `viewPlan` is a thunk so every rewrite sees the CURRENT committed
  * snapshot (an [[graft.operators.IncrementalAgg]] root advances with
  * each ingest) and gets fresh expression ids (each call builds a new
  * scan, so one query using the view twice cannot alias attributes).
  *
  * Registering a view is the staleness contract: the caller asserts the
  * maintained state covers every fact row at `basePath` exactly once.
  * Under that contract the rewrite is an identity on RESULTS — only the
  * plan changes, from a full fact scan to a key-cardinality view scan.
  */
final case class MaterializedViewDef(
    name: String,
    basePath: String,
    keys: Seq[String],
    values: Seq[String],
    viewPlan: () => LogicalPlan) {
  /** Normalized path for scan matching. */
  def pathKey: String = ViewRewrite.normalize(basePath)
}

/** Catalyst optimizer rule that rewrites matching aggregates over a
  * registered fact scan to re-aggregate the incrementally-maintained
  * view instead (classic materialized-view rewrite — Goldstein &
  * Larson, SIGMOD'01 "Optimizing queries using materialized views").
  *
  * The 100 TB story: the maintained state is |keys| rows, kept current
  * by [[graft.operators.IncrementalAgg.ingest]] paying one scan of each
  * NEW batch. With this rule installed, every dashboard-style rollup
  * over the fact — `GROUP BY subset-of-keys` with count/sum/min/max —
  * silently pays the view's key-cardinality scan instead of the
  * 100 TB fact scan. The re-aggregation form (count→sum of cnt, sum→sum
  * of sums, min→min of mins, max→max of maxes) makes any SUBSET of the
  * view keys servable, not just exact key matches.
  *
  * Soundness guards — the rewrite bails (leaving the plan untouched)
  * unless ALL hold:
  *   - the scan is the registered fact path (V1 parquet relation);
  *   - between aggregate and scan there are only attribute-projections
  *     and DETERMINISTIC filters whose references are all view KEY
  *     columns (a filter on a key partitions groups whole, so it
  *     commutes with the view; a non-deterministic filter — rand()
  *     sampling — would silently turn per-row sampling into per-GROUP
  *     sampling when relocated, so it bails);
  *   - every grouping expression is a bare key column;
  *   - every aggregate is non-distinct, unfiltered count(literal) /
  *     count(v) / sum / min / max / avg whose child is a value column
  *     (bare integral attribute, or `CAST(value AS BIGINT)` — the view
  *     stores exact BIGINT summaries, so both re-aggregate
  *     losslessly); avg serves as Σsum_v / Σcnt_v and count(v) as
  *     Σcnt_v, where cnt_v is the view's per-value NON-NULL count —
  *     avg's and count(v)'s true divisor/value on a fact with NULLs in
  *     v (Σcnt, the row count, would silently deflate the mean; a view
  *     snapshot predating cnt_v bails to the base plan); count(*)
  *     serves as coalesce(Σcnt, 0), preserving COUNT's
  *     non-nullable-zero contract on an empty global aggregate;
  *   - the mapped expression's data type equals the original's (so an
  *     `INT`-typed `min(v)` over an `INT` column is NOT served by the
  *     view's BIGINT `min_v` — the caller must cast, keeping the
  *     rewrite bit-exact rather than silently widening).
  *
  * Replacement output reuses the original names AND expression ids, so
  * operators above the aggregate (sorts, havings, joins) are untouched.
  * The rule converges: a rewritten aggregate scans the view's path,
  * which is never a registered base path, so it cannot match again.
  */
case class GraftViewRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // fewest keys first: when several registered views can serve the
    // same aggregate, the coarsest one has the smallest state table —
    // key cardinality IS the view's scan cost
    val views = ViewRewrite.viewsFor(spark).sortBy(_.keys.length)
    if (views.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate =>
        views.view.flatMap(d => tryRewrite(agg, d)).headOption.getOrElse(agg)
    }
  }

  private object Bail extends Exception { override def fillInStackTrace(): Throwable = this }
  @inline private def need(cond: Boolean): Unit = if (!cond) throw Bail

  /** Unwraps attribute-only projections and filters down to a V1 file
    * scan; returns the filter conditions met on the way. */
  private def stripToScan(plan: LogicalPlan): Option[(Seq[Expression], LogicalRelation)] = {
    var filters = List.empty[Expression]
    var cur = plan
    while (true) cur match {
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        cur = child
      case Filter(cond, child) =>
        filters ::= cond; cur = child
      case lr: LogicalRelation =>
        return Some((filters, lr))
      case _ =>
        return None
    }
    None // unreachable
  }

  private def scanPaths(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.map(p => ViewRewrite.normalize(p.toString))
    case _ => Nil
  }

  /** The registered value column a sum/min/max child reads, if the
    * child is a form the BIGINT view summaries reproduce exactly. */
  private def valueOf(child: Expression, d: MaterializedViewDef): String = child match {
    case a: AttributeReference if d.values.contains(a.name) &&
        (a.dataType == LongType || a.dataType == IntegerType || a.dataType == ShortType) =>
      a.name
    case Cast(a: AttributeReference, LongType, _, _) if d.values.contains(a.name) &&
        (a.dataType == IntegerType || a.dataType == ShortType || a.dataType == LongType) =>
      a.name
    case _ => throw Bail
  }

  /** Structural prefilter — MUST pass before the view thunk is ever
    * dereferenced. This ordering is load-bearing: the thunk reads the
    * maintained state, and a registration whose state is mid-rebuild
    * (or stale) must not be able to break queries that were never
    * going to be served by the view — the ingest that REFRESHES a
    * view aggregates the same fact table it is registered over, and
    * round 9's bench caught exactly that recursion. */
  private def structurallyMatches(agg: Aggregate, filters: Seq[Expression],
      d: MaterializedViewDef): Boolean = {
    val groupingsOk = agg.groupingExpressions.forall {
      case a: AttributeReference => d.keys.contains(a.name)
      case _ => false
    }
    // deterministic-only: a reference-free non-deterministic predicate
    // (rand() < p) passes the key-column check vacuously, but relocating
    // it from per-fact-row to per-view-group evaluation silently turns
    // row sampling into group sampling
    val filtersOk = filters.forall(f => f.deterministic &&
      f.references.forall(a => d.keys.contains(a.name)))
    var usesValue = false
    val aggsOk = agg.aggregateExpressions.forall {
      case _: AttributeReference => true // grouping output; exprId-checked later
      case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          // count(*) / count(1) — served from Σcnt; count(v) over a
          // registered value column — served from Σcnt_v (the per-value
          // NON-NULL count the view maintains, count(v)'s exact value)
          case c: Count if c.children.length == 1 =>
            c.children.head match {
              case l: Literal => l.value != null
              case child =>
                scala.util.Try(valueOf(child, d)).isSuccess && { usesValue = true; true }
            }
          case s: Sum => scala.util.Try(valueOf(s.child, d)).isSuccess && { usesValue = true; true }
          case m: Min => scala.util.Try(valueOf(m.child, d)).isSuccess && { usesValue = true; true }
          case m: Max => scala.util.Try(valueOf(m.child, d)).isSuccess && { usesValue = true; true }
          case a: Average => scala.util.Try(valueOf(a.child, d)).isSuccess && { usesValue = true; true }
          case _ => false
        }
      case _ => false
    }
    // Any metric must actually use the view (not count-only): a
    // count-only match is more likely an unrelated rollup the user
    // never meant to serve from this view.
    groupingsOk && filtersOk && aggsOk && usesValue
  }

  private def tryRewrite(agg: Aggregate, d: MaterializedViewDef): Option[Aggregate] =
    try {
      val (filters, scan) = stripToScan(agg.child).getOrElse(throw Bail)
      need(scanPaths(scan).contains(d.pathKey))
      need(structurallyMatches(agg, filters, d))

      var usesValue = false

      // Only a structurally-matching query dereferences the thunk; a
      // broken or mid-rebuild registration degrades to the un-rewritten
      // (still correct, just slower) base plan instead of failing the
      // query.
      val vplan = scala.util.Try(d.viewPlan()).getOrElse {
        logWarning(s"view '${d.name}' over ${d.pathKey} is registered but " +
          "unreadable — serving the query from the base table")
        throw Bail
      }
      val vAttr: Map[String, Attribute] = vplan.output.map(a => a.name -> a).toMap
      // every view-column dereference goes through vGet so a custom
      // MaterializedViewDef missing any summary column (min_*/max_*
      // included) BAILS to the base plan instead of throwing
      // NoSuchElementException out of the optimizer
      def vGet(n: String): Attribute = vAttr.getOrElse(n, throw Bail)
      need(d.keys.forall(vAttr.contains) && vAttr.contains("cnt") &&
        d.values.forall(v => vAttr.contains(s"sum_$v")))

      val gKeys: Seq[AttributeReference] = agg.groupingExpressions.map {
        case a: AttributeReference if d.keys.contains(a.name) &&
            vAttr(a.name).dataType == a.dataType => a
        case _ => throw Bail
      }

      val newFilters = filters.map(_.transform {
        case a: AttributeReference =>
          need(d.keys.contains(a.name) && vAttr(a.name).dataType == a.dataType)
          vAttr(a.name)
      })

      val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: AttributeReference if gKeys.exists(_.exprId == a.exprId) =>
          Alias(vAttr(a.name), a.name)(exprId = a.exprId)
        case al @ Alias(ae: AggregateExpression, name) =>
          need(!ae.isDistinct && ae.filter.isEmpty)
          // fresh resultId per replacement: the avg case derives TWO
          // aggregates from one original, and copies sharing the
          // original's resultId would bind to the same result slot
          // (both legs of Σsum/Σcnt reading one value)
          def reagg(fn: AggregateFunction): AggregateExpression =
            ae.copy(aggregateFunction = fn,
              resultId = NamedExpression.newExprId)
          val repl: Expression = ae.aggregateFunction match {
            case c: Count =>
              need(c.children.length == 1)
              // count(*)/count(1) re-aggregates Σcnt; count(v) over a
              // registered value column re-aggregates Σcnt_v — its
              // exact non-null count (vGet bails on a pre-cnt_v view).
              // coalesce preserves COUNT's contract on an empty GLOBAL
              // aggregate (COUNT → non-nullable 0; bare SUM → nullable
              // NULL); per-group it is transparent (cnt is never null)
              val src = c.children.head match {
                case l: Literal => need(l.value != null); vGet("cnt")
                case child =>
                  usesValue = true
                  vGet(s"cnt_${valueOf(child, d)}")
              }
              Coalesce(Seq(reagg(new Sum(src)), Literal(0L)))
            case s: Sum =>
              usesValue = true
              reagg(s.withNewChildren(Seq(vGet(s"sum_${valueOf(s.child, d)}")))
                .asInstanceOf[AggregateFunction])
            case m: Min =>
              usesValue = true
              reagg(m.withNewChildren(Seq(vGet(s"min_${valueOf(m.child, d)}")))
                .asInstanceOf[AggregateFunction])
            case m: Max =>
              usesValue = true
              reagg(m.withNewChildren(Seq(vGet(s"max_${valueOf(m.child, d)}")))
                .asInstanceOf[AggregateFunction])
            case a: Average =>
              // the weighted re-aggregation: avg(v) = Σsum_v / Σcnt_v.
              // Per-group means must NOT average directly (groups merge
              // with different weights), and the divisor must be the
              // NON-NULL value count the view maintains per value column
              // — the base plan's avg divides by count(v), not count(*),
              // so Σcnt would silently deflate the mean on a fact with
              // NULLs in v (round-10 advice; vGet bails to the base plan
              // on a pre-cnt_v view snapshot). Both sums are exact
              // BIGINTs, so the division sees the same two integers the
              // base plan's double accumulation produces (exact below
              // 2^53). LEGACY divide: NULL (never an ANSI error) on the
              // empty global aggregate or an all-NULL value column,
              // matching avg-over-no-rows / avg-over-all-NULLs.
              usesValue = true
              need(a.dataType == DoubleType)
              val v = valueOf(a.child, d)
              Divide(
                Cast(reagg(new Sum(vGet(s"sum_$v"))), DoubleType),
                Cast(reagg(new Sum(vGet(s"cnt_$v"))), DoubleType),
                EvalMode.LEGACY)
            case _ => throw Bail
          }
          need(repl.dataType == ae.dataType)
          Alias(repl, name)(exprId = al.exprId)
        case _ => throw Bail
      }
      need(usesValue)

      val newChild = newFilters.foldLeft(vplan)((p, c) => Filter(c, p))
      logInfo(s"graft view rewrite: aggregate over ${d.pathKey} served by view '${d.name}'")
      Some(Aggregate(gKeys.map(a => vAttr(a.name)), newAggExprs, newChild))
    } catch { case Bail => None }
}

object ViewRewrite {

  private val registry =
    new ConcurrentHashMap[SparkSession, Map[String, MaterializedViewDef]]()

  private[plans] def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  def viewsFor(spark: SparkSession): Seq[MaterializedViewDef] =
    Option(registry.get(spark)).map(_.values.toSeq).getOrElse(Nil)

  /** Register (or replace, by name) a view for this session. The rule
    * must also be installed ([[ensureInstalled]] or the
    * `spark.sql.extensions=graft.expressions.GraftExtensions` route). */
  def register(spark: SparkSession, d: MaterializedViewDef): Unit =
    registry.compute(spark, (_, m) =>
      (if (m == null) Map.empty[String, MaterializedViewDef] else m) + (d.name -> d))

  def deregister(spark: SparkSession, name: String): Unit =
    registry.computeIfPresent(spark, (_, m) => m - name)

  def clear(spark: SparkSession): Unit = registry.remove(spark)

  /** Runtime installation for sessions built without the extensions
    * config: appends the rule to the session's experimental optimizer
    * batch ("User Provided Optimizers", which runs after the main
    * operator-optimization batches — by then the plan above the scan is
    * exactly the project/filter/aggregate residue the matcher strips).
    * Idempotent per session. */
  def ensureInstalled(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[GraftViewRewrite]))
      spark.experimental.extraOptimizations = cur :+ GraftViewRewrite(spark)
  }
}
