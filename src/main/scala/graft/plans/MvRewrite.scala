package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Materialized-view rewrite: an optimizer [[Rule]] that answers an
  * aggregate over a fact table — or over a fact⋈dim STAR JOIN — from a
  * pre-aggregated summary when the query's grouping keys are a subset
  * of the view's dimensions and its aggregates are derivable from the
  * view's measures (COUNT(*) ← SUM(view.n), SUM(x) ← SUM(view.sum_x) —
  * the classic rollup property). This is THE warehouse scale lever: a
  * 100 TB fact scan (and its dimension join) collapses to a
  * dimension-cardinality summary scan, and because the rewrite happens
  * in Catalyst the query author keeps writing the query against the
  * base tables — exactly how production MV/cube engines surface it.
  *
  * Correctness posture: the rule rewrites ONLY when every grouping
  * expression and every aggregate input matches the view definition
  * under Catalyst semantic equality ([[Expression.semanticEquals]]
  * after substituting projection aliases down to the base relation(s)
  * and remapping the definition's attribute ids onto the query's), and
  * — for star views — when the query joins the SAME two base reads
  * INNER on a semantically equal condition (sides may appear in either
  * order; canonicalization makes a=b ≡ b=a). The rewritten Aggregate
  * preserves the original output attribute ids, so parent operators
  * are untouched. Anything else — extra filters not expressible over
  * view dimensions, unknown aggregate shapes, DISTINCT, agg filters,
  * outer/other join types, nested joins, self-joins — bails to the
  * original plan. The q42/q58 faces then prove semantic preservation
  * end-to-end: the oracle computes the same aggregate from the BASE
  * tables and the hashes must match.
  *
  * Single-JVM stand-in: [[MvCatalog]] is a process-local registry; on
  * a cluster this is a catalog service lookup, the rule itself is
  * unchanged.
  */
object MvCatalog {

  /** The view definition's base shape: one relation, or exactly one
    * inner-joined pair (the star fact⋈dim case). */
  private[plans] sealed trait BaseShape
  private[plans] final case class RelBase(rel: LogicalRelation)
    extends BaseShape
  private[plans] final case class StarBase(left: LogicalRelation,
      right: LogicalRelation, cond: Expression) extends BaseShape

  /** Matching signature stored per view. */
  sealed trait BaseSig
  /** Single-relation view: match queries reading these root paths. */
  final case class RelSig(paths: Set[String]) extends BaseSig
  /** Star view: the two sides' root paths, THEIR base attribute
    * outputs (for id→query remapping), and the join condition over
    * those attributes. */
  final case class StarSig(leftPaths: Set[String], leftOut: Seq[Attribute],
      rightPaths: Set[String], rightOut: Seq[Attribute],
      cond: Expression) extends BaseSig

  /** One registered view: its base signature, its definition
    * re-expressed over the base relations' attributes, and the
    * analyzed scan of its materialized data. */
  final case class Entry(
      name: String,
      sig: BaseSig,
      dims: Seq[Expression],
      measures: Seq[Measure],
      mvPlan: LogicalPlan)

  sealed trait Measure { def mvAttr: Attribute }
  /** COUNT(*) measure: derivable by SUM(mvAttr). */
  final case class CountMeasure(mvAttr: Attribute) extends Measure
  /** SUM(input) measure: derivable by SUM(mvAttr) when the query sums
    * a semantically equal input. */
  final case class SumMeasure(input: Expression, mvAttr: Attribute)
    extends Measure

  private val entries = new ConcurrentHashMap[String, Entry]()

  def clear(): Unit = entries.clear()

  /** Deregister one view. Serving faces MUST call this after
    * materializing their result: the catalog is process-global, so a
    * leaked entry would silently answer every later matching aggregate
    * over the same base paths from the MV snapshot — stale data after
    * a base rewrite, and skewed timings for unrelated queries. */
  def remove(name: String): Unit = entries.remove(name)

  def registered: Seq[Entry] = {
    import scala.jdk.CollectionConverters._
    entries.values().asScala.toSeq
  }

  /** Substitute projection aliases so `e` references only base
    * relation attributes. */
  private def subst(e: Expression, m: Map[Attribute, Expression])
      : Expression =
    e.transformUp { case a: Attribute if m.contains(a) => m(a) }

  /** [[subst]] for the rule's query-side peel. */
  private[plans] def substPub(e: Expression,
      m: Map[Attribute, Expression]): Expression = subst(e, m)

  /** Fold constant subtrees the way the optimizer's ConstantFolding
    * does: query plans reach [[MvRewriteRule]] AFTER constant folding,
    * so stored definition expressions must be folded the same way for
    * semanticEquals to line up (e.g. `cast(100 as double)` vs
    * `100.0`). */
  private def fold(e: Expression): Expression = e.transformUp {
    case f if f.foldable && !f.isInstanceOf[Literal] =>
      Literal.create(f.eval(null), f.dataType)
  }

  /** Walk Project chains down to the base shape — a LogicalRelation,
    * or ONE Inner Join whose sides are themselves projection chains
    * over a LogicalRelation — composing alias substitutions; None for
    * any other operator (filters are out of DEFINITION scope by
    * design: a filtered view definition would change the view's
    * semantics). */
  private[plans] def baseAndSubst(plan: LogicalPlan)
      : Option[(BaseShape, Map[Attribute, Expression])] = plan match {
    case rel: LogicalRelation => Some((RelBase(rel), Map.empty))
    case Project(projList, child) =>
      baseAndSubst(child).map { case (shape, inner) =>
        val m = projList.map {
          case a: Alias => (a.toAttribute: Attribute) -> subst(a.child, inner)
          case a: AttributeReference => (a: Attribute) -> subst(a, inner)
        }.toMap
        (shape, m)
      }
    case Join(l, r, Inner, Some(cond), _) =>
      (baseAndSubst(l), baseAndSubst(r)) match {
        case (Some((RelBase(lr), lm)), Some((RelBase(rr), rm))) =>
          val m = lm ++ rm // disjoint attribute ids by construction
          Some((StarBase(lr, rr, subst(cond, m)), m))
        case _ => None // nested joins are out of scope
      }
    case _ => None
  }

  private[plans] def rootPaths(rel: LogicalRelation): Set[String] =
    rel.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.rootPaths.map(_.toString).toSet
      case _ => Set.empty
    }

  /** Register `definition` (an un-materialized groupBy().agg() over a
    * parquet-backed base table or a fact⋈dim inner join of two) with
    * its materialized parquet at `mvPath`. Parses the definition's
    * analyzed plan once; throws on shapes the rewrite cannot serve
    * (fail loudly at registration, not silently at query time). */
  def register(spark: SparkSession, name: String, definition: DataFrame,
      mvPath: String): Unit = {
    val mvDf = spark.read.parquet(mvPath)
    val mvOut = mvDf.queryExecution.analyzed.output
    val byName = mvOut.map(a => a.name -> a).toMap
    definition.queryExecution.analyzed match {
      case Aggregate(dims, aggs, child, _) =>
        val (shape, sub) = baseAndSubst(child).getOrElse(
          throw new IllegalArgumentException(
            s"mv $name: definition child is not Project*/Join/LogicalRelation"))
        val sig = shape match {
          case RelBase(rel) =>
            val p = rootPaths(rel)
            require(p.nonEmpty, s"mv $name: base relation has no root paths")
            RelSig(p)
          case StarBase(l, r, cond) =>
            val (lp, rp) = (rootPaths(l), rootPaths(r))
            require(lp.nonEmpty && rp.nonEmpty,
              s"mv $name: star side has no root paths")
            require(lp != rp,
              s"mv $name: self-joins are not rewrite-servable")
            StarSig(lp, l.output, rp, r.output, fold(cond))
        }
        val baseDims = dims.map(d => fold(subst(d, sub)))
        val measures = aggs.flatMap {
          case a @ Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
            val attr = byName.getOrElse(a.name, throw new
                IllegalArgumentException(s"mv $name: no column ${a.name}"))
            fn match {
              case Count(Seq(Literal(1, _))) => Some(CountMeasure(attr))
              case Sum(input, _) =>
                Some(SumMeasure(fold(subst(input, sub)), attr))
              case other => throw new IllegalArgumentException(
                s"mv $name: unsupported measure ${other.prettyName}")
            }
          case _ => None // grouping passthrough
        }
        entries.put(name, Entry(name, sig, baseDims, measures,
          mvDf.queryExecution.analyzed))
      case other => throw new IllegalArgumentException(
        s"mv $name: definition is not a plain Aggregate: ${other.nodeName}")
    }
  }

  /** The dim → mv-scan-attribute pairing for an entry: dim i's values
    * live in the mv column named after the definition's i-th output. */
  private[plans] def dimAttrs(e: Entry): Seq[Attribute] = {
    // definition outputs groupings first, in order; mv columns carry
    // the same names in the same positions
    e.mvPlan.output.take(e.dims.length)
  }
}

/** The rewrite rule proper; injected via
  * [[graft.functions.GraftExtensions]] into the operator-optimization
  * batch. No-op while the catalog is empty. */
case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import MvCatalog._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvCatalog.registered.isEmpty) plan
    else plan.transformDown {
      case agg @ Aggregate(_, _, _, _) => tryRewrite(agg).getOrElse(agg)
    }

  private def subst(e: Expression, m: Map[Attribute, Expression])
      : Expression =
    e.transformUp { case a: Attribute if m.contains(a) => m(a) }

  /** Walk Project/Filter/Inner-Join chains down to the base shape,
    * composing alias substitutions and conjoining filter predicates
    * (substituted down to base-relation attributes). Filters are in
    * scope here — unlike [[MvCatalog.baseAndSubst]], which
    * registration uses and which rejects them (a filtered VIEW
    * DEFINITION would change the view's semantics; a filtered QUERY is
    * the classic filter-to-dimension pushdown, handled in
    * [[rewriteWith]]). A filter below an INNER join hoists above it
    * unchanged (inner-join/filter commutativity), which is exactly
    * where the optimizer usually pushed it down from. */
  private def peel(plan: LogicalPlan): Option[
      (BaseShape, Map[Attribute, Expression], Option[Expression])] =
    plan match {
      case rel: LogicalRelation => Some((RelBase(rel), Map.empty, None))
      case Project(projList, child) =>
        peel(child).map { case (shape, inner, cond) =>
          val m = projList.map {
            case a: Alias =>
              (a.toAttribute: Attribute) -> MvCatalog.substPub(a.child, inner)
            case a: AttributeReference =>
              (a: Attribute) -> MvCatalog.substPub(a, inner)
          }.toMap
          (shape, m, cond)
        }
      case Filter(cond, child) =>
        peel(child).map { case (shape, inner, prev) =>
          val c = MvCatalog.substPub(cond, inner)
          (shape, inner, Some(prev.map(p => And(p, c)).getOrElse(c)))
        }
      case Join(l, r, Inner, Some(cond), _) =>
        (peel(l), peel(r)) match {
          case (Some((RelBase(lr), lm, lc)), Some((RelBase(rr), rm, rc))) =>
            val m = lm ++ rm
            val hoisted = (lc ++ rc).reduceOption(And(_, _))
            Some((StarBase(lr, rr, MvCatalog.substPub(cond, m)), m, hoisted))
          case _ => None // nested joins are out of scope
        }
      case _ => None
    }

  /** Remap an entry-side expression (over the STORED base attribute
    * ids) onto the query's base attributes, by (side, name). Returns
    * None when any attribute fails to remap. */
  private def remapWith(attrMap: AttributeReference => Option[Expression])
      (e: Expression): Option[Expression] = {
    var ok = true
    val out = e.transformUp {
      case a: AttributeReference =>
        attrMap(a) match {
          case Some(q) => q
          case None => ok = false; a
        }
    }
    if (ok) Some(out) else None
  }

  /** Find the entry matching the query's base shape, returning the
    * stored→query attribute remapper alongside. */
  private def findEntry(shape: BaseShape)
      : Option[(Entry, Expression => Option[Expression])] = shape match {
    case RelBase(rel) =>
      val p = rootPaths(rel)
      if (p.isEmpty) None
      else {
        val byName = rel.output.map(a => a.name -> (a: Expression)).toMap
        registered.collectFirst {
          case e if e.sig == RelSig(p) =>
            (e, remapWith(a => byName.get(a.name)) _)
        }
      }
    case StarBase(ql, qr, qcond) =>
      val (qlp, qrp) = (rootPaths(ql), rootPaths(qr))
      if (qlp.isEmpty || qrp.isEmpty || qlp == qrp) None
      else registered.iterator.flatMap { e =>
        e.sig match {
          case s: StarSig =>
            // the query may list the sides in either order
            val pairing =
              if (s.leftPaths == qlp && s.rightPaths == qrp) Some((ql, qr))
              else if (s.leftPaths == qrp && s.rightPaths == qlp)
                Some((qr, ql))
              else None
            pairing.flatMap { case (qLeft, qRight) =>
              val lByName = qLeft.output.map(a => a.name -> (a: Expression)).toMap
              val rByName = qRight.output.map(a => a.name -> (a: Expression)).toMap
              val lIds = AttributeSet(s.leftOut)
              val rIds = AttributeSet(s.rightOut)
              val remap = remapWith { a =>
                if (lIds.contains(a)) lByName.get(a.name)
                else if (rIds.contains(a)) rByName.get(a.name)
                else None
              } _
              // the join conditions must agree semantically once the
              // stored one is remapped onto the query's attributes
              remap(s.cond).filter(_.semanticEquals(qcond))
                .map(_ => (e, remap))
            }
          case _ => None
        }
      }.nextOption()
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val Aggregate(gExprs, aExprs, child, _) = agg
    for {
      (shape, sub, filterCond) <- peel(child)
      (entry, remap) <- findEntry(shape)
      rewritten <- rewriteWith(entry, remap, gExprs, aExprs, sub, filterCond)
    } yield rewritten
  }

  private def rewriteWith(entry: Entry,
      remap: Expression => Option[Expression],
      gExprs: Seq[Expression], aExprs: Seq[NamedExpression],
      sub: Map[Attribute, Expression],
      filterCond: Option[Expression]): Option[LogicalPlan] = {
    // remap the stored definition (expressed over ITS base reads'
    // attribute ids) onto this query's base reads, by (side, name)
    val dims = entry.dims.map(remap)
    val mvDims = dimAttrs(entry)
    if (dims.exists(_.isEmpty)) return None
    val dimPairs = dims.map(_.get).zip(mvDims)

    def matchDim(e: Expression): Option[Attribute] =
      dimPairs.collectFirst {
        case (d, mv) if subst(e, sub).semanticEquals(d) => mv }

    // every grouping key must be one of the view's dimensions
    val newGroups = gExprs.map(matchDim)
    if (newGroups.exists(_.isEmpty)) return None

    // the filter predicate (if any, already substituted down to base
    // attributes by the peel) must rewrite into an expression over the
    // MV's dimension columns alone: replace every maximal subtree that
    // IS a view dimension with the mv attribute, then require no
    // base-relation attribute survives
    val newFilter: Option[Option[Expression]] = filterCond.map { cond =>
      val onMv = cond.transformDown {
        case e if dimPairs.exists(_._1.semanticEquals(e)) =>
          dimPairs.find(_._1.semanticEquals(e)).get._2
      }
      if (onMv.references.subsetOf(AttributeSet(entry.mvPlan.output)))
        Some(onMv)
      else None
    }
    if (newFilter.exists(_.isEmpty)) return None

    // the derived aggregate must keep the ORIGINAL result type: a
    // COUNT(*) is LongType and SUM(n:long) is LongType, but e.g. a
    // DECIMAL sum re-summed from the MV widens precision — parents
    // hold the old attribute type, so any dataType drift bails
    def matchMeasure(fn: org.apache.spark.sql.catalyst.expressions
        .aggregate.AggregateFunction): Option[Attribute] = {
      val mv = fn match {
        case Count(Seq(Literal(1, _))) =>
          entry.measures.collectFirst { case CountMeasure(m) => m }
        case Sum(input, _) =>
          val q = subst(input, sub)
          entry.measures.collectFirst {
            case SumMeasure(defIn, m)
              if remap(defIn).exists(q.semanticEquals) => m }
        case _ => None
      }
      mv.filter(m => Sum(m).dataType == fn.dataType)
    }

    // COUNT(*) over an EMPTY base yields 0, but SUM over the empty MV
    // yields NULL — only reachable for the global (no grouping)
    // aggregate, where the base side still emits its one row; coalesce
    // restores the 0. Grouped counts never see the seam (no groups →
    // no rows on both sides).
    def derive(fn: org.apache.spark.sql.catalyst.expressions
        .aggregate.AggregateFunction, mv: Attribute): Expression = {
      val sum = AggregateExpression(Sum(mv), Complete, isDistinct = false)
      fn match {
        case Count(_) if gExprs.isEmpty =>
          Coalesce(Seq(sum, Literal(0L)))
        case _ => sum
      }
    }

    val newAggs: Seq[Option[NamedExpression]] = aExprs.map {
      case a @ Alias(AggregateExpression(fn, Complete, false, None, _), name) =>
        matchMeasure(fn).map(mv =>
          Alias(derive(fn, mv), name)(exprId = a.exprId))
      case a: AttributeReference =>
        matchDim(a).map(mv => Alias(mv, a.name)(exprId = a.exprId))
      case a @ Alias(childE, name) if !childE.exists(
          _.isInstanceOf[AggregateExpression]) =>
        matchDim(childE).map(mv => Alias(mv, name)(exprId = a.exprId))
      case _ => None
    }
    if (newAggs.exists(_.isEmpty)) return None
    val mvChild = newFilter.flatten match {
      case Some(cond) => Filter(cond, entry.mvPlan)
      case None => entry.mvPlan
    }
    Some(Aggregate(newGroups.map(_.get), newAggs.map(_.get), mvChild,
      None))
  }
}
