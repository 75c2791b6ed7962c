package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal,
  PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, StringType}

/** AUTOMATIC secondary-index access for plain FILTERS — the classic
  * "planner uses the index" move, so `SELECT ... FROM t WHERE email =
  * 'x'` (or `IN (...)`, or `BETWEEN` on a range-layout index) reads
  * the probed values' base buckets instead of scanning a 100 TB table.
  * The explicit faces ([[SecondaryIndex.lookupBy]]/`graft_index_lookup`)
  * already serve callers who KNOW the index exists; this rule serves
  * the SQL user who just writes the predicate.
  *
  * Shape: a conjunct pinning a non-key column `a` to literals —
  * equality, `IN`/`INSET`, or a bounded range (`lo <= a <= hi`, any
  * strictness, range-layout string indexes only) — where `a`'s leaf is
  * a graft v2 relation and a REGISTERED single-column
  * [[SecondaryIndex]] covers `a`. The literal values resolve to base
  * keys through one pruned index lookup ([[SecondaryIndex.keysOf]] /
  * [[SecondaryIndex.keysInRange]], complete-or-decline under
  * `spark.graft.autoProbeJoin.maxKeys`), and a superset
  * `key IN (<keys>)` filter lands directly above the leaf — the
  * original predicate stays for row-level exactness (an
  * inclusive-widened range probe may admit boundary rows), so
  * correctness never depends on the index's CONTENT, only on its
  * COMPLETENESS.
  *
  * Completeness is the [[AutoPrune.freshIndexOn]] gate shared with
  * [[AutoProbeJoin]]'s index leg: the rewrite fires only when the
  * index has applied EXACTLY the version being served, and it PINS the
  * scan to that version (the GraftAggScan snapshot discipline) — so an
  * index answer can never hide a row committed between planning and
  * execution, and a lagging index declines to the plain scan. A probed
  * value ABSENT from a fresh index proves no base row holds it: the
  * empty key set collapses the scan to `Filter(false)` (zero I/O).
  *
  * Probes once per fact relation per optimization pass (the
  * [[AutoPrune.alreadyConstrained]] guard on the KEY attribute stops
  * fixed-point re-probing, and a user's own key predicate suppresses
  * the rewrite — their filter already prunes). The index lookup is
  * bounded planning-time driver work, the established probe
  * discipline. Disable with
  * `spark.graft.autoIndexFilter.enabled = false`.
  */
class AutoIndexFilter(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {
  import AutoIndexFilter._
  import AutoPrune.LeafInfo

  private def conf(key: String, dflt: String): String =
    spark.sessionState.conf.getConfString(key, dflt)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf(EnabledKey, "true").toBoolean || plan.isStreaming)
      return plan
    val maxKeys =
      conf(AutoProbeJoin.MaxKeysKey, "10000").toInt
    plan.transformUp {
      case f @ Filter(cond, child) =>
        rewrite(cond, child, maxKeys).map(Filter(cond, _))
          .getOrElse(f)
    }
  }

  /** The probe a conjunct set describes for one column: an equality
    * value list, or an inclusive-widened range. */
  private sealed trait Probe
  private case class Points(values: Seq[Any]) extends Probe
  private case class Range(lo: Any, hi: Any) extends Probe

  private def rewrite(cond: Expression, child: LogicalPlan,
      maxKeys: Int): Option[LogicalPlan] = {
    val resolver = spark.sessionState.conf.resolver
    val conjuncts = splitConjunctivePredicates(cond)
    // candidate columns in conjunct order; first servable one wins
    val candidates = conjuncts.flatMap(attrOf).distinct
    candidates.iterator.flatMap { a =>
      for {
        (leaf, info) <- AutoPrune.graftLeaf(child, a)
        if !resolver(a.name, info.key) // key predicates prune natively
        keyAttr <- AutoPrune.keyAttrOf(spark, info)
        if !AutoPrune.alreadyConstrained(child, keyAttr)
        probe <- probeOf(a, conjuncts)
        rewritten <- serve(child, leaf, info, a, keyAttr, probe, maxKeys)
      } yield rewritten
    }.nextOption()
      .orElse(compositeRewrite(conjuncts, child, candidates, maxKeys))
  }

  /** The COMPOSITE leg: `a = x AND b = y` — and the IN-list form
    * `a IN (x, y) AND b = z` — served by a registered multi-column
    * index whose every value column carries an equality point SET.
    * The probe is the cartesian product of the per-column lists,
    * served only while the tuple count stays ≤ `maxKeys` (one pruned
    * index lookup either way — a small product is exactly as cheap as
    * the same number of single-column probes; a large fan-out
    * declines, the tuple count is known BEFORE any I/O). An empty
    * per-column list (an IN-list of all-null literals — the predicate
    * can match nothing) collapses straight to `Filter(false)` without
    * probing. Same gates and injection as the single-column path. */
  private def compositeRewrite(conjuncts: Seq[Expression],
      child: LogicalPlan, candidates: Seq[AttributeReference],
      maxKeys: Int): Option[LogicalPlan] = {
    val resolver = spark.sessionState.conf.resolver
    // equality value LISTS per candidate attribute, conjunct order
    val points: Seq[(AttributeReference, Seq[Any])] =
      candidates.flatMap { a =>
        probeOf(a, conjuncts) match {
          case Some(Points(vs)) => Some(a -> vs.distinct)
          case _ => None
        }
      }
    if (points.size < 2) return None
    val (a0, _) = points.head
    for {
      (leaf, info) <- AutoPrune.graftLeaf(child, a0)
      // every pointed attr must flow from the SAME leaf
      if points.forall { case (a, _) => leaf.outputSet.contains(a) }
      keyAttr <- AutoPrune.keyAttrOf(spark, info)
      if !AutoPrune.alreadyConstrained(child, keyAttr)
      (ix, target) <- AutoPrune.freshIndexWhere(spark, info,
        i => i.valueCols.size > 1 && i.valueCols.forall(c =>
          points.exists { case (a, _) => resolver(a.name, c) }))
      valueLists = ix.valueCols.map(c => points.collectFirst {
        case (a, vs) if resolver(a.name, c) => vs }.get)
      // overflow-safe tuple count: cap-and-bail the running product
      // (a plain Long product of several huge IN-lists can wrap
      // negative and sneak under maxKeys, then materialize an
      // astronomical cartesian fan-out on the driver). `bound+1`
      // saturates as "too many" without losing the ==0 empty-list case.
      product = {
        val bound = maxKeys.toLong
        valueLists.foldLeft(1L) { (acc, vs) =>
          if (acc > bound) acc else math.min(acc * vs.size, bound + 1)
        }
      }
      if product <= maxKeys
      keys <-
        if (product == 0L) Some(Nil) // some list empty: unsatisfiable
        else tryKeys(ix, valueLists.foldLeft(Seq(Seq.empty[Any])) {
          (acc, vs) => acc.flatMap(t => vs.map(v => t :+ v))
        }, maxKeys)
      rewritten = inject(child, leaf, keyAttr, keys, target)
    } yield {
      logInfo(s"graft auto index filter: served " +
        s"(${ix.valueCols.mkString(", ")}) composite predicate " +
        s"($product probe tuples) as a ${keys.size}-key probe on " +
        s"${info.name}")
      rewritten
    }
  }

  private def tryKeys(ix: SecondaryIndex.Index, values: Seq[Any],
      maxKeys: Int): Option[Seq[Any]] =
    try SecondaryIndex.keysOf(spark, ix, values, maxKeys)
    catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"graft auto index filter: probe failed, not " +
          s"rewriting: $e")
        None
    }

  private def inject(child: LogicalPlan, leaf: LogicalPlan,
      keyAttr: AttributeReference, keys: Seq[Any], target: Long)
      : LogicalPlan = {
    val pred: Expression =
      if (keys.isEmpty) Literal(false, BooleanType)
      else In(keyAttr, keys.map(Literal.create(_, keyAttr.dataType)))
    child.transformUp {
      case p if p eq leaf => Filter(pred, AutoPrune.pin(leaf, target))
    }
  }

  private def attrOf(c: Expression): Option[AttributeReference] =
    c match {
      case EqualTo(a: AttributeReference, _: Literal) => Some(a)
      case EqualTo(_: Literal, a: AttributeReference) => Some(a)
      case EqualNullSafe(a: AttributeReference, _: Literal) => Some(a)
      case EqualNullSafe(_: Literal, a: AttributeReference) => Some(a)
      case In(a: AttributeReference, list)
          if list.forall(_.isInstanceOf[Literal]) => Some(a)
      case InSet(a: AttributeReference, _) => Some(a)
      case GreaterThan(a: AttributeReference, _: Literal) => Some(a)
      case GreaterThan(_: Literal, a: AttributeReference) => Some(a)
      case GreaterThanOrEqual(a: AttributeReference, _: Literal) => Some(a)
      case GreaterThanOrEqual(_: Literal, a: AttributeReference) => Some(a)
      case LessThan(a: AttributeReference, _: Literal) => Some(a)
      case LessThan(_: Literal, a: AttributeReference) => Some(a)
      case LessThanOrEqual(a: AttributeReference, _: Literal) => Some(a)
      case LessThanOrEqual(_: Literal, a: AttributeReference) => Some(a)
      case _ => None
    }

  /** What the conjuncts pin `a` to. Equality shapes win over range
    * shapes (a point probe is strictly cheaper); every literal must
    * carry `a`'s own type (the analyzer-coerced normal case — a
    * mistyped literal means a widened comparison whose values may not
    * round-trip). Range endpoints are inclusive-widened: the kept
    * original predicate restores strictness row-level. */
  private def probeOf(a: AttributeReference, conjuncts: Seq[Expression])
      : Option[Probe] = {
    val ext = CatalystTypeConverters.createToScalaConverter(a.dataType)
    def typed(l: Literal): Option[Any] =
      if (l.dataType == a.dataType && l.value != null) Some(ext(l.value))
      else None
    val points = conjuncts.collectFirst {
      case EqualTo(x: AttributeReference, l: Literal)
          if x.exprId == a.exprId && typed(l).isDefined =>
        Points(Seq(typed(l).get))
      case EqualTo(l: Literal, x: AttributeReference)
          if x.exprId == a.exprId && typed(l).isDefined =>
        Points(Seq(typed(l).get))
      case EqualNullSafe(x: AttributeReference, l: Literal)
          if x.exprId == a.exprId && typed(l).isDefined =>
        Points(Seq(typed(l).get))
      case EqualNullSafe(l: Literal, x: AttributeReference)
          if x.exprId == a.exprId && typed(l).isDefined =>
        Points(Seq(typed(l).get))
      case In(x: AttributeReference, list)
          if x.exprId == a.exprId && list.forall {
            case l: Literal => l.dataType == a.dataType
            case _ => false
          } =>
        Points(list.collect { case l: Literal if l.value != null =>
          ext(l.value) })
      case InSet(x: AttributeReference, hset)
          if x.exprId == a.exprId =>
        Points(hset.toSeq.filter(_ != null).map(ext))
    }
    points.orElse {
      // both bounds required: a half-open range is unbounded work
      val lo = conjuncts.collectFirst {
        case GreaterThan(x: AttributeReference, l: Literal)
            if x.exprId == a.exprId && typed(l).isDefined => typed(l).get
        case GreaterThanOrEqual(x: AttributeReference, l: Literal)
            if x.exprId == a.exprId && typed(l).isDefined => typed(l).get
        case LessThan(l: Literal, x: AttributeReference)
            if x.exprId == a.exprId && typed(l).isDefined => typed(l).get
        case LessThanOrEqual(l: Literal, x: AttributeReference)
            if x.exprId == a.exprId && typed(l).isDefined => typed(l).get
      }
      val hi = conjuncts.collectFirst {
        case LessThan(x: AttributeReference, l: Literal)
            if x.exprId == a.exprId && typed(l).isDefined => typed(l).get
        case LessThanOrEqual(x: AttributeReference, l: Literal)
            if x.exprId == a.exprId && typed(l).isDefined => typed(l).get
        case GreaterThan(l: Literal, x: AttributeReference)
            if x.exprId == a.exprId && typed(l).isDefined => typed(l).get
        case GreaterThanOrEqual(l: Literal, x: AttributeReference)
            if x.exprId == a.exprId && typed(l).isDefined => typed(l).get
      }
      for (l <- lo; h <- hi) yield Range(l, h)
    }
  }

  private def serve(child: LogicalPlan, leaf: LogicalPlan,
      info: LeafInfo, a: AttributeReference,
      keyAttr: AttributeReference, probe: Probe, maxKeys: Int)
      : Option[LogicalPlan] =
    try {
      val (ix, target) = AutoPrune.freshIndexOn(spark, info, a.name)
        .getOrElse(return None)
      val keys = probe match {
        case Points(values) =>
          if (values.isEmpty) Some(Nil)
          else SecondaryIndex.keysOf(spark, ix, values, maxKeys)
        case Range(lo, hi) =>
          if (!ix.rangeLayout || a.dataType != StringType) None
          else SecondaryIndex.keysInRange(spark, ix, lo, hi, maxKeys)
      }
      keys.map { ks =>
        logInfo(s"graft auto index filter: served ${a.name} predicate " +
          s"as a ${ks.size}-key probe on ${info.name}")
        inject(child, leaf, keyAttr, ks, target)
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"graft auto index filter: probe failed, not " +
          s"rewriting: $e")
        None
    }
}

object AutoIndexFilter {
  val EnabledKey = "spark.graft.autoIndexFilter.enabled"
}
