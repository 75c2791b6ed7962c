package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, EqualTo, Expression, In, Literal,
  PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{
  Inner, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan,
  Project, Sample}
import org.apache.spark.sql.catalyst.rules.Rule

import org.apache.spark.sql.execution.datasources.v2.{
  DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.BooleanType

/** AUTOMATIC dim-driven dynamic file pruning — the optimizer-rule face
  * of [[ManifestTable.probeJoin]], so SQL/catalog users get the pruned
  * I/O shape without calling the API: `SELECT ... FROM fact JOIN dim ON
  * fact.key = dim.k WHERE <selective dim filter>` reads only the dim
  * keys' hash buckets of a 100 TB fact instead of every file.
  *
  * Spark's own dynamic partition pruning serves only partitioned
  * layouts, and its DSv2 runtime filtering only `BatchScanExec` scans
  * (which the graft read path deliberately bypasses — see
  * [[GraftReadStrategy]]); both drop ROWS, not I/O, on a manifest
  * table. This rule closes the gap with the engine's established
  * bounded-probe discipline: ONE bounded driver job collects the dim
  * side's distinct join keys, and a semantically-redundant
  * `key IN (<keys>)` superset filter lands directly above the fact's
  * v2 relation. Everything downstream is existing machinery — the
  * filter rebases into the substituted native read
  * ([[GraftReadStrategy]]) and [[GraftFileIndex]] prunes files by
  * normalized-probe bucket + key-stat containment (comparator-safe,
  * delta-exact, time-travel-agnostic: the filter is a pure logical
  * superset at ANY version).
  *
  * The rule fires only when ALL of these hold, each guarding a
  * soundness or cost edge:
  *   - join type is dim-bounded for the pruned side: `INNER` and
  *     `LEFT SEMI` (either side), `LEFT OUTER` (fact on the right),
  *     `RIGHT OUTER` (fact on the left) — fact rows the filter drops
  *     provably contribute nothing. `FULL OUTER` / `LEFT ANTI` never
  *     prune (a dropped fact row IS their output).
  *   - the equality conjunct joins the fact table's recorded KEY
  *     column, bare (an analyzer cast on the key side means a
  *     wider-typed dim — values may not round-trip, skip), against a
  *     deterministic dim expression of exactly the key's type.
  *   - the dim side carries a selectivity signal (a `Filter`, or a
  *     literal `LocalRelation` lookup list — the DPP discipline), is
  *     deterministic end-to-end, row-stable (no `LIMIT`/`TABLESAMPLE` —
  *     the dim executes twice: once probed, once joined), has no
  *     subqueries, and estimates under
  *     `spark.graft.autoProbeJoin.maxDimBytes` (default 10 MB — the
  *     size class Spark itself would collect for a broadcast).
  *   - the distinct probe set is provably COMPLETE under
  *     `spark.graft.autoProbeJoin.maxKeys` (default 10 000): the probe
  *     collects `maxKeys + 1` rows, and exceeding the cap means the
  *     set may be truncated — filtering by a SUBSET would drop matching
  *     fact rows, so the plan stays unchanged. Zero non-null keys
  *     collapse the fact side to `Filter(false)` (constant-folds to an
  *     empty relation).
  *
  * A second leg serves equi-joins on a NON-key column carrying a
  * REGISTERED single-column [[SecondaryIndex]] (the `indexreg` sidecar
  * [[SecondaryIndex.register]] writes): dim values resolve to base
  * keys through one pruned index lookup ([[SecondaryIndex.keysOf]])
  * and the same key-IN filter lands above the fact. Because those
  * keys derive from the FACT's own state (unlike the key leg, whose
  * probe set comes from the dim), the leg only fires when the index
  * has applied EXACTLY the version being served, and it PINS the fact
  * scan to that version — the [[GraftAggScan]] snapshot discipline; a
  * lagging index, a hot value whose key set exceeds the cap, or a
  * composite/absent index all decline to the plain join.
  *
  * Each action probes at most once per fact relation: once the IN
  * filter (or any user-written key IN/point predicate, which already
  * drives the same pruning) sits on the fact side, the rule declines —
  * so the fixed-point optimizer batches re-running the rule never
  * re-pay the job, and AQE's stage re-optimizer excludes extension
  * rules, so no re-probe per stage either. The probe job is
  * planning-time work on the driver's query thread — the same cost
  * class and thread discipline as the explicit `probeJoin` /
  * secondary-index probes (nested bounded execution; scan threads
  * never construct plans — the [[GraftFileIndex]] r9 lesson). A
  * concurrent commit to the DIM's storage between the probe and the
  * join execution is the standard non-transactional multi-read caveat,
  * identical to the explicit API. Disable with
  * `spark.graft.autoProbeJoin.enabled = false`.
  */
class AutoProbeJoin(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {
  import AutoProbeJoin._
  import AutoPrune.LeafInfo

  private def conf(key: String, dflt: String): String =
    spark.sessionState.conf.getConfString(key, dflt)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf(EnabledKey, "true").toBoolean || plan.isStreaming) return plan
    val maxKeys = conf(MaxKeysKey, "10000").toInt
    val maxDimBytes = BigInt(conf(MaxDimBytesKey, DefaultMaxDimBytes))
    plan.transformUp {
      case j @ Join(_, _, jt, Some(_), _) =>
        val factSides = jt match {
          case Inner | LeftSemi => Seq(true, false) // fact-is-left flags
          case LeftOuter => Seq(false)
          case RightOuter => Seq(true)
          case _ => Nil
        }
        factSides.foldLeft(j)(prune(_, _, maxKeys, maxDimBytes))
    }
  }

  private def prune(j: Join, factLeft: Boolean, maxKeys: Int,
      maxDimBytes: BigInt): Join = {
    val (fact, dim) = if (factLeft) (j.left, j.right) else (j.right, j.left)
    val resolver = spark.sessionState.conf.resolver
    val conjuncts = splitConjunctivePredicates(j.condition.get)
      .flatMap {
        case EqualTo(a: AttributeReference, d) => Seq((a, d))
        case EqualTo(d, a: AttributeReference) => Seq((a, d))
        case _ => Nil
      }
      .flatMap { case (a, d) =>
        if (!fact.outputSet.contains(a) ||
            !d.references.subsetOf(dim.outputSet) ||
            !d.deterministic || d.dataType != a.dataType) None
        else graftLeaf(fact, a).map((a, d, _))
      }
    // The KEY leg first: pure manifest pruning, no freshness coupling.
    // The INDEX leg (a registered secondary index on the joined
    // column) only when no key conjunct fired — it adds a freshness
    // check + an index lookup to the probe.
    val keyHit = conjuncts.find { case (a, _, (_, info)) =>
      resolver(a.name, info.key) && !alreadyConstrained(fact, a)
    }
    val hit = keyHit.orElse(conjuncts.find { case (a, _, (_, info)) =>
      !resolver(a.name, info.key) &&
        keyAttrOf(fact, info).exists(k => !alreadyConstrained(fact, k))
    })
    hit match {
      case Some((a, d, (leaf, info))) if dimAdmissible(dim, maxDimBytes) =>
        val isKeyLeg = resolver(a.name, info.key)
        val probed =
          if (isKeyLeg) probeKeys(dim, d, maxKeys).map((_, None))
          else indexedKeys(info, a, dim, d, maxKeys)
        probed match {
          case Some((keys, pinTo)) =>
            val keyAttr =
              if (isKeyLeg) a else keyAttrOf(fact, info).get
            val pred: Expression =
              if (keys.isEmpty) Literal(false, BooleanType)
              else In(keyAttr, keys.map(Literal.create(_, keyAttr.dataType)))
            val filtered = fact.transformUp {
              case p if p eq leaf =>
                Filter(pred, pinTo.fold(leaf)(pin(leaf, _)))
            }
            logInfo(s"graft auto probe join: injected ${keys.size}-key " +
              s"filter on ${keyAttr.name} above ${info.name}" +
              (if (isKeyLeg) "" else s" via the ${a.name} index"))
            if (factLeft) j.copy(left = filtered)
            else j.copy(right = filtered)
          case None => j // declined (over cap / stale / failed)
        }
      case _ => j
    }
  }

  /** The INDEX leg's probe: dim values → registered-index lookup →
    * base keys, plus the version the fact scan must PIN to. Unlike the
    * key leg (whose filter is version-agnostic — the probe keys come
    * from the DIM), index answers derive from the FACT's own state: a
    * row committed between planning and execution would be missing
    * from the key set, so the leg only fires when the index has
    * applied EXACTLY the version being served, and the scan is pinned
    * to that version (the GraftAggScan snapshot discipline). */
  private def indexedKeys(info: LeafInfo, a: AttributeReference,
      dim: LogicalPlan, d: Expression, maxKeys: Int)
      : Option[(Seq[Any], Option[Long])] =
    try {
      val (ix, target) = AutoPrune.freshIndexOn(spark, info, a.name)
        .getOrElse {
          logInfo(s"graft auto probe join: no FRESH index on " +
            s"${a.name} — not pruning")
          return None
        }
      probeKeys(dim, d, maxKeys).flatMap { values =>
        if (values.isEmpty) Some((Nil, Some(target)))
        else SecondaryIndex.keysOf(spark, ix, values, maxKeys)
          .map((_, Some(target)))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"graft auto probe join: index probe failed, not " +
          s"pruning: $e")
        None
    }

  private def keyAttrOf(fact: LogicalPlan, info: LeafInfo) =
    AutoPrune.keyAttrOf(spark, info)

  private def graftLeaf(fact: LogicalPlan, a: AttributeReference) =
    AutoPrune.graftLeaf(fact, a)

  private def pin(leaf: LogicalPlan, v: Long) = AutoPrune.pin(leaf, v)

  private def alreadyConstrained(fact: LogicalPlan,
      a: AttributeReference) = AutoPrune.alreadyConstrained(fact, a)

  private def dimAdmissible(dim: LogicalPlan, maxDimBytes: BigInt)
      : Boolean = {
    if (dim.isStreaming) return false
    val unstable = dim.exists {
      case _: Sample | _: LocalLimit | _: GlobalLimit => true
      case p => p.subqueries.nonEmpty ||
        !p.expressions.forall(_.deterministic)
    }
    if (unstable) return false
    // A Filter only counts as a selectivity signal when it does real
    // work: IsNotNull-only filters are constraint-inference noise (the
    // join condition itself plants `isnotnull(k)` on the dim side
    // before this rule runs).
    val selective = dim.exists {
      case f: Filter => splitConjunctivePredicates(f.condition)
        .exists(!_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.IsNotNull])
      case _: LocalRelation => true
      case _ => false
    }
    selective && dim.stats.sizeInBytes <= maxDimBytes
  }

  /** One bounded job: the dim side's distinct join-key values, `None`
    * when the set may be INCOMPLETE (over the cap — filtering by a
    * subset is unsound) or the probe fails (e.g. outer references the
    * admissibility walk could not see); NULL keys drop (equality
    * semantics). */
  private def probeKeys(dim: LogicalPlan, d: Expression, maxKeys: Int)
      : Option[Seq[Any]] =
    try {
      val rows = org.apache.spark.sql.graft.RelationBridge
        .ofRows(spark, Project(Seq(Alias(d, "__graft_probe")()), dim))
        .distinct().limit(maxKeys + 1).collect()
      if (rows.length > maxKeys) None
      else Some(rows.iterator.map(_.get(0)).filter(_ != null).toSeq)
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"graft auto probe join: probe failed, not pruning: $e")
        None
    }
}

object AutoProbeJoin {
  val EnabledKey = "spark.graft.autoProbeJoin.enabled"
  val MaxKeysKey = "spark.graft.autoProbeJoin.maxKeys"
  val MaxDimBytesKey = "spark.graft.autoProbeJoin.maxDimBytes"
  private[store] val DefaultMaxDimBytes: String =
    (10L * 1024 * 1024).toString
}

/** The machinery [[AutoProbeJoin]] and [[AutoIndexFilter]] share:
  * graft-leaf discovery, key-attribute resolution, the
  * already-constrained fixed-point guard, snapshot pinning, and the
  * registered-index freshness gate. */
private[store] object AutoPrune extends PredicateHelper {

  /** What the probe legs need to know about a graft leaf. */
  case class LeafInfo(root: String, versionAsOf: Option[Long],
      schema: org.apache.spark.sql.types.StructType, key: String,
      name: String,
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])

  /** The graft v2 relation owning attribute `a`. `a` must flow from
    * the leaf unaliased — through Filters and pass-through Projects —
    * which `outputSet.contains` checks by exprId. Two leaf shapes, one
    * per registration mode: an extension-injected session runs the
    * rules BEFORE scan pushdown (bare [[DataSourceV2Relation]]); a
    * post-hoc `GraftExtensions.register` session runs them in the
    * user-provided batch AFTER pushdown ([[DataSourceV2ScanRelation]]
    * carrying a [[GraftBatchScan]]). Either way an injected filter
    * lands in `PhysicalOperation`'s collected filters and rebases into
    * the substituted native read. */
  def graftLeaf(plan: LogicalPlan, a: AttributeReference)
      : Option[(LogicalPlan, LeafInfo)] = {
    def keyOf(t: org.apache.spark.sql.connector.catalog.Table): String =
      Option(t.properties().get("key")).getOrElse("")
    plan.collectFirst {
      case r: DataSourceV2Relation
          if r.outputSet.contains(a) && r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        (r: LogicalPlan, LeafInfo(t.root, t.versionAsOf, t.tableSchema,
          keyOf(t), t.name(), r.output))
      case s: DataSourceV2ScanRelation
          if s.outputSet.contains(a) &&
            s.scan.isInstanceOf[GraftBatchScan] =>
        val b = s.scan.asInstanceOf[GraftBatchScan]
        (s: LogicalPlan, LeafInfo(b.root, b.versionAsOf, b.tableSchema,
          keyOf(s.relation.table), s.relation.table.name(), s.output))
    }.filter(_._2.key.nonEmpty)
  }

  /** The table's key attribute as the LEAF outputs it (the v2 scan
    * builder never prunes columns — projects rebase in the substituted
    * native plan — so the key is always present). */
  def keyAttrOf(spark: SparkSession, info: LeafInfo)
      : Option[AttributeReference] = {
    val resolver = spark.sessionState.conf.resolver
    info.output.collectFirst {
      case ar: AttributeReference if resolver(ar.name, info.key) => ar
    }
  }

  /** Pins a graft leaf to version `v` so the scan serves exactly the
    * snapshot an index answered for. No-op when the leaf already
    * travels. */
  def pin(leaf: LogicalPlan, v: Long): LogicalPlan = leaf match {
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable if t.versionAsOf.isEmpty =>
        r.copy(table = t.copy(versionAsOf = Some(v)))
      case _ => r
    }
    case s: DataSourceV2ScanRelation => s.scan match {
      case b: GraftBatchScan if b.versionAsOf.isEmpty =>
        s.copy(scan = b.copy(versionAsOf = Some(v)))
      case _ => s
    }
    case other => other
  }

  /** True when some Filter in `plan` already pins `a` to an IN-list /
    * single value / FALSE — either a rule's own injection (the
    * fixed-point batches re-run the rules; re-probing every iteration
    * would re-pay the job AND re-grow the plan forever) or the user's
    * own predicate (which already drives the same file pruning — a
    * second probe buys nothing). */
  def alreadyConstrained(plan: LogicalPlan,
      a: AttributeReference): Boolean =
    plan.exists {
      case f: Filter => splitConjunctivePredicates(f.condition).exists {
        case In(x: AttributeReference, _) => x.exprId == a.exprId
        case org.apache.spark.sql.catalyst.expressions
            .InSet(x: AttributeReference, _) => x.exprId == a.exprId
        case EqualTo(x: AttributeReference, _: Literal) =>
          x.exprId == a.exprId
        case EqualTo(_: Literal, x: AttributeReference) =>
          x.exprId == a.exprId
        case Literal(false, BooleanType) => true
        case _ => false
      }
      case _ => false
    }

  /** The registered single-column index on `colName` IFF it has
    * applied exactly the version the leaf serves AND that version's
    * live files provably hold no NULL-keyed rows — the soundness gates
    * both index legs share. A LAGGING index would silently hide newer
    * base rows; a NULL-keyed row is invisible to any index
    * (`collect_list` drops null keys) yet a plain scan would return
    * it, so a table that may hold one (any entry's `nullKeys`, true
    * for pre-format-11 entries) declines too. Returns the index and
    * the version the caller must PIN the scan to. */
  def freshIndexOn(spark: SparkSession, info: LeafInfo,
      colName: String): Option[(SecondaryIndex.Index, Long)] = {
    val resolver = spark.sessionState.conf.resolver
    freshIndexWhere(spark, info, i => i.valueCols.size == 1 &&
      resolver(i.valueCols.head, colName))
  }

  /** [[freshIndexOn]] with a caller-chosen index shape (the composite
    * leg's face) — same gates: applied EXACTLY the served version, no
    * live file may hold a NULL-keyed row. */
  def freshIndexWhere(spark: SparkSession, info: LeafInfo,
      pick: SecondaryIndex.Index => Boolean)
      : Option[(SecondaryIndex.Index, Long)] = {
    val ix = SecondaryIndex.registered(spark, info.root, info.schema)
      .find(pick).getOrElse(return None)
    val m = info.versionAsOf match {
      case Some(v) => ManifestTable.readManifest(spark, info.root, v)
      case None =>
        ManifestTable.currentManifest(spark, info.root)
          .getOrElse(return None)
    }
    if (SecondaryIndex.appliedVersion(spark, ix) != m.version) None
    else if (m.entries.exists(_.nullKeys)) None
    else Some((ix, m.version))
  }
}
