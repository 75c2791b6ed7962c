package graft.store

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, AttributeSet, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan,
  MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bridge

/** SQL `UPDATE` and `MERGE INTO` over catalog-resolved manifest tables.
  *
  * Spark only serves these statements to tables implementing
  * `SupportsRowLevelOperations`, whose group-based rewrite assumes a
  * DSv2 distributed-commit write path — machinery the manifest table
  * deliberately does not have (its commit point is the driver's OCC
  * manifest swap over completed bucket writes). Instead, the statements
  * are claimed at PLANNING time by this strategy (injected by
  * [[graft.GraftExtensions]]; extra strategies run before the built-in
  * ones, so Spark's "table does not support UPDATE" refusal never
  * fires) and mapped onto the engine's own primitives:
  *
  *   - `UPDATE t SET ... WHERE ...` → read the current snapshot
  *     filtered by the predicate (key predicates prune buckets/files
  *     through GraftFileIndex), apply the assignments, and key-matched
  *     MERGE the rewritten rows back — one commit, cost ∝ the touched
  *     buckets, a full-table rewrite only when the WHERE doesn't
  *     prune. Assigning the KEY column refuses (re-keying is a
  *     delete + insert, not an update).
  *   - `MERGE INTO t USING s ON t.key = expr WHEN ...` →
  *     [[ManifestTable.mergeInto]]: ONE full-outer join of the
  *     source against only the source-keys' buckets, per-clause
  *     dispositions computed row-wise, one OCC commit covering
  *     updates + deletes + inserts atomically.
  *
  * Both statements execute like SQL INSERT/DELETE here do: a random
  * replay token under a dedicated stream id (statements are not
  * engine-retried; a version-derived token would let two concurrent
  * statements collide and the OCC loser silently no-op). Both refuse
  * on time-travelled snapshots.
  *
  * Reference tie-in: the reference's import task is an upsert with
  * per-column policies (importtask.py:197–311); MERGE INTO is the SQL
  * face of the same key-matched merge with per-CLAUSE policies. */
class GraftDmlStrategy(spark: SparkSession) extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case UpdateTable(target, assignments, condition) =>
      GraftDml.graftTarget(target) match {
        case Some(g) =>
          GraftDmlExec("graft UPDATE",
            () => GraftDml.runUpdate(spark, g, assignments, condition)) :: Nil
        case None => Nil
      }
    case m: MergeIntoTable =>
      GraftDml.graftTarget(m.targetTable) match {
        case Some(g) =>
          GraftDmlExec("graft MERGE INTO",
            () => GraftDml.runMerge(spark, g, m)) :: Nil
        case None => Nil
      }
    // Key-equality/IN and truncate DELETEs keep the metadata path
    // (SupportsDelete: bucket-local or manifest-only). Every OTHER
    // predicate lands here instead of Spark's "cannot delete" refusal:
    // the row-level rewrite ([[ManifestTable.deleteWhere]]) — the same
    // cost class as UPDATE's, one pruned discovery scan + touched-bucket
    // rewrites in one commit.
    case DeleteFromTable(target, condition) =>
      GraftDml.graftTarget(target) match {
        case Some(g) if !GraftDml.metadataDeletable(g, condition) =>
          GraftDmlExec("graft DELETE (row-level rewrite)",
            () => GraftDml.runDeleteWhere(spark, g, condition)) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Driver-orchestrated DML command node. `UpdateTable`/`MergeIntoTable`
  * are logical `Command`s, so query execution collects this node
  * EAGERLY exactly once; the memo keeps a stray re-execution (a cached
  * plan re-collected) from re-running the side effect with a fresh
  * token. */
private[store] case class GraftDmlExec(label: String, body: () => Unit)
    extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  override def nodeName: String = label
  @transient private lazy val once: Unit = body()
  override def executeCollect(): Array[InternalRow] = { once; Array.empty }
  override protected def doExecute(): RDD[InternalRow] = {
    once; sparkContext.emptyRDD
  }
}

private[graft] object GraftDml {

  /** Unwraps a DML target to its graft table. By planning time the
    * optimizer has eliminated aliases and may have run scan pushdown
    * (`DataSourceV2Relation` → `DataSourceV2ScanRelation`); commands
    * claimed from the analyzed tree still carry both. */
  def graftTarget(plan: LogicalPlan): Option[GraftTable] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTable => Some(g)
      case _ => None
    }
    case s: org.apache.spark.sql.execution.datasources.v2
        .DataSourceV2ScanRelation => graftTarget(s.relation)
    case SubqueryAlias(_, child) => graftTarget(child)
    case _ => None
  }

  private def newToken(): Long =
    java.util.concurrent.ThreadLocalRandom.current().nextLong(Long.MaxValue)

  /** Top-level column name of an assignment target; nested-field
    * assignments refuse (a struct-field update would need a full
    * read-modify-write of the struct column — spell that out with
    * `SET s = named_struct(...)`). */
  private def assignedColumn(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => throw new UnsupportedOperationException(
      "graft DML assigns top-level columns only, got " + other.sql)
  }

  def runUpdate(
      spark: SparkSession,
      g: GraftTable,
      assignments: Seq[Assignment],
      condition: Option[Expression]): Unit = {
    require(g.versionAsOf.isEmpty,
      "cannot UPDATE a time-travelled table snapshot")
    val root = g.root
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    val key = m.keyColumn
    require(key.nonEmpty, s"table at $root records no key column")
    val schema = g.tableSchema
    val byAssigned = assignments.map { a =>
      val name = assignedColumn(a)
      require(name != key,
        s"UPDATE must not assign the key column '$key' — re-keying a " +
          "row is a DELETE + INSERT (or MERGE INTO), not an UPDATE")
      name -> a.value
    }.toMap
    // zone-hinted read (the DELETE-discovery discipline): range/equality
    // conjuncts of the WHERE consult the zone sidecars so an UPDATE
    // scoped to a clustered/z-ordered column reads only candidate files;
    // the full predicate still applies below, so the hint only narrows
    val hints = condition.map(zoneHints).getOrElse(Nil)
      .filter { case (c, _, _) =>
        schema.fieldNames.contains(c) &&
          scala.util.Try(ZoneSkip.kindOf(schema(c).dataType)).isSuccess
      }
    val bloomH = condition.map(bloomHints).getOrElse(Nil)
      .filter { case (c, _) => schema.fieldNames.contains(c) }
    val df =
      if (hints.isEmpty && bloomH.isEmpty)
        ManifestTable.read(spark, root, schema)
      else {
        var es =
          if (hints.isEmpty) m.entries
          else ZoneSkip.prunedEntries(spark, root, schema, m, hints)
        bloomH.foreach { case (c, vs) =>
          if (es.nonEmpty && vs.nonEmpty) {
            val keep = BloomSkip.prunedEntriesFor(spark, root, schema,
              m, c, vs)._1.map(_.relPath).toSet
            es = es.filter(e => keep(e.relPath))
          }
        }
        // fresh-index narrowing (the deleteWhere discovery
        // discipline): an UPDATE scoped by an indexed column reads
        // only the named keys' buckets, consistently with the
        // snapshot `m` it updates
        bloomH.foreach { case (c, vs) =>
          if (es.nonEmpty && vs.nonEmpty && c != key)
            graft.store.SecondaryIndex
              .hintBuckets(spark, root, schema, m, c, vs)
              .foreach(bks => es = es.filter(e => bks(e.bucket)))
        }
        if (es.isEmpty)
          ManifestTable.read(spark, root, schema).limit(0)
        else ManifestTable.reconciledEntriesRead(spark, root, schema,
          m, es)
      }
    // rebase the analyzer-resolved expressions (which reference the V2
    // relation's attribute ids) onto the native read plan, BY NAME —
    // the GraftReadStrategy discipline
    val byName = df.queryExecution.analyzed.output
      .map(a => a.name -> (a: Expression)).toMap
    def rb(e: Expression): Expression = e.transform {
      case a: Attribute => byName(a.name)
    }
    val filtered = condition match {
      case Some(c) => df.filter(Bridge.column(rb(c)))
      case None => df
    }
    val updated = filtered.select(schema.fields.toSeq.map { f =>
      byAssigned.get(f.name) match {
        case Some(v) => Bridge.column(rb(v)).cast(f.dataType).as(f.name)
        case None => filtered(f.name)
      }
    }: _*)
    ManifestTable.merge(updated, newToken(),
      DerivedTable.identityMapping(schema, key), root, schema,
      numBuckets = m.numBuckets, streamId = "graft-sql-update")
  }

  /** True when the keyed metadata path ([[GraftTable.canDeleteWhere]])
    * serves this DELETE's predicate — those statements must keep their
    * bucket-local / manifest-only cost, so the strategy declines them. */
  def metadataDeletable(g: GraftTable, condition: Expression): Boolean = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case other => Seq(other)
    }
    val splits = split(condition)
    val translated = splits.flatMap(Bridge.translateFilter)
    translated.length == splits.length &&
      g.canDeleteWhere(translated.toArray)
  }

  def runDeleteWhere(
      spark: SparkSession,
      g: GraftTable,
      condition: Expression): Unit = {
    require(g.versionAsOf.isEmpty,
      "cannot DELETE from a time-travelled table snapshot")
    // `spark.graft.deleteWhere.delta = true` routes SQL row-level
    // DELETEs through the tombstone cost class (write ∝ matched rows —
    // the GDPR-erasure shape) instead of the touched-bucket rewrite.
    // Session-scoped opt-in: tombstones trade read-side reconcile work
    // until the next compaction, so the operator chooses per workload.
    val delta = spark.conf.getOption("spark.graft.deleteWhere.delta")
      .exists(_.equalsIgnoreCase("true"))
    ManifestTable.deleteWhere(spark, g.root, g.tableSchema,
      df => {
        val byName = df.queryExecution.analyzed.output
          .map(a => a.name -> (a: Expression)).toMap
        Bridge.column(condition.transform {
          case a: Attribute => byName(a.name)
        })
      },
      newToken(), tokenStream = Some("graft-sql-delete-where"),
      zoneRanges = zoneHints(condition).filter { case (c, _, _) =>
        g.tableSchema.fieldNames.contains(c) &&
          scala.util.Try(
            ZoneSkip.kindOf(g.tableSchema(c).dataType)).isSuccess
      },
      bloomProbes = bloomHints(condition).filter { case (c, _) =>
        g.tableSchema.fieldNames.contains(c)
      },
      // same (column, values) facts, served by a FRESH registered
      // index when one covers the column: discovery narrows to the
      // named keys' buckets (SecondaryIndex.hintBuckets)
      indexProbes = bloomHints(condition).filter { case (c, _) =>
        g.tableSchema.fieldNames.contains(c)
      },
      delta = delta)
  }

  /** (column, values) membership facts the DELETE's conjuncts imply —
    * the bloom-sidecar discovery hint (`c = v` and `c IN (...)`; NULLs
    * drop — `=` never matches them). Mechanical, so weaker-never-
    * stronger holds by construction. */
  private[graft] def bloomHints(condition: Expression)
      : Seq[(String, Seq[Any])] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case other => Seq(other)
    }
    import org.apache.spark.sql.sources
    split(condition).flatMap(Bridge.translateFilter).collect {
      case sources.EqualTo(c, v) if v != null => c -> Seq(v)
      case sources.In(c, vs) if vs.nonEmpty && vs.forall(_ != null) =>
        c -> vs.toSeq
    }
  }

  /** Per-column [lo, hi] facts the DELETE's own top-level conjuncts
    * imply — the zone-sidecar discovery hint. Derived mechanically, so
    * the weaker-never-stronger soundness contract holds by
    * construction: only conjuncts constrain, strict bounds widen to
    * inclusive, anything unrecognized contributes nothing. */
  private[graft] def zoneHints(condition: Expression)
      : Seq[(String, Any, Any)] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case other => Seq(other)
    }
    import org.apache.spark.sql.sources
    val perCol = scala.collection.mutable
      .LinkedHashMap.empty[String, (Any, Any)]
    def tighten(c: String, lo: Any, hi: Any): Unit = {
      // same-column conjuncts: keep the first bound per side (a
      // TIGHTER merge would need type-aware comparison; first-wins is
      // still a sound weaker hint)
      val (l0, h0) = perCol.getOrElse(c, (null, null))
      perCol(c) = (if (l0 == null) lo else l0, if (h0 == null) hi else h0)
    }
    split(condition).flatMap(Bridge.translateFilter).foreach {
      case sources.EqualTo(c, v) if v != null => tighten(c, v, v)
      case sources.GreaterThan(c, v) if v != null => tighten(c, v, null)
      case sources.GreaterThanOrEqual(c, v) if v != null =>
        tighten(c, v, null)
      case sources.LessThan(c, v) if v != null => tighten(c, null, v)
      case sources.LessThanOrEqual(c, v) if v != null =>
        tighten(c, null, v)
      case _ => ()
    }
    perCol.toSeq.map { case (c, (lo, hi)) => (c, lo, hi) }
      .filter { case (_, lo, hi) => lo != null || hi != null }
  }

  def runMerge(
      spark: SparkSession,
      g: GraftTable,
      cmd: MergeIntoTable): Unit = {
    require(g.versionAsOf.isEmpty,
      "cannot MERGE INTO a time-travelled table snapshot")
    require(!cmd.schemaEvolutionEnabled,
      "MERGE ... WITH SCHEMA EVOLUTION is not supported — evolve first " +
        "(ALTER TABLE ... ADD COLUMNS, or merge(evolveSchema = true))")
    val root = g.root
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    val key = m.keyColumn
    require(key.nonEmpty, s"table at $root records no key column")
    // A normalized-key layout (recorded keyExpr / Scala-comparator
    // tables) matches rows in NORMALIZED key space; SQL MERGE's ON
    // compares raw values, and silently mixing the two spaces would
    // match the wrong rows or probe the wrong buckets.
    require(m.keyExpr.isEmpty && !m.udfKey,
      s"table at $root is laid out by a normalized key comparator — " +
        "MERGE through the Scala API (ManifestTable.merge), which " +
        "holds the comparator")
    val target = graftTarget(cmd.targetTable).get
    val targetOutput = targetRelationOutput(cmd.targetTable)
    val sourceKey =
      extractSourceKey(cmd.mergeCondition, targetOutput, cmd.sourceTable, key)

    // Clause validation: updates never re-key; inserts key exactly by
    // the ON key (any other insert key could land a duplicate of a row
    // in an untouched bucket — the table is keyed).
    def stripCast(e: Expression): Expression = e match {
      case c: Cast => stripCast(c.child)
      case other => other
    }
    cmd.matchedActions.foreach {
      case UpdateAction(_, assigns, _) => assigns.foreach { a =>
        // `UPDATE SET *` star-expands to assignments for EVERY column
        // including `key = <ON source key>` — on matched rows that is
        // an identity (the ON equality holds), so it is allowed; any
        // OTHER key assignment re-keys and refuses. Without the
        // identity exemption the most common MERGE form failed on
        // valid SQL.
        require(assignedColumn(a) != key ||
          stripCast(a.value).canonicalized ==
            stripCast(sourceKey).canonicalized,
          s"MERGE must not update the key column '$key' — matched rows " +
            "already share the ON key; re-keying is DELETE + INSERT " +
            "(assigning it to the ON key expression, as UPDATE SET * " +
            "does, is the allowed identity)")
      }
      case _ => ()
    }
    cmd.notMatchedBySourceActions.foreach {
      case UpdateAction(_, assigns, _) => assigns.foreach { a =>
        // no source row exists here, so no identity exemption applies
        require(assignedColumn(a) != key,
          s"MERGE must not update the key column '$key' — matched rows " +
            "already share the ON key; re-keying is DELETE + INSERT")
      }
      case _ => ()
    }
    cmd.notMatchedActions.foreach {
      case InsertAction(_, assigns) =>
        val keyAssign = assigns.find(a => assignedColumn(a) == key)
          .getOrElse(throw new IllegalArgumentException(
            s"MERGE INSERT must assign the key column '$key'"))
        require(
          stripCast(keyAssign.value).canonicalized ==
            stripCast(sourceKey).canonicalized,
          s"MERGE INSERT must set the key column '$key' to the ON " +
            "key expression — inserting under a different key could " +
            "duplicate a key living in a bucket this merge never reads")
      case _: DeleteAction => throw new IllegalArgumentException(
        "WHEN NOT MATCHED supports INSERT only")
      case _ => ()
    }
    require(target.root == root, "target relation mismatch")

    ManifestTable.mergeInto(spark, root, g.tableSchema, targetOutput,
      cmd.sourceTable, sourceKey, cmd.mergeCondition,
      cmd.matchedActions, cmd.notMatchedActions,
      cmd.notMatchedBySourceActions, newToken())
  }

  private def targetRelationOutput(plan: LogicalPlan): Seq[Attribute] =
    plan match {
      case r: DataSourceV2Relation => r.output
      case s: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => s.output
      case SubqueryAlias(_, child) => targetRelationOutput(child)
      case other => throw new IllegalStateException(
        s"unexpected MERGE target shape: ${other.nodeName}")
    }

  /** The source-side key expression from `ON t.<key> = <source expr>`.
    * The condition must be EXACTLY that equality: the table is keyed,
    * so matching is by key — an extra conjunct would route key-equal
    * rows to the INSERT branch and duplicate their key. Extra
    * predicates belong in `WHEN MATCHED AND ...` clauses, where the
    * row stays a (kept) match when they fail. */
  private def extractSourceKey(
      cond: Expression,
      targetOutput: Seq[Attribute],
      source: LogicalPlan,
      key: String): Expression = {
    val tSet = AttributeSet(targetOutput)
    val sSet = AttributeSet(source.output)
    def isTargetKey(e: Expression): Boolean = e match {
      case a: AttributeReference => tSet.contains(a) && a.name == key
      case c: Cast => isTargetKey(c.child)
      case _ => false
    }
    val refused = new IllegalArgumentException(
      s"graft MERGE matches by key equality only: ON t.`$key` = " +
        "<source expression>. Fold any extra predicates into WHEN " +
        "MATCHED AND ... / WHEN NOT MATCHED AND ... conditions — an " +
        "extra ON conjunct would re-route key-equal rows to INSERT " +
        "and duplicate their key in this keyed table.")
    cond match {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(l, r) =>
        if (isTargetKey(l) && r.references.subsetOf(sSet)) r
        else if (isTargetKey(r) && l.references.subsetOf(sSet)) l
        else throw refused
      case _ => throw refused
    }
  }
}
