package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.FormatList
import graft.operators.{CosineSim, HyperplaneBits, L2Normalize, MinHashSig, RepetitionStats, Shingles, SimHash64, TextStats}
import graft.sources.CsvLine

/** Exposes graft's custom Catalyst expressions to SQL.
  *
  * Two entry points:
  *  - `GraftExtensions` for
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or the
  *    `spark.sql.extensions` conf (cluster deploys);
  *  - [[GraftExtensions.register]] to add the functions to an already-built
  *    session (tests, notebooks).
  *
  * After registration: `SELECT simhash64(text), format_list(tags) FROM docs`,
  * and the manifest table reads straight from SQL as TABLE FUNCTIONS:
  * `SELECT * FROM graft_table('/path', 'id BIGINT, name STRING')`,
  * `graft_table_at(root, ddl, version)` for time travel,
  * `graft_changes(root, ddl, keyColumn, fromVersion, toVersion)` for the
  * CDC feed, `graft_count(root, ddl)` for the metadata-only row count,
  * and `graft_lookup(root, ddl, keyColumn, key)` for the pruned point
  * read — all resolve to the same pruned/reconciled plans as the
  * Scala API (the function builder returns the LogicalPlan the DataFrame
  * reader would produce).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    GraftExtensions.tableDefinitions.foreach { case (name, builder) =>
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    // The batch-read face of the manifest table
    // (spark.read.format("graft")) plans through this strategy.
    ext.injectPlannerStrategy(session =>
      new graft.store.GraftReadStrategy(session))
    // SQL UPDATE / MERGE INTO on catalog tables: claimed at planning,
    // before Spark's built-in "table does not support UPDATE" refusal.
    ext.injectPlannerStrategy(session =>
      new graft.store.GraftDmlStrategy(session))
    // Automatic dim-driven dynamic file pruning: a selective small dim
    // joined to a manifest table on its key injects a bounded
    // key-IN filter above the fact relation at optimization, so the
    // scan reads only the probed buckets' files (the optimizer-rule
    // face of ManifestTable.probeJoin).
    ext.injectOptimizerRule(session =>
      new graft.store.AutoProbeJoin(session))
    // Automatic secondary-index access for plain filters: a literal
    // point/range predicate on a registered indexed column becomes a
    // bounded key probe + pinned pruned scan.
    ext.injectOptimizerRule(session =>
      new graft.store.AutoIndexFilter(session))
  }
}

object GraftExtensions {

  private def intArg(e: Expression): Int =
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"expected integer literal, got $other")
    }

  /** name → builder from SQL argument expressions. */
  val definitions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "format_list" -> (es => FormatList(es.head)),
    "csv_line" -> (es => CsvLine(es.head)),
    "csv_records" -> (es => graft.sources.CsvRecords(es.head)),
    "simhash64" -> (es => SimHash64(es.head)),
    "shingles" -> (es => Shingles(es.head,
      if (es.length > 1) intArg(es(1)) else 3)),
    "minhash_sig" -> (es => MinHashSig(es.head,
      if (es.length > 1) intArg(es(1)) else 3,
      if (es.length > 2) intArg(es(2)) else 32)),
    "cosine_sim" -> (es => CosineSim(es(0), es(1))),
    "hyperplane_bits" -> (es => HyperplaneBits(es.head,
      if (es.length > 1) intArg(es(1)) else 8)),
    "to_csv_line" -> (es => {
      // catalyst-native mirror of Sources.toCsvLine (a Column built via
      // the DSL doesn't resolve inside a function-registry builder)
      import org.apache.spark.sql.catalyst.expressions.{
        CaseWhen, Cast, Coalesce, Concat, ConcatWs, Literal, RLike,
        RegExpReplace}
      import org.apache.spark.sql.types.StringType
      def field(e: Expression): Expression = {
        val f = Coalesce(Seq(Cast(e, StringType), Literal("")))
        CaseWhen(
          Seq((RLike(f, Literal("[,\"\n\r]")),
            Concat(Seq(Literal("\""),
              RegExpReplace(f, Literal("\""), Literal("\"\"")),
              Literal("\""))))),
          f)
      }
      ConcatWs(Literal(",") +: es.map(field))
    }),
    "text_stats" -> (es => TextStats(es.head)),
    "repetition_stats" -> (es => RepetitionStats(es.head)),
    "l2_normalize" -> (es => L2Normalize(es.head)))

  /** The table functions take LITERAL arguments only (they run at plan
    * time). A non-foldable argument (a column reference, a subquery)
    * must fail as a usage error, not surface as an opaque NPE from
    * eval(null) mid-analysis. */
  private def foldableArg(e: Expression, what: String): Any = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a literal, got non-foldable: ${e.sql}")
    e.eval(null)
  }

  /** Foldable argument as its EXTERNAL Scala value, typed by the
    * literal's OWN SQL type. `foldableArg` alone yields Catalyst
    * internals — a `TIMESTAMP '...'` evals to a Long of epoch MICROS
    * (which `lit(x).cast(timestamp)` would silently re-interpret as
    * SECONDS) and a `DATE '...'` to an Int of epoch days (where the
    * int→date cast outright fails) — so every probe/bound that flows
    * into a `lit` must come through here instead. */
  private def typedArg(e: Expression, what: String): Any = {
    val v = foldableArg(e, what)
    if (v == null) null
    else org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(e.dataType)(v)
  }

  private def strArg(e: Expression, what: String): String =
    foldableArg(e, what) match {
      case null => throw new IllegalArgumentException(s"$what must not be null")
      case v: org.apache.spark.unsafe.types.UTF8String => v.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got ${e.dataType.sql}: $other")
    }

  /** Comma-separated column-name list; '' → empty (for optional
    * min/max column lists). */
  private def csvArg(e: Expression, what: String): Seq[String] =
    strArg(e, what).split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** A procedure-style function (a plan-time WRITE) resolving inside a
    * view body is a standing footgun: the view's stored text re-analyzes
    * on every reference, so each SELECT from the view would silently
    * re-run the side effect. The analyzer tracks view-resolution depth
    * in its AnalysisContext — depth > 0 means "this resolution is a view
    * body", and we refuse. (CREATE VIEW itself analyzes the body at
    * depth 0, so creation executes the action once and succeeds; the
    * first read of the view then fails with this error instead of
    * silently re-merging.) */
  private def refuseInView(fn: String): Unit = {
    val depth = org.apache.spark.sql.catalyst.analysis.AnalysisContext
      .get.nestedViewDepth
    if (depth > 0) throw new IllegalStateException(
      s"$fn executes its maintenance action at plan time and cannot be " +
        s"wrapped in a view: every reference to the view would re-run " +
        s"the action. Call $fn directly — one statement, one committed " +
        "action.")
  }

  private def longArg(e: Expression, what: String): Long =
    foldableArg(e, what) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got " +
          s"${e.dataType.sql}: ${String.valueOf(other)}")
    }

  /** Table functions over [[graft.store.ManifestTable]]: each builder
    * evaluates its FOLDABLE string/int arguments and returns the analyzed
    * LogicalPlan of the corresponding Scala-API read, so SQL users get
    * the identical pruned/reconciled plans. */
  val tableDefinitions: Seq[(String, Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    // The 1-arg/DDL-less forms read format-7 manifests' RECORDED schema
    // (self-describing tables); the DDL forms remain for older tables
    // and deliberate column projection.
    "graft_table" -> (es => {
      require(es.size == 1 || es.size == 2,
        "usage: graft_table(root[, 'id BIGINT, name STRING, ...'])")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val df =
        if (es.size == 1) graft.store.ManifestTable.read(spark, root)
        else graft.store.ManifestTable.read(spark, root,
          org.apache.spark.sql.types.StructType.fromDDL(
            strArg(es(1), "schema DDL")))
      df.queryExecution.analyzed
    }),
    "graft_table_at" -> (es => {
      require(es.size == 2 || es.size == 3,
        "usage: graft_table_at(root[, schemaDDL], versionOrTag)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      // the version argument doubles as a TAG: a string literal that
      // isn't all digits resolves through the tag registry (the
      // VERSION AS OF contract — tag names require a non-digit)
      def versionOf(e: org.apache.spark.sql.catalyst.expressions
          .Expression): Long = e.dataType match {
        case org.apache.spark.sql.types.StringType =>
          val s = strArg(e, "version or tag")
          if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
          else graft.store.ManifestTable.resolveTag(spark, root, s)
        case _ => longArg(e, "version")
      }
      val df =
        if (es.size == 2) graft.store.ManifestTable.readAt(spark, root,
          versionOf(es(1)))
        else graft.store.ManifestTable.readAt(spark, root,
          org.apache.spark.sql.types.StructType.fromDDL(
            strArg(es(1), "schema DDL")),
          versionOf(es(2)))
      df.queryExecution.analyzed
    }),
    "graft_tag" -> (es => {
      refuseInView("graft_tag")
      // NAMED SNAPSHOT: pins a version (default current) under a
      // stable name — `VERSION AS OF 'name'` / graft_table_at resolve
      // it and vacuum retains it until graft_delete_tag. Metadata-only.
      require(es.size == 2 || es.size == 3,
        "usage: graft_tag(root, name[, version])")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val name = strArg(es(1), "tag name")
      val v = graft.store.ManifestTable.tag(spark, root, name,
        if (es.size == 3) longArg(es(2), "version") else -1L)
      import spark.implicits._
      Seq((name, v)).toDF("tag_name", "tag_version")
        .queryExecution.analyzed
    }),
    "graft_delete_tag" -> (es => {
      refuseInView("graft_delete_tag")
      require(es.size == 2, "usage: graft_delete_tag(root, name)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val name = strArg(es(1), "tag name")
      val had = graft.store.ManifestTable.tagsOf(spark, root).get(name)
      graft.store.ManifestTable.deleteTag(spark, root, name)
      import spark.implicits._
      Seq((name, had.getOrElse(-1L), had.isDefined))
        .toDF("tag_name", "was_version", "existed")
        .queryExecution.analyzed
    }),
    "graft_add_constraint" -> (es => {
      refuseInView("graft_add_constraint")
      // Declares a CHECK constraint ([[ManifestTable.addConstraint]]):
      // validated against the current state (violations refuse,
      // loudly), then enforced inline on every row any writer
      // produces. NULL passes; only FALSE violates (SQL CHECK).
      require(es.size == 3,
        "usage: graft_add_constraint(root, name, checkSql)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val name = strArg(es(1), "constraint name")
      val sql = strArg(es(2), "check SQL")
      graft.store.ManifestTable.addConstraint(spark, root, name, sql)
      import spark.implicits._
      Seq((name, sql)).toDF("constraint_name", "check_sql")
        .queryExecution.analyzed
    }),
    "graft_drop_constraint" -> (es => {
      refuseInView("graft_drop_constraint")
      require(es.size == 2,
        "usage: graft_drop_constraint(root, name)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val name = strArg(es(1), "constraint name")
      val had = graft.store.ManifestTable.constraintsOf(spark, root)
        .get(name)
      graft.store.ManifestTable.dropConstraint(spark, root, name)
      import spark.implicits._
      Seq((name, had.orNull, had.isDefined))
        .toDF("constraint_name", "was_check_sql", "existed")
        .queryExecution.analyzed
    }),
    "graft_constraints" -> (es => {
      // observe face: the live constraint registry
      require(es.size == 1, "usage: graft_constraints(root)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      import spark.implicits._
      graft.store.ManifestTable.constraintsOf(spark, root).toSeq.sorted
        .toDF("constraint_name", "check_sql")
        .queryExecution.analyzed
    }),
    "graft_clone" -> (es => {
      refuseInView("graft_clone")
      // SHALLOW CLONE: a new table at dstRoot referencing the source
      // snapshot's files in place — zero data copied; the optional
      // 3rd arg picks a version (number) or tag (string); the
      // optional 4th (0/1) controls pinning the source version with
      // a clone-* tag (default 1 — the source's vacuum then retains
      // the referenced bytes until the tag is deleted).
      require(es.size >= 2 && es.size <= 4,
        "usage: graft_clone(srcRoot, dstRoot[, versionOrTag[, pin]])")
      val spark = SparkSession.active
      val src = strArg(es(0), "srcRoot")
      val dst = strArg(es(1), "dstRoot")
      val pin = es.size < 4 || longArg(es(3), "pin") != 0L
      val v =
        if (es.size < 3)
          graft.store.ManifestTable.cloneAt(spark, src, dst, pin = pin)
        else es(2).dataType match {
          case org.apache.spark.sql.types.StringType =>
            val sArg = strArg(es(2), "version or tag")
            val ver =
              if (sArg.nonEmpty && sArg.forall(_.isDigit)) sArg.toLong
              else graft.store.ManifestTable.resolveTag(spark, src, sArg)
            graft.store.ManifestTable.cloneAt(spark, src, dst, ver, pin)
          case _ =>
            graft.store.ManifestTable.cloneAt(spark, src, dst,
              longArg(es(2), "version"), pin)
        }
      import spark.implicits._
      Seq((src, dst, v, pin)).toDF("src_root", "dst_root",
        "cloned_version", "pinned")
        .queryExecution.analyzed
    }),
    "graft_merge_branch" -> (es => {
      refuseInView("graft_merge_branch")
      // BRANCH MERGE-BACK ([[ManifestTable.mergeBranch]]): the
      // diverged clone's net edits land on its source — one idempotent
      // upsert + one bounded delete; conflicts (keys changed on both
      // sides since the bind) refuse by default, or resolve under
      // 'branch' / 'source'. Returns (upserts, deletes, conflicts).
      require(es.size >= 3 && es.size <= 4,
        "usage: graft_merge_branch(srcRoot, branchRoot, token" +
          "[, onConflict])")
      val spark = SparkSession.active
      val (up, del, conf) = graft.store.ManifestTable.mergeBranch(
        spark, strArg(es(0), "srcRoot"), strArg(es(1), "branchRoot"),
        longArg(es(2), "token"),
        if (es.size == 4) strArg(es(3), "onConflict") else "fail")
      import spark.implicits._
      Seq((up, del, conf)).toDF("upserts", "deletes", "conflicts")
        .queryExecution.analyzed
    }),
    "graft_tags" -> (es => {
      // observe face: the live tag registry, name → pinned version
      require(es.size == 1, "usage: graft_tags(root)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      import spark.implicits._
      graft.store.ManifestTable.tagsOf(spark, root).toSeq.sorted
        .toDF("tag_name", "tag_version")
        .queryExecution.analyzed
    }),
    "graft_changes" -> (es => {
      // version arguments double as TAG names ("what changed between
      // corpus cuts": graft_changes(root, 'cut_v1', 'cut_v2')) — a
      // string that isn't all digits resolves through the tag registry
      require(es.size == 3 || es.size == 5,
        "usage: graft_changes(root[, schemaDDL, keyColumn], fromV, toV)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      def versionOf(e: org.apache.spark.sql.catalyst.expressions
          .Expression, what: String): Long = e.dataType match {
        case org.apache.spark.sql.types.StringType =>
          val s = strArg(e, what)
          if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
          else graft.store.ManifestTable.resolveTag(spark, root, s)
        case _ => longArg(e, what)
      }
      val df =
        if (es.size == 3) graft.store.ManifestTable.changes(spark, root,
          versionOf(es(1), "fromVersion"), versionOf(es(2), "toVersion"))
        else graft.store.ManifestTable.changes(spark, root,
          org.apache.spark.sql.types.StructType.fromDDL(
            strArg(es(1), "schema DDL")),
          strArg(es(2), "key column"),
          versionOf(es(3), "fromVersion"),
          versionOf(es(4), "toVersion"))
      df.queryExecution.analyzed
    }),
    "graft_count" -> (es => {
      // metadata-only count (ManifestTable.countRows): the one-row
      // result materializes AT PLAN TIME — zero data reads on a
      // compacted table, reconcile only over delta buckets. The count
      // is therefore frozen when the query resolves: a temp view over
      // graft_count keeps the value from view-creation time (every
      // sibling function returns a lazy plan; a lazy count here would
      // have to scan the data, defeating the point).
      require(es.size == 1 || es.size == 2,
        "usage: graft_count(root[, schemaDDL])")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val n =
        if (es.size == 1) graft.store.ManifestTable.countRows(spark, root)
        else graft.store.ManifestTable.countRows(spark, root,
          org.apache.spark.sql.types.StructType.fromDDL(
            strArg(es(1), "schema DDL")))
      import spark.implicits._
      Seq(n).toDF("n_rows").queryExecution.analyzed
    }),
    // ---- procedure-style maintenance surface ----------------------
    // Spark SQL has no CALL statement, so maintenance operations are
    // table functions that EXECUTE AT PLAN TIME and return their
    // outcome as a one-row result — the graft_count discipline, but
    // with a write. Each call is one committed action; wrapping one in
    // a view would re-run it at every view resolution, so resolving a
    // maintenance function INSIDE a view body fails loudly
    // ([[refuseInView]] — Spark re-analyzes a view's stored text on
    // every reference, and a silently re-merging SELECT is the worst
    // kind of surprise). The SQL surface covers identity-prep views
    // and auto-mapped merges; anything needing a custom `prep`
    // transform or import policies stays on the Scala API.
    "graft_merge" -> (es => {
      refuseInView("graft_merge")
      // Upserts the rows of a SQL query into a manifest table (creating
      // the table on first merge), under an auto-derived identity
      // mapping: standard update policy, every column mapped as-is.
      // Returns (version, applied) — applied=false when (streamId,
      // batchId) replays a committed batch (exactly-once under
      // at-least-once delivery).
      require(es.size == 6 || es.size == 7,
        "usage: graft_merge(root, schemaDDL, keyColumn, batchSql, " +
          "streamId, batchId[, numBuckets])")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        strArg(es(1), "schema DDL"))
      val kc = strArg(es(2), "key column")
      require(schema.fieldNames.contains(kc),
        s"key column $kc not in the schema DDL")
      val batch = spark.sql(strArg(es(3), "batch SQL"))
        .selectExpr(schema.fieldNames.map(f => s"`$f`").toIndexedSeq: _*)
      val m = graft.store.DerivedTable.identityMapping(schema, kc)
      val before = graft.store.ManifestTable.currentVersion(spark, root)
      graft.store.ManifestTable.merge(
        batch, longArg(es(5), "batchId"), m, root, schema,
        numBuckets = if (es.size == 7) longArg(es(6), "numBuckets").toInt
          else 16,
        streamId = strArg(es(4), "streamId"))
      val after = graft.store.ManifestTable.currentVersion(spark, root)
        .getOrElse(0L)
      import spark.implicits._
      Seq((after, before != Some(after))).toDF("version", "applied")
        .queryExecution.analyzed
    }),
    "graft_versions" -> (es => {
      // DESCRIBE HISTORY-equivalent: every committed version with its
      // bucket count and manifest-recorded row sum (exact on
      // all-compacted states; a delta-updated key counts per level —
      // the graft_count caveat). Plan-time materialization, like every
      // metadata-only function here.
      require(es.size == 1, "usage: graft_versions(root)")
      val spark = SparkSession.active
      val vs = graft.store.ManifestTable.versions(spark,
        strArg(es(0), "root"))
      import spark.implicits._
      vs.toDF("version", "num_buckets", "n_rows")
        .queryExecution.analyzed
    }),
    "graft_indexes" -> (es => {
      // The table's REGISTERED secondary indexes (the `indexreg`
      // registry [[graft.store.SecondaryIndex.register]] maintains):
      // one row per resolvable index with its layout facts, the base
      // version it has applied, and whether it is FRESH — the gate
      // every index-derived automatic rewrite/hint checks. Plan-time
      // materialization, like every metadata-only function here.
      require(es.size == 2, "usage: graft_indexes(root, schemaDDL)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        strArg(es(1), "schema DDL"))
      val cur = graft.store.ManifestTable.currentVersion(spark, root)
      val rows = graft.store.SecondaryIndex.registered(spark, root,
        schema).map { ix =>
        val applied =
          graft.store.SecondaryIndex.appliedVersion(spark, ix)
        (ix.valueCols.mkString(","), ix.indexRoot, ix.numBuckets,
          ix.rangeLayout, ix.numShards, applied,
          cur.contains(applied))
      }
      import spark.implicits._
      rows.toDF("value_cols", "index_root", "num_buckets",
        "range_layout", "num_shards", "applied_version", "fresh")
        .queryExecution.analyzed
    }),
    "graft_maintenance" -> (es => {
      // The table's DECLARED maintenance policy — the observe half of
      // graft_auto_maintain's declare: zone/bloom column sets, the
      // layout-drift threshold, and how much drift is pending right
      // now (live files non-cluster writers produced, and the buckets
      // over the threshold — what the NEXT commit would re-cluster).
      // Plan-time metadata; zero rows when nothing is declared.
      require(es.size == 1, "usage: graft_maintenance(root)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val rows = graft.store.ManifestTable.maintenanceOf(spark, root)
        .toSeq.map { pol =>
          val drift = pol.reclusterDrift
          val m = graft.store.ManifestTable
            .currentManifest(spark, root)
          val byBucket = m.map(_.entries.groupBy(_.bucket))
            .getOrElse(Map.empty)
          // drift is only meaningful against a DECLARED cluster
          // layout with a non-zero threshold: on a never-clustered
          // (or zones/bloom-only) table every file is cluster-unaware
          // and counting them all as "pending drift" would misread.
          val layoutDeclared =
            drift > 0 && m.exists(_.clusterCol.nonEmpty)
          val driftFiles =
            if (!layoutDeclared) 0
            else byBucket.values.map(_.count(!_.sorted)).sum
          val driftBuckets =
            if (!layoutDeclared) 0
            else byBucket.values.count(_.count(!_.sorted) >= drift)
          val oversize =
            if (pol.splitBytes <= 0) 0
            else byBucket.values
              .count(_.map(_.bytes).sum > pol.splitBytes)
          val overCompact =
            if (pol.compactFiles < 2) 0
            else byBucket.values.count(_.size >= pol.compactFiles)
          (pol.zones.mkString(","), pol.blooms.mkString(","), drift,
            driftFiles, driftBuckets, pol.derived, pol.splitBytes,
            oversize, pol.compactFiles, overCompact, pol.vacuumKeep,
            pol.statsCols.mkString(","), pol.ttlColumn, pol.ttlMs)
        }
      import spark.implicits._
      rows.toDF("zone_cols", "bloom_cols", "recluster_drift",
        "drift_files", "buckets_over_threshold", "maintain_derived",
        "split_bytes", "buckets_over_split", "compact_files",
        "buckets_over_compact", "vacuum_keep", "stats_cols",
        "ttl_column", "ttl_ms")
        .queryExecution.analyzed
    }),
    "graft_auto_maintain" -> (es => {
      refuseInView("graft_auto_maintain")
      // Declares zone/bloom sidecar maintenance on the commit path
      // ([[graft.store.ManifestTable.autoMaintain]]): from here on
      // every data commit refreshes the named columns' sidecars
      // incrementally. The optional 4th arg declares LAYOUT
      // maintenance too — recluster when a bucket accumulates that
      // many drift files (0 = off); the optional 5th declares
      // DERIVED-table maintenance: registered secondary indexes and
      // registered (prep-less) materialized views refresh on every
      // data commit, keeping the Auto* rewrite freshness gates closed
      // with no follower loop; the optional 6th declares SIZE
      // maintenance — split any leaf bucket over that many live bytes
      // from the commit hook; the optional 7th declares COMPACTION —
      // fold any bucket carrying that many or more live files (its
      // delta/tombstone chain) back to one; the optional 8th declares
      // RETENTION — vacuum at that keepLast after every commit
      // (tag-pinned snapshots and lagging derived tables' CDC windows
      // are respected). Re-declaring REPLACES (empty strings / zeros
      // stop).
      // the optional 9th/10th declare ROW TTL — every commit expires
      // rows whose ttlColumn is older than now − ttlMs via zone-probed
      // key tombstones (the Scala autoMaintain face's contract; a zone
      // on the TTL column must be declared in the same call)
      require(es.size >= 3 && es.size <= 11,
        "usage: graft_auto_maintain(root, zoneColsCsv, bloomColsCsv" +
          "[, reclusterDrift[, maintainDerived[, splitBytes" +
          "[, compactFiles[, vacuumKeep[, statsColsCsv" +
          "[, ttlColumn, ttlMs]]]]]]])")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      def cols(i: Int, what: String) = strArg(es(i), what)
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      val (z, b) = (cols(1, "zone columns"), cols(2, "bloom columns"))
      val drift =
        if (es.size >= 4) longArg(es(3), "reclusterDrift").toInt else 0
      val derived =
        es.size >= 5 && longArg(es(4), "maintainDerived") != 0L
      val splitBytes =
        if (es.size >= 6) longArg(es(5), "splitBytes") else 0L
      val compactFiles =
        if (es.size >= 7) longArg(es(6), "compactFiles").toInt else 0
      val vacuumKeep =
        if (es.size >= 8) longArg(es(7), "vacuumKeep").toInt else 0
      val statsCols =
        if (es.size >= 9) cols(8, "stats columns") else Nil
      require(es.size != 10,
        "declare ttlColumn and ttlMs together (both, or neither)")
      val ttlColumn =
        if (es.size >= 11) strArg(es(9), "ttl column").trim else ""
      val ttlMs = if (es.size >= 11) longArg(es(10), "ttlMs") else 0L
      graft.store.ManifestTable.autoMaintain(spark, root, z, b, drift,
        derived, splitBytes, compactFiles, vacuumKeep, statsCols,
        ttlColumn, ttlMs)
      import spark.implicits._
      Seq((z.mkString(","), b.mkString(","), drift, derived, splitBytes,
          compactFiles, vacuumKeep, statsCols.mkString(","), ttlColumn,
          ttlMs))
        .toDF("zone_cols", "bloom_cols", "recluster_drift",
          "maintain_derived", "split_bytes", "compact_files",
          "vacuum_keep", "stats_cols", "ttl_column", "ttl_ms")
        .queryExecution.analyzed
    }),
    "graft_vacuum" -> (es => {
      refuseInView("graft_vacuum")
      // Retention GC ([[ManifestTable.vacuum]]): drops manifests below
      // the keepLast window, their unreferenced data files, and
      // losing/torn side dirs; tagged snapshots and (optional 3rd arg)
      // versions younger than retainMillis are retained regardless.
      // Returns (versions_retained) — the manifests still readable
      // afterwards.
      require(es.size >= 1 && es.size <= 3,
        "usage: graft_vacuum(root[, keepLast[, retainMillis]])")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      graft.store.ManifestTable.vacuum(spark, root,
        keepLast =
          if (es.size >= 2) longArg(es(1), "keepLast").toInt else 1,
        retainMillis =
          if (es.size >= 3) longArg(es(2), "retainMillis") else 0L)
      import spark.implicits._
      Seq(graft.store.ManifestTable.versions(spark, root).size)
        .toDF("versions_retained").queryExecution.analyzed
    }),
    "graft_compact" -> (es => {
      refuseInView("graft_compact")
      // LSM maintenance ([[ManifestTable.compact]]): folds every
      // bucket carrying >= minFilesPerBucket files back to one.
      // Returns (version, compacted_buckets) — 0 buckets when nothing
      // is tiered enough or the token replays (either way no commit).
      require(es.size == 4 || es.size == 5,
        "usage: graft_compact(root, schemaDDL, keyColumn, token" +
          "[, minFilesPerBucket])")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        strArg(es(1), "schema DDL"))
      val written = graft.store.ManifestTable.compact(spark, root,
        schema, strArg(es(2), "key column"), longArg(es(3), "token"),
        minFilesPerBucket =
          if (es.size == 5) longArg(es(4), "minFilesPerBucket").toInt
          else 2)
      val after = graft.store.ManifestTable.currentVersion(spark, root)
        .getOrElse(0L)
      import spark.implicits._
      Seq((after, written.map(_.bucket).distinct.size))
        .toDF("version", "compacted_buckets").queryExecution.analyzed
    }),
    "graft_rename_column" -> (es => {
      refuseInView("graft_rename_column")
      // Metadata-only column rename through column mapping
      // ([[graft.store.ManifestTable.renameColumn]]): the on-file
      // physical name never changes, one manifest commit remaps the
      // logical name. Returns (version, column).
      require(es.size == 3,
        "usage: graft_rename_column(root, from, to)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val to = strArg(es(2), "new name")
      graft.store.ManifestTable.renameColumn(spark, root,
        strArg(es(1), "old name"), to)
      val after = graft.store.ManifestTable.currentVersion(spark, root)
        .getOrElse(0L)
      import spark.implicits._
      Seq((after, to)).toDF("version", "column")
        .queryExecution.analyzed
    }),
    "graft_restore" -> (es => {
      refuseInView("graft_restore")
      // Point-in-time rollback ([[ManifestTable.restore]]): a
      // metadata-only forward commit re-referencing toVersion's files.
      // Returns (version, applied) — applied=false when the token
      // replays an already-committed restore.
      require(es.size == 3,
        "usage: graft_restore(root, toVersion, token)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val before = graft.store.ManifestTable.currentVersion(spark, root)
      graft.store.ManifestTable.restore(spark, root,
        longArg(es(1), "toVersion"), longArg(es(2), "token"))
      val after = graft.store.ManifestTable.currentVersion(spark, root)
        .getOrElse(0L)
      import spark.implicits._
      Seq((after, before != Some(after))).toDF("version", "applied")
        .queryExecution.analyzed
    }),
    "graft_probe_join" -> (es => {
      // Dim-driven pruned JOIN from SQL
      // ([[graft.store.ManifestTable.probeJoin]]): the dim side is a
      // SQL query (the graft_merge convention); its bounded distinct
      // keys collect when this function RESOLVES (the graft_count
      // discipline — a view wrapping it re-probes per reference, which
      // costs a bounded job, never a hidden write). Join types:
      // inner (default) / left_semi.
      require(es.size == 4 || es.size == 5,
        "usage: graft_probe_join(root, schemaDDL, dimSql, dimKeyCol" +
          "[, joinType])")
      val spark = SparkSession.active
      val dim = spark.sql(strArg(es(2), "dim SQL"))
      graft.store.ManifestTable.probeJoin(spark,
        strArg(es(0), "root"),
        org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        dim, strArg(es(3), "dim key column"),
        joinType =
          if (es.size == 5) strArg(es(4), "join type") else "inner")
        .queryExecution.analyzed
    }),
    "graft_delete_where" -> (es => {
      refuseInView("graft_delete_where")
      // Row-level DELETE by arbitrary predicate for PATH tables
      // ([[graft.store.ManifestTable.deleteWhere]] — catalog tables get
      // the same through plain SQL `DELETE FROM`): the predicate is a
      // SQL boolean expression over the table's columns, evaluated with
      // the statement's NULL-keeps semantics; cost = one pruned
      // discovery scan + touched-bucket rewrites, one commit. Returns
      // (version, applied).
      require(es.size == 4,
        "usage: graft_delete_where(root, schemaDDL, predicateSql, token)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val predicate = strArg(es(2), "predicate SQL")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        strArg(es(1), "schema DDL"))
      val before = graft.store.ManifestTable.currentVersion(spark, root)
      // resolve the predicate once against the table's own read to
      // derive the same zone/bloom discovery hints the catalog
      // DELETE FROM path gets (resolution also fails loudly on typos
      // BEFORE any commit-path work)
      val resolved = graft.store.ManifestTable.read(spark, root, schema)
        .filter(org.apache.spark.sql.functions.expr(predicate))
        .queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }
      import graft.store.{GraftDml, ZoneSkip}
      graft.store.ManifestTable.deleteWhere(spark, root, schema,
        df => org.apache.spark.sql.functions.expr(predicate),
        longArg(es(3), "token"),
        zoneRanges = resolved.map(GraftDml.zoneHints).getOrElse(Nil)
          .filter { case (c, _, _) =>
            schema.fieldNames.contains(c) && scala.util.Try(
              ZoneSkip.kindOf(schema(c).dataType)).isSuccess
          },
        bloomProbes = resolved.map(GraftDml.bloomHints).getOrElse(Nil)
          .filter { case (c, _) => schema.fieldNames.contains(c) })
      val after = graft.store.ManifestTable.currentVersion(spark, root)
        .getOrElse(0L)
      import spark.implicits._
      Seq((after, before != Some(after))).toDF("version", "applied")
        .queryExecution.analyzed
    }),
    "graft_update" -> (es => {
      refuseInView("graft_update")
      // Row-level UPDATE by arbitrary predicate for PATH tables
      // ([[graft.store.ManifestTable.updateWhere]] — catalog tables
      // get the same through plain SQL `UPDATE`, and ``graft.`/path``
      // idents give path tables the full statement too; this face is
      // the catalog-free, EXPLICIT-TOKEN variant mirroring
      // graft_delete_where's replay discipline). Assignments ride as
      // (column, exprSql) PAIRS — a single comma-joined SET string
      // cannot be split without re-implementing the SQL lexer
      // (commas nest inside calls and literals), so the face refuses
      // the ambiguity by construction. Returns (version, applied).
      require(es.size >= 6 && es.size % 2 == 0,
        "usage: graft_update(root, schemaDDL, predicateSql, token, " +
          "setCol, setExprSql [, setCol2, setExprSql2 ...])")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val predicate = strArg(es(2), "predicate SQL")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        strArg(es(1), "schema DDL"))
      val sets = es.drop(4).grouped(2).map { case Seq(c, e) =>
        strArg(c, "set column") -> strArg(e, "set expression SQL")
      }.toSeq
      val before = graft.store.ManifestTable.currentVersion(spark, root)
      // one resolution pass against the table's own read: loud
      // failures on typos BEFORE commit-path work, and the resolved
      // predicate yields the same zone/bloom/index discovery hints
      // the catalog UPDATE path derives from its statement
      val probe = graft.store.ManifestTable.read(spark, root, schema)
      sets.foreach { case (c, e) =>
        probe.select(org.apache.spark.sql.functions.expr(e).as(c))
          .queryExecution.analyzed
      }
      val resolved = probe
        .filter(org.apache.spark.sql.functions.expr(predicate))
        .queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }
      import graft.store.{GraftDml, ZoneSkip}
      val equalityHints = resolved.map(GraftDml.bloomHints).getOrElse(Nil)
        .filter { case (c, _) => schema.fieldNames.contains(c) }
      graft.store.ManifestTable.updateWhere(spark, root, schema,
        df => sets.map { case (c, e) =>
          c -> org.apache.spark.sql.functions.expr(e) },
        df => org.apache.spark.sql.functions.expr(predicate),
        longArg(es(3), "token"),
        zoneRanges = resolved.map(GraftDml.zoneHints).getOrElse(Nil)
          .filter { case (c, _, _) =>
            schema.fieldNames.contains(c) && scala.util.Try(
              ZoneSkip.kindOf(schema(c).dataType)).isSuccess
          },
        bloomProbes = equalityHints,
        indexProbes = equalityHints)
      val after = graft.store.ManifestTable.currentVersion(spark, root)
        .getOrElse(0L)
      import spark.implicits._
      Seq((after, before != Some(after))).toDF("version", "applied")
        .queryExecution.analyzed
    }),
    "graft_cluster_by" -> (es => {
      refuseInView("graft_cluster_by")
      // Maintenance re-clustering ([[ManifestTable.clusterBy]]): same
      // buckets, files re-laid out ordered by a non-key column so zone
      // maps prune. Returns (version, applied) — applied=false when the
      // token replays an already-committed clusterBy.
      require(es.size == 5 || es.size == 6,
        "usage: graft_cluster_by(root, schemaDDL, keyColumn, " +
          "clusterColumn, token[, filesPerBucket])")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val before = graft.store.ManifestTable.currentVersion(spark, root)
      graft.store.ManifestTable.clusterBy(spark, root,
        org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        strArg(es(2), "key column"),
        strArg(es(3), "cluster column"),
        longArg(es(4), "token"),
        filesPerBucket =
          if (es.size == 6) longArg(es(5), "filesPerBucket").toInt else 4)
      val after = graft.store.ManifestTable.currentVersion(spark, root)
        .getOrElse(0L)
      import spark.implicits._
      Seq((after, before != Some(after))).toDF("version", "applied")
        .queryExecution.analyzed
    }),
    "graft_recluster" -> (es => {
      refuseInView("graft_recluster")
      // INCREMENTAL layout refresh ([[ManifestTable.recluster]]): only
      // buckets holding >= minDriftFiles non-cluster-written files
      // rewrite; the layout definition (plain column or zorder) comes
      // from the manifest. Returns (version, applied, buckets) —
      // applied=false when the token replays; a no-drift call commits
      // the token (applied=true) with buckets=0.
      require(es.size >= 3 && es.size <= 5,
        "usage: graft_recluster(root, schemaDDL, token" +
          "[, filesPerBucket, minDriftFiles])")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val before = graft.store.ManifestTable.currentVersion(spark, root)
      val buckets = graft.store.ManifestTable.recluster(spark, root,
        org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        longArg(es(2), "token"),
        filesPerBucket =
          if (es.size >= 4) longArg(es(3), "filesPerBucket").toInt else 4,
        minDriftFiles =
          if (es.size >= 5) longArg(es(4), "minDriftFiles").toInt else 1)
      val after = graft.store.ManifestTable.currentVersion(spark, root)
        .getOrElse(0L)
      import spark.implicits._
      Seq((after, before != Some(after), buckets.size))
        .toDF("version", "applied", "buckets")
        .queryExecution.analyzed
    }),
    "graft_split_buckets" -> (es => {
      refuseInView("graft_split_buckets")
      // ONLINE bucket split ([[ManifestTable.splitBuckets]]): leaves
      // over maxBytes rewrite leaf-locally into 2^k children under the
      // manifest-recorded split tree; untouched leaves carry verbatim.
      // Returns (version, applied, buckets) — the graft_recluster
      // contract; a no-split call commits the token with buckets=0.
      require(es.size == 4,
        "usage: graft_split_buckets(root, schemaDDL, token, maxBytes)")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val before = graft.store.ManifestTable.currentVersion(spark, root)
      val buckets = graft.store.ManifestTable.splitBuckets(spark, root,
        org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        longArg(es(2), "token"),
        maxBytes = longArg(es(3), "maxBytes"))
      val after = graft.store.ManifestTable.currentVersion(spark, root)
        .getOrElse(0L)
      import spark.implicits._
      Seq((after, before != Some(after), buckets.size))
        .toDF("version", "applied", "buckets")
        .queryExecution.analyzed
    }),
    "graft_zorder_by" -> (es => {
      refuseInView("graft_zorder_by")
      // Multi-column maintenance re-clustering
      // ([[ManifestTable.zOrderBy]]): Morton-interleaved layout so zone
      // maps prune a box probe on EVERY listed column. Columns are a
      // comma-separated list. Returns (version, applied).
      require(es.size == 5 || es.size == 6,
        "usage: graft_zorder_by(root, schemaDDL, keyColumn, " +
          "'colA,colB[,...]', token[, filesPerBucket])")
      val spark = SparkSession.active
      val root = strArg(es(0), "root")
      val before = graft.store.ManifestTable.currentVersion(spark, root)
      graft.store.ManifestTable.zOrderBy(spark, root,
        org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        strArg(es(2), "key column"),
        strArg(es(3), "z-order columns").split(',').map(_.trim).toSeq,
        longArg(es(4), "token"),
        filesPerBucket =
          if (es.size == 6) longArg(es(5), "filesPerBucket").toInt else 4)
      val after = graft.store.ManifestTable.currentVersion(spark, root)
        .getOrElse(0L)
      import spark.implicits._
      Seq((after, before != Some(after))).toDF("version", "applied")
        .queryExecution.analyzed
    }),
    "graft_refresh_view" -> (es => {
      // Ensure-semantics for a persistent materialized view: CREATES
      // the view table (full aggregate of the base's current version)
      // when `viewRoot` has none, else advances it from the CDC feed.
      // Returns (applied_version, action ∈ created|refreshed|noop).
      // Grouping/sum/min-max columns are comma-separated lists; pass ''
      // for no min/max columns.
      refuseInView("graft_refresh_view")
      require(es.size == 7 || es.size == 8,
        "usage: graft_refresh_view(baseRoot, schemaDDL, baseKey, " +
          "viewRoot, groupCols, sumCols, minMaxCols[, numBuckets])")
      val spark = SparkSession.active
      val vd = graft.store.MaterializedView.View(
        baseRoot = strArg(es(0), "base root"),
        baseSchema = org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        baseKey = strArg(es(2), "base key"),
        viewRoot = strArg(es(3), "view root"),
        groupCols = csvArg(es(4), "group columns"),
        sumCols = csvArg(es(5), "sum columns"),
        minMaxCols = csvArg(es(6), "min/max columns"),
        numBuckets = if (es.size == 8) longArg(es(7), "numBuckets").toInt
          else 16)
      val (v, action) =
        if (graft.store.ManifestTable.currentVersion(spark, vd.viewRoot)
            .isEmpty)
          (graft.store.MaterializedView.create(spark, vd), "created")
        else graft.store.MaterializedView.refresh(spark, vd) match {
          case Some(nv) => (nv, "refreshed")
          case None =>
            (graft.store.MaterializedView.appliedVersion(spark, vd),
              "noop")
        }
      import spark.implicits._
      Seq((v, action)).toDF("applied_version", "action")
        .queryExecution.analyzed
    }),
    "graft_view" -> (es => {
      // The committed contents of a materialized view (lazy plan, same
      // as every read function). Same arguments as graft_refresh_view
      // minus numBuckets (reads never need it).
      require(es.size == 7,
        "usage: graft_view(baseRoot, schemaDDL, baseKey, viewRoot, " +
          "groupCols, sumCols, minMaxCols)")
      val spark = SparkSession.active
      val vd = graft.store.MaterializedView.View(
        baseRoot = strArg(es(0), "base root"),
        baseSchema = org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        baseKey = strArg(es(2), "base key"),
        viewRoot = strArg(es(3), "view root"),
        groupCols = csvArg(es(4), "group columns"),
        sumCols = csvArg(es(5), "sum columns"),
        minMaxCols = csvArg(es(6), "min/max columns"))
      graft.store.MaterializedView.read(spark, vd)
        .queryExecution.analyzed
    }),
    "graft_refresh_index" -> (es => {
      // Ensure-semantics for a secondary index (create-or-advance),
      // mirroring graft_refresh_view. Composite indexes take a
      // comma-separated value-column list.
      refuseInView("graft_refresh_index")
      require(es.size >= 5 && es.size <= 7,
        "usage: graft_refresh_index(baseRoot, schemaDDL, baseKey, " +
          "indexRoot, valueCols[, numBuckets[, numShards]])")
      val spark = SparkSession.active
      val ix = graft.store.SecondaryIndex.Index(
        baseRoot = strArg(es(0), "base root"),
        baseSchema = org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        baseKey = strArg(es(2), "base key"),
        indexRoot = strArg(es(3), "index root"),
        valueCols = csvArg(es(4), "value columns"),
        numBuckets = if (es.size >= 6) longArg(es(5), "numBuckets").toInt
          else 16,
        numShards = if (es.size == 7) longArg(es(6), "numShards").toInt
          else 1)
      val (v, action) =
        if (graft.store.ManifestTable.currentVersion(spark, ix.indexRoot)
            .isEmpty)
          (graft.store.SecondaryIndex.create(spark, ix), "created")
        else graft.store.SecondaryIndex.refresh(spark, ix) match {
          case Some(nv) => (nv, "refreshed")
          case None =>
            (graft.store.SecondaryIndex.appliedVersion(spark, ix),
              "noop")
        }
      import spark.implicits._
      Seq((v, action)).toDF("applied_version", "action")
        .queryExecution.analyzed
    }),
    "graft_index" -> (es => {
      // The committed (value columns, sorted key list) index contents.
      require(es.size == 5 || es.size == 6,
        "usage: graft_index(baseRoot, schemaDDL, baseKey, indexRoot, " +
          "valueCols[, numShards])")
      val spark = SparkSession.active
      val ix = graft.store.SecondaryIndex.Index(
        baseRoot = strArg(es(0), "base root"),
        baseSchema = org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        baseKey = strArg(es(2), "base key"),
        indexRoot = strArg(es(3), "index root"),
        valueCols = csvArg(es(4), "value columns"),
        numShards = if (es.size == 6) longArg(es(5), "numShards").toInt
          else 1)
      graft.store.SecondaryIndex.read(spark, ix)
        .queryExecution.analyzed
    }),
    "graft_lookup" -> (es => {
      // pruned point read: only the key's bucket files, range-narrowed.
      // Like graft_count, the manifest is resolved AT PLAN TIME (the
      // bucket pruning needs the current file list), so a temp view or
      // cached plan over graft_lookup freezes the file set at
      // view-creation time — re-issue the query to see later commits;
      // don't wrap it in long-lived views.
      // The probe must carry the KEY COLUMN'S type before it is hashed
      // for bucket targeting: Spark's hash is type-dependent, so e.g.
      // an SQL integer literal probing a BIGINT key column would hash
      // to the wrong bucket and silently miss.
      require(es.size == 4,
        "usage: graft_lookup(root, schemaDDL, keyColumn, key)")
      val spark = SparkSession.active
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        strArg(es(1), "schema DDL"))
      val kc = strArg(es(2), "key column")
      require(schema.fieldNames.contains(kc),
        s"key column $kc not in the schema DDL")
      val raw = typedArg(es(3), "key")
      val key = spark.range(1)
        .select(org.apache.spark.sql.functions.lit(raw)
          .cast(schema(kc).dataType))
        .head().get(0)
      graft.store.ManifestTable.lookup(spark, strArg(es(0), "root"),
          schema, kc, Seq(key))
        .queryExecution.analyzed
    }),
    "graft_bloom_build" -> (es => {
      // Procedure-style (the graft_merge discipline, incl. the in-view
      // refusal): builds per-file Bloom sidecars for the named columns
      // over every current file not yet covered. Returns
      // (filters_built) — 0 means already covered.
      refuseInView("graft_bloom_build")
      require(es.size == 3 || es.size == 4,
        "usage: graft_bloom_build(root, schemaDDL, cols[, fpp])")
      val spark = SparkSession.active
      val n = graft.store.BloomSkip.buildBlooms(spark,
        strArg(es(0), "root"),
        org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        csvArg(es(2), "columns"),
        fpp = if (es.size == 4) foldableArg(es(3), "fpp") match {
          case d: Double => d
          case other => throw new IllegalArgumentException(
            s"fpp must be a double literal, got $other")
        } else 0.03)
      import spark.implicits._
      Seq(n).toDF("filters_built").queryExecution.analyzed
    }),
    "graft_bloom_lookup" -> (es => {
      // Bloom-pruned point read on a non-key column (graft_lookup's
      // plan-time-manifest caveat applies). The probe literal is cast
      // to the column's declared type so the hash matches the build.
      require(es.size == 4,
        "usage: graft_bloom_lookup(root, schemaDDL, column, value)")
      val spark = SparkSession.active
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        strArg(es(1), "schema DDL"))
      val c = strArg(es(2), "column")
      require(schema.fieldNames.contains(c),
        s"column $c not in the schema DDL")
      val raw = typedArg(es(3), "value")
      val value = spark.range(1)
        .select(org.apache.spark.sql.functions.lit(raw)
          .cast(schema(c).dataType))
        .head().get(0)
      graft.store.BloomSkip.lookupByColumn(spark,
        strArg(es(0), "root"), schema, c, value)
        .queryExecution.analyzed
    }),
    "graft_analyze" -> (es => {
      // INCREMENTAL ANALYZE ([[graft.store.ColStats]]): builds per-file
      // column stats (row/null counts + a mergeable HLL distinct
      // sketch) for every live file not yet covered, then returns the
      // table-level fold — (column, row_count, null_count, ndv,
      // covered_files, live_files, single_seq). Covered files never
      // rescan: ANALYZE cost rides the change rate.
      refuseInView("graft_analyze")
      require(es.size == 3,
        "usage: graft_analyze(root, schemaDDL, cols)")
      val spark = SparkSession.active
      graft.store.ColStats.analyze(spark,
        strArg(es(0), "root"),
        org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        csvArg(es(2), "columns"))
        .queryExecution.analyzed
    }),
    "graft_col_stats" -> (es => {
      // observe face: the table-level stats fold over ALREADY-covered
      // files (no build, no data read) — (column, row_count,
      // null_count, ndv, covered_files, live_files, single_seq).
      require(es.size == 2,
        "usage: graft_col_stats(root, cols)")
      val spark = SparkSession.active
      graft.store.ColStats.tableStats(spark,
        strArg(es(0), "root"), csvArg(es(1), "columns"))
        .queryExecution.analyzed
    }),
    "graft_zone_build" -> (es => {
      // Procedure-style: builds per-file min/max zone sidecars for the
      // named columns over every current file not yet covered. Returns
      // (zones_built) — 0 means already covered.
      refuseInView("graft_zone_build")
      require(es.size == 3,
        "usage: graft_zone_build(root, schemaDDL, cols)")
      val spark = SparkSession.active
      val n = graft.store.ZoneSkip.buildZones(spark,
        strArg(es(0), "root"),
        org.apache.spark.sql.types.StructType.fromDDL(
          strArg(es(1), "schema DDL")),
        csvArg(es(2), "columns"))
      import spark.implicits._
      Seq(n).toDF("zones_built").queryExecution.analyzed
    }),
    "graft_zone_lookup" -> (es => {
      // Zone-pruned RANGE read on a non-key column — BETWEEN semantics,
      // either bound NULL = unbounded on that side (graft_lookup's
      // plan-time-manifest caveat applies). Bounds are cast to the
      // column's declared type so probe and zone share one domain.
      require(es.size == 5,
        "usage: graft_zone_lookup(root, schemaDDL, column, lo, hi)")
      val spark = SparkSession.active
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        strArg(es(1), "schema DDL"))
      val c = strArg(es(2), "column")
      require(schema.fieldNames.contains(c),
        s"column $c not in the schema DDL")
      graft.store.ZoneSkip.lookupRange(spark,
        strArg(es(0), "root"), schema, c,
        typedArg(es(3), "lo"), typedArg(es(4), "hi"))
        .queryExecution.analyzed
    }),
    "graft_index_lookup" -> (es => {
      // Point query THROUGH a secondary index: index lookup → keys →
      // base lookup, the two-pruned-reads plan a non-key `=` predicate
      // wants. Same plan-time-manifest caveat as graft_lookup (the
      // bucket targeting resolves the current file lists when the
      // query plans — don't wrap in long-lived views). Single value
      // column only from SQL (composite probes stay on the Scala API);
      // the probe literal is cast to the value column's declared type
      // so typed indexes probe correctly.
      require(es.size == 6 || es.size == 7,
        "usage: graft_index_lookup(baseRoot, schemaDDL, baseKey, " +
          "indexRoot, valueCol, value[, numShards])")
      val spark = SparkSession.active
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        strArg(es(1), "schema DDL"))
      val vc = strArg(es(4), "value column")
      require(schema.fieldNames.contains(vc),
        s"value column $vc not in the schema DDL")
      val ix = graft.store.SecondaryIndex.Index(
        baseRoot = strArg(es(0), "base root"),
        baseSchema = schema,
        baseKey = strArg(es(2), "base key"),
        indexRoot = strArg(es(3), "index root"),
        valueCols = Seq(vc),
        numShards = if (es.size == 7) longArg(es(6), "numShards").toInt
          else 1)
      val raw = typedArg(es(5), "value")
      val value = spark.range(1)
        .select(org.apache.spark.sql.functions.lit(raw)
          .cast(schema(vc).dataType))
        .head().get(0)
      graft.store.SecondaryIndex.lookupBy(spark, ix, value)
        .queryExecution.analyzed
    }))

  /** Registers all graft SQL functions on an existing session, plus the
    * `format("graft")` read strategy (extensions can only be injected at
    * build time; `experimental.extraStrategies` is the runtime seam). */
  def register(spark: SparkSession): Unit = {
    definitions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    tableDefinitions.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    if (!spark.experimental.extraStrategies
        .exists(_.isInstanceOf[graft.store.GraftReadStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+
          new graft.store.GraftReadStrategy(spark)
    if (!spark.experimental.extraStrategies
        .exists(_.isInstanceOf[graft.store.GraftDmlStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+
          new graft.store.GraftDmlStrategy(spark)
    // Post-hoc sessions take the rule through the user-provided
    // optimizer batch (runs after scan pushdown — AutoProbeJoin
    // matches the post-pushdown scan-relation shape there).
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.store.AutoProbeJoin]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          new graft.store.AutoProbeJoin(spark)
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.store.AutoIndexFilter]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          new graft.store.AutoIndexFilter(spark)
  }
}
