package graft.store

import java.util.Collections

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{
  Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog,
  TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 [[TableCatalog]] over manifest tables: NAMED tables instead of
  * path strings — the gesture a Spark SQL user actually starts with.
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.store.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/graft
  *
  *   CREATE NAMESPACE graft.db
  *   CREATE TABLE graft.db.users (id BIGINT, name STRING) USING graft
  *     TBLPROPERTIES ('key'='id', 'numBuckets'='32')
  *   INSERT INTO graft.db.users VALUES (1, 'a')     -- key-matched MERGE
  *   INSERT OVERWRITE graft.db.users SELECT ...     -- one-commit replace
  *   SELECT * FROM graft.db.users WHERE id = 1      -- pruned native scan
  *   SELECT * FROM graft.db.users VERSION AS OF 3   -- time travel
  *   df.write.saveAsTable("graft.db.events")        -- CTAS
  * }}}
  *
  * LAYOUT: a table named `db.t` lives at `<warehouse>/db/t` — the
  * catalog is a pure NAME → ROOT mapping plus directory listing; ALL
  * table metadata (schema, key, layout, versions) stays in the
  * manifest, where the path-based faces (`graft_table(root)`,
  * `format("graft").load(root)`, the Scala API) read the SAME state.
  * A catalog table and a path read of its root are one table, not two
  * systems — there is no second metastore to drift.
  *
  * The table's existence marker is its `manifest/` directory, written
  * atomically by the first commit; CREATE bootstraps an EMPTY version-0
  * manifest recording schema + key, so `CREATE TABLE` → `INSERT INTO`
  * behaves as SQL expects. Reads require [[graft.GraftExtensions]]
  * (session extensions or `register(spark)`), which inject the
  * strategy that plans [[GraftBatchScan]].
  *
  * At 100 TB the catalog adds ZERO planning overhead over the path
  * faces: `loadTable` is one manifest-head read (no listing), and
  * everything after resolution is the same zero-listing
  * manifest-backed scan. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"
  private var warehouse: String = _

  override def name(): String = catalogName

  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      SparkSession.active.sessionState.conf.warehousePath
        .stripSuffix("/") + "/graft")
  }

  private def spark: SparkSession = SparkSession.active

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Name components must be path-safe: the name IS the directory. */
  private def safe(part: String): String = {
    require(part.nonEmpty && !part.contains("/") && !part.contains("..") &&
      !part.startsWith("."),
      s"illegal graft table/namespace name component: '$part'")
    part
  }

  private def nsPath(namespace: Array[String]): Path =
    new Path((warehouse +: namespace.map(safe)).mkString("/"))

  /** PATH identifier (the Delta `delta.`/path`` convention): a
    * single-part name containing a `/` is the table's root directory
    * verbatim — ``graft.`target/tables/t` `` or
    * ``graft.`s3a://bucket/t` `` — no warehouse prefix. This is what
    * gives PATH tables the full SQL DML surface (UPDATE / DELETE /
    * MERGE INTO / time travel) without a registration step: the
    * resolved [[GraftTable]] is byte-identical to a warehouse table's,
    * so every downstream strategy serves it unchanged. */
  private def isPathIdent(ident: Identifier): Boolean =
    ident.namespace.isEmpty && ident.name.contains("/")

  private def rootOf(ident: Identifier): String =
    if (isPathIdent(ident)) ident.name
    else ((warehouse +: ident.namespace.map(safe)) :+ safe(ident.name))
      .mkString("/")

  private def isTable(root: String): Boolean =
    ManifestTable.currentVersion(spark, root).isDefined

  // -------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    val f = fs(p)
    if (!f.exists(p)) throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchNamespaceException(namespace)
    f.listStatus(p).toSeq
      // probe via the FULLY-QUALIFIED path: stripping to toUri.getPath
      // would resolve against the DEFAULT filesystem and misclassify
      // every table on a scheme-qualified warehouse (s3a://...)
      .filter(s => s.isDirectory && isTable(s.getPath.toString))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(rootOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    if (!isTable(root)) throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchTableException((ident.namespace :+ ident.name).toSeq)
    val schema = ManifestTable.recordedSchema(spark, root).getOrElse(
      throw new IllegalStateException(
        s"table $ident at $root records no schema (pre-format-7) — " +
          "read it through graft_table(root, ddl) instead"))
    GraftTable(root, None, schema)
  }

  /** `VERSION AS OF` time travel: the snapshot under ITS OWN recorded
    * schema (travel across an add-only evolution shows each version
    * with the columns it actually had). A NON-numeric version string is
    * a TAG name ([[ManifestTable.tag]]) — `VERSION AS OF 'corpus_v1'`
    * reads the pinned snapshot; tag names require a non-digit, so a
    * tag can never shadow a numeric version. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    if (!isTable(root)) throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchTableException((ident.namespace :+ ident.name).toSeq)
    val v =
      try version.toLong
      catch {
        case _: NumberFormatException =>
          ManifestTable.resolveTag(spark, root, version)
      }
    val m = ManifestTable.readManifest(spark, root, v)
    require(m.schemaJson.nonEmpty,
      s"manifest m$v at $root records no schema (pre-format-7)")
    GraftTable(root, Some(v),
      org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
        .asInstanceOf[StructType])
  }

  /** `TIMESTAMP AS OF` time travel: the newest version committed at or
    * before the asked instant (Spark hands MICROseconds; commit time
    * is the manifest file's mtime — the same clock history expiry and
    * vacuum's age window read). */
  override def loadTable(ident: Identifier, timestampMicros: Long)
      : Table = {
    val root = rootOf(ident)
    if (!isTable(root)) throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchTableException((ident.namespace :+ ident.name).toSeq)
    val v = ManifestTable.versionAtTime(spark, root,
      timestampMicros / 1000L)
    val m = ManifestTable.readManifest(spark, root, v)
    require(m.schemaJson.nonEmpty,
      s"manifest m$v at $root records no schema (pre-format-7)")
    GraftTable(root, Some(v),
      org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
        .asInstanceOf[StructType])
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables manage their own bucket layout — use " +
        "TBLPROPERTIES ('numBuckets'='N') instead of PARTITIONED BY")
    val root = rootOf(ident)
    if (isTable(root)) throw new org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException((ident.namespace :+ ident.name).toSeq)
    val props = properties.asScala
    def prop(k: String): Option[String] =
      props.get(k).orElse(props.get(TableCatalog.OPTION_PREFIX + k))
    val key = prop("key").getOrElse("id")
    require(schema.fieldNames.contains(key),
      s"key column '$key' not in the schema — declare it, or set " +
        "TBLPROPERTIES ('key'='<column>')")
    val numBuckets = prop("numBuckets").map(_.toInt).getOrElse(16)
    // PRE-validate constraint properties before anything commits: a
    // bad constraint SQL that only surfaced in addConstraint left a
    // half-created table behind a failed CREATE (the retry then hit
    // TableAlreadyExists and needed a manual DROP)
    props.toSeq.sortBy(_._1).foreach { case (k, sql) =>
      if (k.startsWith("constraint.")) {
        val expr =
          try spark.sessionState.sqlParser.parseExpression(sql)
          catch { case e: Exception =>
            throw new IllegalArgumentException(
              s"TBLPROPERTIES '$k' is not a parseable boolean SQL " +
                s"expression: ${e.getMessage}")
          }
        val missing = expr.references.map(_.name)
          .filterNot(n => schema.fieldNames.exists(_.equalsIgnoreCase(n)))
        require(missing.isEmpty,
          s"TBLPROPERTIES '$k' references column(s) " +
            s"${missing.mkString(", ")} not in the declared schema")
      }
    }
    // bootstrap an EMPTY version-0 manifest: schema + key + layout
    // recorded, zero data files — INSERT INTO then merges normally
    ManifestTable.create(
      spark.createDataFrame(Collections.emptyList[org.apache.spark.sql.Row](),
        schema),
      key, root, numBuckets)
    // CHECK constraints at CREATE: TBLPROPERTIES
    // ('constraint.<name>'='<boolean sql>') declare the data contract
    // before the first row lands (the empty table trivially validates)
    props.toSeq.sortBy(_._1).foreach { case (k, sql) =>
      if (k.startsWith("constraint."))
        ManifestTable.addConstraint(spark, root,
          k.stripPrefix("constraint."), sql)
    }
    GraftTable(root, None, schema)
  }

  /** `ALTER TABLE ... ADD COLUMNS` — the DDL face of add-only schema
    * evolution: a METADATA-ONLY manifest commit recording the widened
    * schema (old files read the new columns as NULLs; evolving a
    * 100 TB table costs one manifest write) — and `ALTER TABLE ...
    * RENAME COLUMN` — metadata-only through column mapping
    * ([[ManifestTable.renameColumn]]: the physical on-file name never
    * changes, readers translate). `SET/UNSET TBLPROPERTIES
    * ('constraint.<name>'[='<sql>'])` declares/drops CHECK
    * constraints. `DROP COLUMN` serves [[ManifestTable.dropColumn]]
    * (metadata-only logical drop; the physical name stays claimed via
    * the `#drop:` sentinel so a re-add can never leak old bytes) and
    * `ALTER COLUMN ... TYPE` serves [[ManifestTable.widenColumn]]
    * (safe widenings only — integral up-casts, float→double, decimal
    * precision-up; narrowing and key/bloom columns refuse there).
    * Each statement carries ONE change kind; mixes refuse. */
  override def alterTable(
      ident: Identifier, changes: TableChange*): Table = {
    val root = rootOf(ident)
    if (!isTable(root)) throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchTableException((ident.namespace :+ ident.name).toSeq)
    val renames = changes.collect {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "graft ALTER TABLE renames top-level columns only, got " +
            r.fieldNames.mkString("."))
        r.fieldNames.head -> r.newName
    }
    // `ALTER TABLE ... SET TBLPROPERTIES ('constraint.<n>'='<sql>')` /
    // `UNSET TBLPROPERTIES ('constraint.<n>')` — the DDL face of the
    // CHECK-constraint registry (SET validates against current data
    // like addConstraint always does)
    val consSet = changes.collect {
      case p: TableChange.SetProperty
          if p.property.startsWith("constraint.") =>
        (p.property.stripPrefix("constraint."), Some(p.value))
      case p: TableChange.RemoveProperty
          if p.property.startsWith("constraint.") =>
        (p.property.stripPrefix("constraint."), None)
    }
    // `ALTER TABLE ... DROP COLUMN c` — the DDL face of the logical
    // drop (reads stop projecting; later rewrites shed physically;
    // the `#drop:` sentinel keeps the physical name claimed)
    val drops = changes.collect {
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "graft ALTER TABLE drops top-level columns only, got " +
            d.fieldNames.mkString("."))
        d.fieldNames.head
    }
    // `ALTER TABLE ... ALTER COLUMN c TYPE t` — the DDL face of safe
    // type widening (widenColumn refuses narrowing, key, bloom)
    val widens = changes.collect {
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          "graft ALTER TABLE re-types top-level columns only, got " +
            u.fieldNames.mkString("."))
        u.fieldNames.head -> u.newDataType
    }
    val adds = changes.filterNot(c =>
      c.isInstanceOf[TableChange.RenameColumn] ||
        c.isInstanceOf[TableChange.DeleteColumn] ||
        c.isInstanceOf[TableChange.UpdateColumnType] ||
        (c match {
          case p: TableChange.SetProperty =>
            p.property.startsWith("constraint.")
          case p: TableChange.RemoveProperty =>
            p.property.startsWith("constraint.")
          case _ => false
        }))
    require(Seq(renames.nonEmpty, consSet.nonEmpty, drops.nonEmpty,
        widens.nonEmpty, adds.nonEmpty).count(identity) <= 1,
      "mix of RENAME/DROP/re-TYPE COLUMN / constraint properties / " +
        "other changes in one ALTER is not supported — issue separate " +
        "statements")
    if (drops.nonEmpty) {
      drops.foreach(ManifestTable.dropColumn(spark, root, _))
      return loadTable(ident)
    }
    if (widens.nonEmpty) {
      widens.foreach { case (name, to) =>
        ManifestTable.widenColumn(spark, root, name, to)
      }
      return loadTable(ident)
    }
    if (consSet.nonEmpty) {
      consSet.foreach {
        case (name, Some(sql)) =>
          ManifestTable.addConstraint(spark, root, name, sql)
        case (name, None) =>
          ManifestTable.dropConstraint(spark, root, name)
      }
      return loadTable(ident)
    }
    if (renames.nonEmpty) {
      renames.foreach { case (from, to) =>
        ManifestTable.renameColumn(spark, root, from, to)
      }
      return loadTable(ident)
    }
    val current = ManifestTable.recordedSchema(spark, root).getOrElse(
      throw new IllegalStateException(
        s"table $ident records no schema (pre-format-7) — run a merge " +
          "to upgrade before ALTER"))
    val added = adds.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "graft ALTER TABLE adds top-level columns only, got " +
            a.fieldNames.mkString("."))
        require(a.isNullable,
          s"new column ${a.fieldNames.head} must be nullable: existing " +
            "files don't have it and read it as NULL")
        require(a.defaultValue == null,
          "column DEFAULT values are not supported")
        org.apache.spark.sql.types.StructField(
          a.fieldNames.head, a.dataType, nullable = true)
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change for graft tables (supported: " +
          s"ADD COLUMNS, RENAME COLUMN, DROP COLUMN, ALTER COLUMN ... " +
          s"TYPE <safe widening>, constraint TBLPROPERTIES), got $other")
    }
    added.foreach(f => require(!current.fieldNames.contains(f.name),
      s"column ${f.name} already exists"))
    ManifestTable.evolveSchema(spark, root,
      StructType(current.fields ++ added))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    if (!isTable(root)) false
    else fs(new Path(root)).delete(new Path(root), true)
  }

  override def renameTable(old: Identifier, toRaw: Identifier): Unit = {
    // `ALTER TABLE cat.ns.a RENAME TO cat.ns.b` hands the TARGET with
    // the catalog still in its namespace — strip it, or the table
    // would move into a literal `<warehouse>/cat/...` directory.
    // Guarded: strip only when the STRIPPED namespace actually exists
    // and the raw one does not, so a user namespace that happens to
    // share the catalog's name keeps winning for its own tables.
    val to =
      if (toRaw.namespace.headOption.contains(catalogName) && {
          val stripped = toRaw.namespace.drop(1)
          namespaceExists(stripped) && !namespaceExists(toRaw.namespace)
        })
        Identifier.of(toRaw.namespace.drop(1), toRaw.name)
      else toRaw
    val src = new Path(rootOf(old))
    val dst = new Path(rootOf(to))
    if (!isTable(src.toString))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException((old.namespace :+ old.name).toSeq)
    if (isTable(dst.toString))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException((to.namespace :+ to.name).toSeq)
    // a typo'd destination namespace must raise, not be mkdir'd into
    // existence — the silent path relocated the table under a phantom
    // directory no SELECT could resolve
    if (to.namespace.nonEmpty && !namespaceExists(to.namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(to.namespace)
    val f = fs(src)
    f.mkdirs(dst.getParent)
    if (!f.rename(src, dst)) throw new java.io.IOException(
      s"failed to rename $src to $dst")
  }

  // ---------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val p = new Path(warehouse)
    val f = fs(p)
    if (!f.exists(p)) Array.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && !isTable(s.getPath.toString))
      .map(s => Array(s.getPath.getName)).toArray
  }

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val p = nsPath(namespace)
      val f = fs(p)
      if (!f.exists(p)) throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace)
      f.listStatus(p).toSeq
        .filter(s => s.isDirectory && !isTable(s.getPath.toString))
        .map(s => namespace :+ s.getPath.getName).toArray
    }

  // a TABLE root is never a namespace: without the isTable check,
  // namespaceExists vouched for table directories and DROP NAMESPACE
  // ... CASCADE would recursively delete a table's data + manifests
  // off one wrong statement
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val p = nsPath(namespace)
      fs(p).exists(p) && !isTable(p.toString)
    }

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace)
    Collections.emptyMap()
  }

  override def createNamespace(
      namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    val p = nsPath(namespace)
    if (fs(p).exists(p)) throw new org.apache.spark.sql.catalyst.analysis
      .NamespaceAlreadyExistsException(namespace)
    fs(p).mkdirs(p)
  }

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    val f = fs(p)
    // a table dir is NOT a namespace (see namespaceExists) — report
    // "no such namespace" instead of cascading into the table's data
    if (!f.exists(p) || isTable(p.toString)) false
    else {
      if (!cascade && f.listStatus(p).nonEmpty)
        throw new IllegalStateException(
          s"namespace ${namespace.mkString(".")} is not empty " +
            "(use CASCADE)")
      f.delete(p, true)
    }
  }
}
