package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.schema.{GraftField, GraftSchema}
import graft.table.GraftTableGenerator

/** `TableCatalog` plugin making graft tables first-class SQL citizens —
  * the Spark-native analog of the reference's HadoopCatalog entry point
  * (`IcebergTableGenerator.java:62-65`): a warehouse directory of
  * `<warehouse>/<namespace...>/<table>` graft table dirs.
  *
  * Register with
  * `spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")`
  * and `spark.conf.set("spark.sql.catalog.graft.warehouse", dir)` — the
  * warehouse conf is re-read on every resolution, so tests and harnesses
  * can point one session at several warehouses over its lifetime.
  *
  * Time travel: `VERSION AS OF <snapshot-id | tag | branch>` and
  * `TIMESTAMP AS OF <ts>` resolve here to a pinned [[GraftSparkTable]].
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog with ViewCatalog {

  private var catalogName: String = "graft"
  private var initOptions: CaseInsensitiveStringMap =
    CaseInsensitiveStringMap.empty()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    initOptions = options
  }

  override def name(): String = catalogName

  /** DEFAULT-value column clauses allowed (ALTER/CREATE) — they map to
    * Iceberg-v3 initial defaults in [[alterTable]]. */
  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.Collections.singleton(
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** Warehouse root: the session conf wins (dynamic — settable per query),
    * falling back to the plugin's initialize-time options. */
  private def warehouse: Path = {
    val fromConf = SparkSession.active.conf
      .getOption(s"spark.sql.catalog.$catalogName.warehouse")
    val wh = fromConf.orElse(Option(initOptions.get("warehouse"))).getOrElse(
      throw new IllegalStateException(
        s"catalog $catalogName: set spark.sql.catalog.$catalogName.warehouse"))
    Paths.get(wh)
  }

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)(_.resolve(_))

  private def tableDir(ident: Identifier): Path =
    nsDir(ident.namespace).resolve(ident.name)

  private def isTable(p: Path): Boolean =
    Files.isDirectory(p.resolve("metadata"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p) && isTable(p) &&
        !p.getFileName.toString.startsWith(".")) // hide staging dirs
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  /** The Iceberg metadata-table suffixes resolvable as `graft.db.t.<kind>`. */
  private val metaKinds = Set("files", "lineage_files", "delete_files",
    "partitions", "snapshots", "refs", "history", "all_data_files",
    "manifests", "entries", "position_deletes")

  /** `db.t.<kind>` — when the identifier itself is no table but its
    * namespace tail names one and the leaf is a known metadata kind,
    * resolve the metadata table (Iceberg's dotted metadata-table names). */
  private def metaTable(ident: Identifier, travel: Option[GraftTravel])
      : Option[GraftSparkTable] = {
    val ns = ident.namespace()
    if (ns.isEmpty || !metaKinds(ident.name())) return None
    val parent = Identifier.of(ns.init, ns.last)
    val pd = tableDir(parent)
    if (!isTable(pd)) return None
    Some(new GraftSparkTable(s"${parent.toString}.${ident.name()}",
      pd.toString, travel, Some(ident.name())))
  }

  override def loadTable(ident: Identifier): Table = {
    val d = tableDir(ident)
    if (!isTable(d))
      return metaTable(ident, None).getOrElse(throw new NoSuchTableException(ident))
    new GraftSparkTable(ident.toString, d.toString)
  }

  /** `VERSION AS OF` — a parseable all-digit version resolves as a
    * snapshot id; anything else (named refs, the empty string, digit runs
    * past Long range) resolves as a ref, whose lookup produces the clear
    * unknown-ref error instead of a raw NumberFormatException. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val d = tableDir(ident)
    val travel =
      if (version.nonEmpty && version.forall(_.isDigit))
        scala.util.Try(version.toLong).toOption
          .map[GraftTravel](GraftTravel.AtSnapshot).getOrElse(GraftTravel.AtRef(version))
      else GraftTravel.AtRef(version)
    if (!isTable(d))
      return metaTable(ident, Some(travel)).getOrElse(
        throw new NoSuchTableException(ident))
    new GraftSparkTable(ident.toString, d.toString, Some(travel))
  }

  /** `TIMESTAMP AS OF` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val d = tableDir(ident)
    if (!isTable(d)) throw new NoSuchTableException(ident)
    new GraftSparkTable(ident.toString, d.toString,
      Some(GraftTravel.AtTime(timestampMicros / 1000L)))
  }

  override def tableExists(ident: Identifier): Boolean = isTable(tableDir(ident))

  // ---- procedures (`CALL graft.system.<proc>(...)`) ---------------------

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(this, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)

  /** Resolve a procedure's dotted table argument (`db.t` or `t`) against
    * this catalog's warehouse. */
  private[catalog] def dirByName(table: String): String = {
    val parts = table.split('.')
    val ident = Identifier.of(parts.init, parts.last)
    val d = tableDir(ident)
    if (!isTable(d)) throw new NoSuchTableException(ident)
    d.toString
  }

  /** Table dir for a CREATE-path procedure (`snapshot`): resolved like
    * [[dirByName]] but the table must NOT exist yet; parent namespace
    * dirs are created. */
  private[catalog] def dirForCreate(table: String): Path = {
    val parts = table.split('.')
    val ident = Identifier.of(parts.init, parts.last)
    val d = tableDir(ident)
    if (isTable(d)) throw new org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException(ident)
    Files.createDirectories(d.getParent)
    d
  }

  private[catalog] def openGeneratorByName(table: String): GraftTableGenerator = {
    val d = Paths.get(dirByName(table))
    new GraftTableGenerator(SparkSession.active, d.getParent.toString,
      d.getFileName.toString).open()
  }

  /** DSv2 partition transforms → the engine's spec strings (shared by the
    * direct and staged CREATE paths). */
  private def specStrings(partitions: Array[Transform]): Seq[String] =
    partitions.map { tr =>
      def ref0: String = tr.references()(0).fieldNames.mkString(".")
      tr.name() match {
        case "identity" => ref0
        case "bucket" =>
          val n = tr.arguments().collectFirst {
            case l: V2Literal[_] => String.valueOf(l.value())
          }.getOrElse(throw new UnsupportedOperationException(s"bucket: $tr"))
          s"bucket($n,$ref0)"
        case "days" => s"day($ref0)"
        case "months" => s"month($ref0)"
        case "hours" => s"hour($ref0)"
        case other => throw new UnsupportedOperationException(
          s"unsupported partition transform $other")
      }
    }.toSeq

  /** `DEFAULT <literal>` from a CREATE-path StructField's metadata
    * (Spark records the SQL text under EXISTS_DEFAULT/CURRENT_DEFAULT) →
    * the engine's canonical-string initial default. Only foldable
    * defaults are accepted; DEFAULT NULL means "no default". */
  private def defaultFromMeta(f: org.apache.spark.sql.types.StructField)
      : Option[String] = {
    if (!f.metadata.contains("EXISTS_DEFAULT")) return None
    val sqlText = f.metadata.getString("EXISTS_DEFAULT")
    val e = SparkSession.active.sessionState.sqlParser.parseExpression(sqlText)
    val lit = e match {
      case l: org.apache.spark.sql.catalyst.expressions.Literal => l
      case other if other.foldable =>
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          other.eval(null), other.dataType)
      case _ => throw new UnsupportedOperationException(
        s"non-literal DEFAULT for column ${f.name}: $sqlText")
    }
    Option(org.apache.spark.sql.catalyst.CatalystTypeConverters
      .convertToScala(lit.value, lit.dataType)).map(String.valueOf)
  }

  /** Create a fresh graft table at an arbitrary directory (the live table
    * dir, or a hidden staging dir for atomic REPLACE). */
  private def createAt(d: Path, schema: StructType,
                       partitions: Array[Transform],
                       properties: JMap[String, String]): Unit = {
    val gschema = GraftSchema(schema.fields.zipWithIndex.map { case (f, i) =>
      GraftField(i + 1, f.name, f.dataType, defaultFromMeta(f))
    }.toSeq)
    Files.createDirectories(d.getParent)
    new GraftTableGenerator(SparkSession.active, d.getParent.toString,
      d.getFileName.toString)
      .create(gschema, specStrings(partitions),
        properties.asScala.toMap -- GraftCatalog.ReservedProps)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    val d = tableDir(ident)
    if (isTable(d)) throw new org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException(ident)
    createAt(d, schema, partitions, properties)
    new GraftSparkTable(ident.toString, d.toString)
  }

  // ---- atomic CREATE / REPLACE (`CREATE OR REPLACE TABLE … [AS SELECT]`) --
  //
  // The CTAS write lands in a HIDDEN staging dir next to the live table
  // (`.<name>__stage_<nonce>` — a full graft table of its own); commit
  // swaps the staged dir in with directory moves, so the old table stays
  // readable until the instant of publish and a mid-write failure aborts
  // by deleting the staging dir, leaving the live table untouched.
  // REPLACE preserves NOTHING (schema, spec, properties, history all come
  // from the new definition) — the idempotent-pipeline CoR-TAS contract.

  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable = {
    if (isTable(tableDir(ident)))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    stage(ident, info)
  }

  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable = {
    if (!isTable(tableDir(ident))) throw new NoSuchTableException(ident)
    stage(ident, info)
  }

  override def stageCreateOrReplace(ident: Identifier,
                                    info: TableInfo): StagedTable =
    stage(ident, info)

  private def stage(ident: Identifier, info: TableInfo): StagedTable = {
    val live = tableDir(ident)
    Files.createDirectories(live.getParent)
    val nonce = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val staged = live.getParent.resolve(s".${ident.name}__stage_$nonce")
    createAt(staged, info.schema, info.partitions, info.properties)
    new GraftStagedTable(ident, staged, live)
  }

  /** A staged table delegates everything (reads, the CTAS write) to a
    * normal [[GraftSparkTable]] over the staging dir; only publish/abort
    * are its own. */
  private class GraftStagedTable(ident: Identifier, stagedDir: Path,
                                 liveDir: Path)
      extends StagedTable with SupportsWrite {
    private val inner = new GraftSparkTable(ident.toString, stagedDir.toString)
    override def name(): String = inner.name()
    override def schema(): StructType = inner.schema()
    override def partitioning(): Array[Transform] = inner.partitioning()
    override def properties(): JMap[String, String] = inner.properties()
    override def capabilities(): JSet[TableCapability] = inner.capabilities()
    override def newWriteBuilder(
        info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
        : org.apache.spark.sql.connector.write.WriteBuilder =
      inner.newWriteBuilder(info)
    override def commitStagedChanges(): Unit = {
      // the staged table recorded absolute paths under the staging dir —
      // rebase its metadata to the live location BEFORE the swap (nothing
      // reads the hidden staging dir, so the rewrite is unobserved). A
      // staged table is append-only (CTAS), so the metadata JSON tier is
      // the complete path record — no pos/dv parquet internals exist.
      rebaseMetadataJson(stagedDir, stagedDir.toString, liveDir.toString)
      val trash = liveDir.getParent.resolve(
        s".${liveDir.getFileName}__replaced_${stagedDir.getFileName.toString.takeRight(12)}")
      val hadLive = Files.isDirectory(liveDir)
      if (hadLive) Files.move(liveDir, trash)
      try Files.move(stagedDir, liveDir)
      catch { case e: Throwable =>
        if (hadLive && !Files.isDirectory(liveDir)) Files.move(trash, liveDir)
        throw e
      }
      if (hadLive) deleteRecursively(trash)
    }
    override def abortStagedChanges(): Unit = deleteRecursively(stagedDir)
  }

  /** Rewrite recorded absolute paths in the metadata JSON tier (snapshots,
    * manifest groups, outlines, metric strings) from one table root to
    * another. Paths OUTSIDE the old root — add_files-adopted external
    * files — are untouched by design. */
  private def rebaseMetadataJson(tableRoot: Path, oldRoot: String,
                                 newRoot: String): Unit = {
    val metaDir = tableRoot.resolve("metadata")
    if (!Files.isDirectory(metaDir)) return
    val s = Files.walk(metaDir)
    try s.iterator().asScala.filter(Files.isRegularFile(_)).foreach { f =>
      val txt = Files.readString(f)
      if (txt.contains(oldRoot))
        Files.writeString(f, txt.replace(oldRoot, newRoot))
    } finally s.close()
  }

  /** `ALTER TABLE` → the engine's id-based schema evolution (add with
    * Iceberg-v3 initial default, rename in place, drop retiring the field
    * id). Changes apply as metadata, then ONE empty snapshot publishes the
    * new schema version (readers resolve the current schema from the last
    * snapshot — the Iceberg current-schema-id bump). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = tableDir(ident)
    if (!isTable(d)) throw new NoSuchTableException(ident)
    val g = new GraftTableGenerator(SparkSession.active, d.getParent.toString,
      ident.name).open()
    // property edits are metadata-version changes, not snapshots (Iceberg
    // semantics) — only schema changes publish a commit below
    var schemaChanged = false
    changes.foreach {
      case sp: TableChange.SetProperty =>
        g.setProperties(Map(sp.property -> sp.value))
      case rp: TableChange.RemoveProperty =>
        g.removeProperties(Seq(rp.property))
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"nested column ${a.fieldNames.mkString(".")} not supported")
        val default = Option(a.defaultValue()).map { dv =>
          val v = Option(dv.getValue).map(_.value()).getOrElse(
            throw new UnsupportedOperationException(
              s"non-literal DEFAULT for ${a.fieldNames()(0)}"))
          v match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => String.valueOf(other)
          }
        }
        g.addColumn(a.fieldNames()(0), a.dataType(), default)
        schemaChanged = true
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          s"nested column ${r.fieldNames.mkString(".")} not supported")
        g.renameColumn(r.fieldNames()(0), r.newName())
        schemaChanged = true
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          s"nested column ${del.fieldNames.mkString(".")} not supported")
        g.updateSchema(Nil, Seq(del.fieldNames()(0)))
        schemaChanged = true
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change: $other")
    }
    if (schemaChanged)
      g.commit() // pure-metadata snapshot: publishes the new schema version
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    if (!isTable(d)) false
    else { deleteRecursively(d); true }
  }

  /** `ALTER TABLE … RENAME TO`: directory move + full path rebase. The
    * metadata JSON tier rewrites as text; pos/dv delete files ALSO record
    * data paths INSIDE their parquet rows (`file_path` column), so each
    * one is rewritten through a small Spark job (driver loop over the
    * delete-file list — metadata-scale, never data-scale). */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    val to = tableDir(newIdent)
    Files.createDirectories(to.getParent)
    Files.move(from, to)
    rebaseMetadataJson(to, from.toString, to.toString)
    val spark = SparkSession.active
    val delFiles = graft.meta.SnapshotLog(to.toString).load()
      .snapshots.flatMap(_.deleteFiles)
      .filter(f => f.kind == "pos" || f.kind == "dv")
      .map(_.path).distinct
    delFiles.foreach { p =>
      val df = spark.read.parquet(p)
      if (df.columns.contains("file_path")) {
        val cols = df.columns.map {
          case "file_path" =>
            org.apache.spark.sql.functions.replace(
              org.apache.spark.sql.functions.col("file_path"),
              org.apache.spark.sql.functions.lit(from.toString),
              org.apache.spark.sql.functions.lit(to.toString)).as("file_path")
          case c => org.apache.spark.sql.functions.col(c)
        }
        val tmp = Files.createTempDirectory("graft-rename-rebase")
        df.select(cols.toSeq: _*).coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        val part = Files.list(tmp).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
        Files.move(part, Paths.get(p),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        deleteRecursively(tmp)
      }
    }
  }

  // ---- views: `<ns>/<name>.view.json` documents (DSv2 ViewCatalog) ------
  //
  // Vanilla Spark 4.1 parses CREATE/DROP VIEW but plans them only for the
  // session catalog; [[GraftCatalogRule]] intercepts the logical plans for
  // graft-catalog identifiers and routes them here, and expands reads of a
  // graft view by re-parsing its stored SQL (the Iceberg-extensions view
  // model). The ViewCatalog interface is implemented in full so future
  // Spark versions that DO plan v2 views natively hit the same store.

  private def viewFile(ident: Identifier): Path =
    nsDir(ident.namespace).resolve(s"${ident.name}.view.json")

  override def viewExists(ident: Identifier): Boolean =
    Files.isRegularFile(viewFile(ident))

  override def listViews(namespace: String*): Array[Identifier] = {
    val d = nsDir(namespace.toArray)
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace.toArray)
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".view.json"))
      .map(p => Identifier.of(namespace.toArray,
        p.getFileName.toString.stripSuffix(".view.json")))
      .toArray
    finally s.close()
  }

  override def loadView(ident: Identifier): View = {
    val f = viewFile(ident)
    if (!Files.isRegularFile(f))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readString(f))
    def strArr(field: String): Array[String] = {
      val n = root.get(field)
      if (n == null || n.isNull) Array.empty
      else (0 until n.size).map(i =>
        if (n.get(i).isNull) null else n.get(i).asText).toArray
    }
    val props = new java.util.HashMap[String, String]()
    Option(root.get("properties")).foreach { p =>
      p.properties().asScala.foreach(e => props.put(e.getKey, e.getValue.asText))
    }
    new GraftView(ident.toString, root.get("sql").asText,
      root.get("currentCatalog").asText, strArr("currentNamespace"),
      StructType.fromDDL(root.get("schemaDdl").asText),
      strArr("queryColumnNames"), strArr("columnAliases"),
      strArr("columnComments"), props)
  }

  override def createView(info: ViewInfo): View = {
    if (viewExists(info.ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(info.ident)
    if (isTable(tableDir(info.ident)))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(info.ident)
    writeView(info)
    loadView(info.ident)
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    if (!orCreate && !viewExists(info.ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(info.ident)
    writeView(info)
    loadView(info.ident)
  }

  private def writeView(info: ViewInfo): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("sql", info.sql)
    root.put("currentCatalog", info.currentCatalog)
    val nsArr = root.putArray("currentNamespace")
    info.currentNamespace.foreach(nsArr.add)
    root.put("schemaDdl", info.schema.toDDL)
    def putArr(field: String, vals: Array[String]): Unit = {
      val a = root.putArray(field)
      Option(vals).getOrElse(Array.empty[String]).foreach(a.add)
    }
    putArr("queryColumnNames", info.queryColumnNames)
    putArr("columnAliases", info.columnAliases)
    putArr("columnComments", info.columnComments)
    val p = root.putObject("properties")
    info.properties.asScala.foreach { case (k, v) => p.put(k, v) }
    Files.createDirectories(viewFile(info.ident).getParent)
    Files.writeString(viewFile(info.ident), mapper.writeValueAsString(root))
  }

  /** `ALTER VIEW … SET/UNSET TBLPROPERTIES`: rewrite the view document's
    * properties map in place (body, schema, aliases untouched). */
  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val f = viewFile(ident)
    if (!Files.isRegularFile(f))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readString(f))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val props = Option(root.get("properties"))
      .collect { case o: com.fasterxml.jackson.databind.node.ObjectNode => o }
      .getOrElse(root.putObject("properties"))
    changes.foreach {
      case s: ViewChange.SetProperty => props.put(s.property, s.value)
      case r: ViewChange.RemoveProperty => props.remove(r.property)
      case other => throw new UnsupportedOperationException(
        s"ALTER VIEW change $other is not supported")
    }
    root.set("properties", props)
    Files.writeString(f, mapper.writeValueAsString(root))
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean =
    Files.deleteIfExists(viewFile(ident))

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!viewExists(oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(oldIdent)
    if (viewExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
    Files.createDirectories(viewFile(newIdent).getParent)
    Files.move(viewFile(oldIdent), viewFile(newIdent))
  }

  // ---- namespaces: plain directories under the warehouse ----------------

  override def listNamespaces(): Array[Array[String]] = {
    if (!Files.isDirectory(warehouse)) return Array.empty
    val s = Files.list(warehouse)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p) && !isTable(p))
      .map(p => Array(p.getFileName.toString)).toArray
    finally s.close()
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p) && !isTable(p))
      .map(p => namespace :+ p.getFileName.toString).toArray
    finally s.close()
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || Files.isDirectory(nsDir(namespace))

  /** Namespace properties persist as `<nsdir>/.namespace.json` — absent
    * file = no properties (plain directories stay valid namespaces). */
  private def nsMetaFile(namespace: Array[String]): Path =
    nsDir(namespace).resolve(".namespace.json")

  private def readNsMeta(namespace: Array[String]): Map[String, String] = {
    val f = nsMetaFile(namespace)
    if (!Files.isRegularFile(f)) Map.empty
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(Files.readString(f))
      root.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }
  }

  private def writeNsMeta(namespace: Array[String],
                          props: Map[String, String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    props.toSeq.sortBy(_._1).foreach { case (k, v) => root.put(k, v) }
    Files.writeString(nsMetaFile(namespace), mapper.writeValueAsString(root))
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    val m = new java.util.HashMap[String, String]()
    readNsMeta(namespace).foreach { case (k, v) => m.put(k, v) }
    java.util.Collections.unmodifiableMap(m)
  }

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit = {
    Files.createDirectories(nsDir(namespace))
    if (metadata != null && !metadata.isEmpty)
      writeNsMeta(namespace, metadata.asScala.toMap)
  }

  /** `ALTER NAMESPACE … SET/UNSET PROPERTIES` (DBPROPERTIES). */
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    var props = readNsMeta(namespace)
    changes.foreach {
      case s: NamespaceChange.SetProperty => props += (s.property -> s.value)
      case r: NamespaceChange.RemoveProperty => props -= r.property
      case other => throw new UnsupportedOperationException(
        s"ALTER NAMESPACE change $other is not supported")
    }
    writeNsMeta(namespace, props)
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) false
    else {
      if (!cascade) {
        val s = Files.list(d)
        // the properties document doesn't make a namespace "non-empty"
        val nonEmpty = try s.iterator().asScala
          .exists(_.getFileName.toString != ".namespace.json")
        finally s.close()
        if (nonEmpty) throw new org.apache.spark.sql.catalyst.analysis
          .NonEmptyNamespaceException(namespace)
      }
      deleteRecursively(d); true
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq.foreach(deleteRecursively)
      finally s.close()
    }
    Files.deleteIfExists(p)
  }
}

/** Immutable DSv2 [[View]] document loaded from `<ns>/<name>.view.json`. */
final class GraftView(
    viewName: String,
    sql: String,
    curCatalog: String,
    curNamespace: Array[String],
    viewSchema: StructType,
    queryCols: Array[String],
    colAliases: Array[String],
    colComments: Array[String],
    props: JMap[String, String]) extends View {
  override def name(): String = viewName
  override def query(): String = sql
  override def currentCatalog(): String = curCatalog
  override def currentNamespace(): Array[String] = curNamespace
  override def schema(): StructType = viewSchema
  override def queryColumnNames(): Array[String] = queryCols
  override def columnAliases(): Array[String] = colAliases
  override def columnComments(): Array[String] = colComments
  override def properties(): JMap[String, String] = props
}

object GraftCatalog {
  /** Keys Spark itself injects into CREATE TABLE properties — engine
    * bookkeeping, not user table properties; never persisted. */
  val ReservedProps: Set[String] =
    Set("provider", "owner", "location", "comment", "external",
      "is_managed_location")
}
