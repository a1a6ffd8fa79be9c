package graft.catalog

import java.util.{Collections => JCollections, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.meta.{SnapshotLog, TableState}
import graft.read.MorReader
import graft.table.GraftTableGenerator

/** How a loaded [[GraftSparkTable]] is pinned in time — the DSv2 carrier
  * of `VERSION AS OF` / `TIMESTAMP AS OF` (the catalog resolves the clause
  * to a pinned Table instance; reads plan against the pinned state). */
sealed trait GraftTravel
object GraftTravel {
  final case class AtSnapshot(id: Long) extends GraftTravel
  final case class AtTime(ms: Long) extends GraftTravel
  final case class AtRef(name: String) extends GraftTravel
}

/** The DSv2 `Table` facade over a graft table directory — what makes graft
  * tables first-class SQL citizens (`SELECT * FROM graft.db.t`,
  * `INSERT INTO`, `DELETE FROM`, `MERGE INTO`). The reference's own entry
  * point is a catalog (`IcebergTableGenerator.java:62-65`, HadoopCatalog);
  * this is the Spark-native analog over [[graft.meta.SnapshotLog]] /
  * [[graft.read.MorReader]] / [[graft.table.GraftTableGenerator]].
  *
  * READ path: a MoR scan is a COMPOSED plan (multi-epoch parquet scans +
  * delete anti-joins + DV bitmap application) — not a single DSv2 Batch.
  * Reads therefore substitute at analysis time ([[GraftCatalogRule]]):
  * the relation is replaced by the MorReader plan (with partition/metrics
  * file pruning extracted from an adjacent Filter), so Catalyst sees plain
  * parquet relations and pushes residual predicates into the scans. The
  * [[newScanBuilder]] below exists to satisfy the SupportsRead contract
  * and fails loudly if the substitution rule is not installed.
  *
  * WRITE path: `INSERT INTO` goes through the supported V1 fallback
  * ([[V1Write]] → [[InsertableRelation]]) — the driver hands the source
  * DataFrame to [[GraftTableGenerator.appendBulk]], which writes all files
  * in ONE distributed job and registers them with footer row counts.
  * DELETE/UPDATE/MERGE are intercepted as whole commands by
  * [[GraftCatalogRule]] and routed to the engine's row-level primitives.
  */
final class GraftSparkTable(
    val identName: String,
    val dir: String,
    val travel: Option[GraftTravel] = None,
    val metaKind: Option[String] = None)
  extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.TruncatableTable
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  /** Iceberg-parity metadata columns (`SELECT _file, _pos, _row_id, ...`):
    * resolved by Spark from this declaration, then mapped onto the MoR
    * plan's internal columns by [[GraftCatalogRule.substitute]]. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    if (metaKind.isDefined) Array.empty
    else GraftSparkTable.MetadataCols.map { case (n, dt, doc) =>
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = n
        override def dataType(): org.apache.spark.sql.types.DataType = dt
        override def comment(): String = doc
      }
    }.toArray

  /** `TRUNCATE TABLE` — one metadata-tier snapshot, bytes reclaimed by
    * snapshot expiry (time travel intact). */
  override def truncateTable(): Boolean = {
    require(metaKind.isEmpty, s"cannot truncate metadata table $identName")
    openGenerator(SparkSession.active).truncate().commit()
    true
  }

  /** Write-audit-publish branch from the session conf
    * `spark.graft.wap.branch` (the Iceberg `spark.wap.branch` shape):
    * while set, CURRENT-state reads of this table resolve to that branch
    * and writes commit to it (the branch is created on the first write),
    * so a whole pipeline stages + audits a batch and publishes via
    * `CALL fast_forward` — without touching its SQL. Explicit
    * VERSION/TIMESTAMP AS OF always wins over the conf; the analyzer's
    * metadata fast paths follow automatically because they fold
    * [[outlineState]], which applies the same resolution. */
  private def wapBranch: Option[String] = {
    val conf = SparkSession.active.conf
    // table-scoped key wins (lets one session stage WAP on one table
    // while others keep writing main — and keeps concurrently-running
    // test suites from cross-talking through the global key)
    Option(conf.get(s"spark.graft.wap.branch.$identName", ""))
      .map(_.trim).filter(_.nonEmpty)
      .orElse(Option(conf.get("spark.graft.wap.branch", ""))
        .map(_.trim).filter(_.nonEmpty))
      .filter(_ != "main")
  }

  /** The wap branch for READS: an unborn branch (no write yet) reads as
    * main, exactly like Iceberg's conf. */
  private def wapReadBranch: Option[String] =
    wapBranch.filter(b => SnapshotLog(dir).refs.contains(s"branch:$b"))

  /** Travel-resolved table state (main lineage; branch travel resolves the
    * branch lineage exactly like [[MorReader.readRef]]). */
  def state: TableState = {
    val log = SnapshotLog(dir)
    val st0 = log.load()
    travel match {
      case None => wapReadBranch match {
        case Some(b) => st0.onBranch(b, log.refs(s"branch:$b"))
        case None => st0.mainOnly
      }
      case Some(GraftTravel.AtSnapshot(id)) => st0.mainOnly.asOf(id)
      case Some(GraftTravel.AtTime(ms)) => st0.mainOnly.asOfTime(ms)
      case Some(GraftTravel.AtRef(name)) =>
        val refs = log.refs
        if (refs.contains(s"branch:$name")) st0.onBranch(name, refs(s"branch:$name"))
        else if (name.startsWith("branch:"))
          st0.onBranch(name.stripPrefix("branch:"), refs(name))
        else st0.mainOnly.asOf(refs.getOrElse(name,
          throw new IllegalArgumentException(
            s"unknown ref '$name' (known: ${refs.keys.toSeq.sorted.mkString(", ")})")))
    }
  }

  /** Travel-resolved OUTLINE state — the analysis-time view: schema, spec
    * and snapshot metadata WITHOUT materializing sharded data manifests
    * (a 10^7-file table's schema() must not parse 10^7 entries on the
    * driver every time the analyzer touches the relation). */
  def outlineState: graft.meta.OutlineState = {
    val log = SnapshotLog(dir)
    val o0 = log.loadOutline()
    travel match {
      case None => wapReadBranch match {
        case Some(b) => o0.onBranch(b, log.refs(s"branch:$b"))
        case None => o0.mainOnly
      }
      case Some(GraftTravel.AtSnapshot(id)) => o0.mainOnly.asOf(id)
      case Some(GraftTravel.AtTime(ms)) => o0.mainOnly.asOfTime(ms)
      case Some(GraftTravel.AtRef(name)) =>
        val refs = log.refs
        if (refs.contains(s"branch:$name")) o0.onBranch(name, refs(s"branch:$name"))
        else if (name.startsWith("branch:"))
          o0.onBranch(name.stripPrefix("branch:"), refs(name))
        else o0.mainOnly.asOf(refs.getOrElse(name,
          throw new IllegalArgumentException(
            s"unknown ref '$name' (known: ${refs.keys.toSeq.sorted.mkString(", ")})")))
    }
  }

  /** The travel-pinned MoR read, optionally file-pruned (partition values /
    * column ranges extracted from a SQL filter by [[GraftCatalogRule]]);
    * for a metadata table ([[metaKind]]), the driver-built metadata frame
    * instead (rows are file/snapshot scale — never data scale). */
  def readDf(spark: SparkSession,
             partitionFilter: Map[String, Set[String]] = Map.empty,
             ranges: Map[String, MorReader.ColRange] = Map.empty,
             pointValues: Map[String, Set[String]] = Map.empty,
             internalCols: Seq[String] = Nil): DataFrame =
    metaKind match {
      case Some(kind) => metaDf(spark, kind)
      case None => travel match {
        case None => wapReadBranch match {
          case Some(b) =>
            // branch read: manifest pruning maps drop (an optimization —
            // the substitution rule keeps the full condition row-level
            // above, so results are exact)
            require(internalCols.isEmpty,
              "metadata columns under spark.graft.wap.branch are not supported")
            MorReader.readBranch(spark, dir, b)
          case None =>
            MorReader.read(spark, dir, None, partitionFilter, ranges,
              pointValues, internalCols)
        }
        case Some(GraftTravel.AtSnapshot(id)) =>
          MorReader.read(spark, dir, Some(id), partitionFilter, ranges,
            pointValues, internalCols)
        case Some(GraftTravel.AtTime(ms)) =>
          require(internalCols.isEmpty,
            s"metadata columns with TIMESTAMP AS OF are not supported")
          MorReader.readAtTime(spark, dir, ms)
        case Some(GraftTravel.AtRef(name)) =>
          require(internalCols.isEmpty,
            s"metadata columns with ref travel are not supported")
          MorReader.readRef(spark, dir, name)
      }
    }

  /** `SELECT * FROM graft.db.t.<kind>` — the Iceberg metadata-table family
    * by dotted name, over the same builders as the `graft_table_*` TVFs.
    * `VERSION AS OF` pins the file-level views to that snapshot. */
  private def metaDf(spark: SparkSession, kind: String): DataFrame = {
    import graft.read.MetaTables
    val asOf: Option[Long] = travel match {
      case None => None
      case Some(GraftTravel.AtSnapshot(id)) => Some(id)
      case Some(other) => throw new UnsupportedOperationException(
        s"metadata table $identName: only VERSION AS OF <snapshot-id> " +
          s"travel is supported, got $other")
    }
    kind match {
      case "files" => MetaTables.files(spark, dir, asOf)
      case "lineage_files" => MetaTables.lineageFiles(spark, dir, asOf)
      case "delete_files" => MetaTables.deleteFiles(spark, dir, asOf)
      case "partitions" => MetaTables.partitions(spark, dir, asOf)
      case "snapshots" => MetaTables.snapshots(spark, dir)
      case "refs" => MetaTables.refs(spark, dir)
      case "history" => MetaTables.history(spark, dir)
      case "all_data_files" => MetaTables.allDataFiles(spark, dir)
      case "manifests" => MetaTables.manifests(spark, dir)
      case "entries" => MetaTables.entries(spark, dir, asOf)
      case "position_deletes" => MetaTables.positionDeletes(spark, dir, asOf)
      case other => throw new UnsupportedOperationException(
        s"unknown graft metadata table kind $other")
    }
  }

  /** Identity-transform partition column names of the CURRENT spec — the
    * columns SQL equality/IN filters can file-prune on. */
  def identityPartitionCols: Seq[String] =
    outlineState.partitionCols
      .map(graft.meta.PartitionTransform.parse)
      .filter(_.isIdentity).map(_.source)

  /** A maintenance writer over this table (the open() surface: DataFrame
    * appends, deletes, upserts, merges — never generated-id appends). */
  def openGenerator(spark: SparkSession): GraftTableGenerator = {
    require(travel.isEmpty, s"cannot write to time-travelled table $identName")
    require(metaKind.isEmpty, s"cannot write to metadata table $identName")
    val p = java.nio.file.Paths.get(dir)
    val g = new GraftTableGenerator(spark, p.getParent.toString,
      p.getFileName.toString).open()
    // WAP: writes land on the conf branch (created on first write)
    wapBranch.foreach { b =>
      if (!SnapshotLog(dir).refs.contains(s"branch:$b")) g.createBranch(b)
      g.writeTo(b)
    }
    g
  }

  override def name(): String = identName

  /** Persisted table properties (`SHOW TBLPROPERTIES`, DESCRIBE EXTENDED):
    * read straight off `metadata/properties.json` — one tiny file, no
    * manifest materialization. */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    graft.meta.SnapshotLog(dir).loadProperties()
      .foreach { case (k, v) => m.put(k, v) }
    m
  }

  override def schema(): StructType = metaKind match {
    case Some(kind) => metaDf(SparkSession.active, kind).schema
    case None =>
      // surface persisted initial defaults as the CURRENT_DEFAULT /
      // EXISTS_DEFAULT field metadata Spark's INSERT resolution reads —
      // a partial-column INSERT then fills the declared default instead
      // of NULL (the SUPPORT_COLUMN_DEFAULT_VALUE contract); rendered as
      // a CAST('<canonical>' AS <type>) literal, type-safe for every
      // column type the engine stores
      StructType(outlineState.schema.fields.map { f =>
        f.initialDefault match {
          case Some(d) =>
            val sqlText = s"CAST('${d.replace("'", "''")}' AS ${f.dataType.sql})"
            val md = new org.apache.spark.sql.types.MetadataBuilder()
              .putString("CURRENT_DEFAULT", sqlText)
              .putString("EXISTS_DEFAULT", sqlText).build()
            StructField(f.name, f.dataType, nullable = true, md)
          case None => StructField(f.name, f.dataType, nullable = true)
        }
      })
  }

  override def partitioning(): Array[Transform] = {
    import graft.meta.PartitionTransform._
    val st = outlineState
    st.partitionCols.map { s =>
      parse(s) match {
        case Bucket(n, src) => Expressions.bucket(n, src)
        case Day(src) => Expressions.days(src)
        case Month(src) => Expressions.months(src)
        case Hour(src) => Expressions.hours(src)
        case t => Expressions.identity(t.source)
      }
    }.toArray
  }

  override def capabilities(): JSet[TableCapability] =
    JCollections.unmodifiableSet(new java.util.HashSet((
      if (metaKind.isDefined) Seq(TableCapability.BATCH_READ)
      else Seq(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
        // OVERWRITE_DYNAMIC's capability check demands the pure-V2
        // BATCH_WRITE flag (V1_BATCH_WRITE does not count). Every write
        // this table builds is a V1Write, and GraftDmlStrategy plans the
        // dynamic-overwrite command itself, so toBatch is never reached.
        TableCapability.BATCH_WRITE, TableCapability.OVERWRITE_DYNAMIC,
        // MERGE WITH SCHEMA EVOLUTION: lets Spark's
        // ResolveMergeIntoSchemaEvolution compute the source-only columns
        // and apply them through GraftCatalog.alterTable (the engine's
        // id-based addColumn) before the merge resolves
        TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)).asJava))

  /** Reads never reach this Batch (the analysis-time substitution owns
    * them), but DSv2 consumers like `DESCRIBE TABLE EXTENDED` legitimately
    * ask the scan for STATISTICS — answer those from the manifest (pure
    * metadata: declared record counts, no file I/O, no jobs). `toBatch`
    * stays a loud error so a session missing the extensions fails with
    * the fix in the message rather than returning wrong (delete-blind)
    * rows. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new org.apache.spark.sql.connector.read.Scan
        with org.apache.spark.sql.connector.read.SupportsReportStatistics {
      override def readSchema(): StructType = GraftSparkTable.this.schema()
      override def description(): String =
        s"graft MoR scan $identName (analysis-substituted)"
      override def estimateStatistics()
          : org.apache.spark.sql.connector.read.Statistics = {
        // outline-driven: sharded snapshots contribute their inline group
        // row sums — a 10^7-file table estimates from ~2.4k group stats,
        // not 10^7 parsed entries (estimates may ignore removals/deletes;
        // fine for a size hint)
        val out = outlineState
        val rows =
          out.outlines.flatMap(_.snapshot.dataFiles)
            .map(_.recordCount).filter(_ >= 0).sum +
          out.outlines.flatMap(_.dataManifestStats)
            .map(_.rows).filter(_ >= 0).sum
        val rowWidth = math.max(8L, readSchema().defaultSize.toLong)
        new org.apache.spark.sql.connector.read.Statistics {
          override def sizeInBytes(): java.util.OptionalLong =
            java.util.OptionalLong.of(rows * rowWidth)
          override def numRows(): java.util.OptionalLong =
            java.util.OptionalLong.of(rows)
        }
      }
      override def toBatch: org.apache.spark.sql.connector.read.Batch =
        throw new UnsupportedOperationException(
          s"graft table $identName: reads substitute the MoR plan at " +
            "analysis time — build the session with spark.sql.extensions=" +
            "graft.plans.GraftExtensions")
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(metaKind.isEmpty, s"cannot write to metadata table $identName")
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate
        with org.apache.spark.sql.connector.write.SupportsOverwrite
        with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
      // INSERT OVERWRITE: Spark calls truncate() for the whole-table form,
      // overwrite(filters) for `PARTITION (col = v, …)` / filtered
      // overwrites, and overwriteDynamicPartitions() under
      // partitionOverwriteMode=dynamic; the V1 write then stages the
      // delete tier (metadata truncate, metadata partition drop,
      // single-column deleteWhere, or file-pruned positional delete) and
      // the bulk append into ONE "overwrite" snapshot
      private var overwriteAll = false
      private var overwriteDyn = false
      private var overwriteFilters: Array[org.apache.spark.sql.sources.Filter] =
        Array.empty
      override def truncate(): WriteBuilder = { overwriteAll = true; this }
      override def overwriteDynamicPartitions(): WriteBuilder = {
        overwriteDyn = true; this
      }
      override def overwrite(
          filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
        import org.apache.spark.sql.sources.AlwaysTrue
        if (filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue]))
          overwriteAll = true
        else overwriteFilters = filters
        this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new V1Write {
          override def toInsertableRelation: InsertableRelation =
            (data, overwrite) => {
              import org.apache.spark.sql.functions.{col, lit}
              import org.apache.spark.sql.sources.{EqualNullSafe => SEqN, EqualTo => SEq, Filter => SFilter}
              val spark = data.sparkSession
              val g = openGenerator(spark)
              // a static PARTITION spec arrives as null-safe equality; a
              // non-null value behaves exactly like plain equality for the
              // delete tier (NULL rows never match either form)
              def eqOf(f: SFilter): Option[(String, Any)] = f match {
                case SEq(c, v) if v != null => Some((c, v))
                case SEqN(c, v) if v != null => Some((c, v))
                case _ => None
              }
              val conformed0 = data.select(
                g.liveSchema.fields.map(f =>
                  org.apache.spark.sql.functions.col(f.name)
                    .cast(f.dataType).as(f.name)): _*)
              // dynamic overwrite decides the DROPPED partition set from
              // one job and appends from another — materialize the batch
              // so a non-deterministic source (rand(), sampling) can't
              // drop a different partition set than it appends
              val conformed =
                if (overwriteDyn) conformed0.localCheckpoint() else conformed0
              if (overwriteDyn) g.overwriteDynamic(conformed)
              else if (overwriteAll || overwrite) g.truncate()
              else overwriteFilters.toSeq match {
                case Nil =>
                case Seq(f) if eqOf(f).isDefined =>
                  // the static single-partition overwrite: fully-covered
                  // files drop at the metadata tier, residue goes row-level
                  val (c, v) = eqOf(f).get
                  g.deleteWhere(c, v, v)
                case fs if fs.forall(eqOf(_).isDefined) =>
                  val eqs = fs.map(eqOf(_).get)
                  val pred = eqs.map { case (c, v) => col(c) === lit(v) }
                    .reduce(_ && _)
                  val eqMap = eqs.map { case (c, v) =>
                    c -> Set(String.valueOf(v)) }.toMap
                  g.positionalDeletePruned(pred, eqMap, Map.empty, eqMap)
                case other => throw new UnsupportedOperationException(
                  s"graft INSERT OVERWRITE supports whole-table and " +
                    s"equality-conjunction filters; got ${other.mkString(", ")}")
              }
              val nFiles = math.max(1,
                math.min(data.rdd.getNumPartitions, 64))
              g.appendBulk(conformed, nFiles).commit()
            }
        }
    }
  }

  override def toString: String = s"GraftSparkTable($identName)"
}

object GraftSparkTable {
  /** SQL metadata-column name → (type, doc); mapped to the MoR plan's
    * internal columns by [[MetadataColMap]] (the Iceberg `_file`/`_pos`
    * reserved columns plus the v3 row-lineage pair). */
  val MetadataCols: Seq[(String, org.apache.spark.sql.types.DataType, String)] = {
    import org.apache.spark.sql.types._
    Seq(
      ("_file", StringType, "data file path of the row"),
      ("_pos", LongType, "row position in its data file"),
      ("_row_id", LongType, "Iceberg-v3 row lineage id"),
      ("_last_updated_seq", LongType,
        "sequence number that last updated the row"))
  }

  /** SQL name → MoR internal column. */
  val MetadataColMap: Map[String, String] = Map(
    "_file" -> MorReader.FilePathCol,
    "_pos" -> MorReader.PosCol,
    "_row_id" -> MorReader.RowIdCol,
    "_last_updated_seq" -> MorReader.LastSeqCol)
}
