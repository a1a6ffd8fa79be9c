package graft.catalog

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.table.GraftTableGenerator

/** `CALL graft.system.<proc>(...)` — the SQL maintenance surface over the
  * engine's table-service API, the Spark-native analog of Iceberg's stored
  * procedures (`CALL cat.system.rewrite_data_files(...)`; the reference's
  * tables get these from the Iceberg runtime — here they route to
  * [[GraftTableGenerator]]'s maintenance methods).
  *
  * Every procedure takes the table as a dotted name resolved against the
  * catalog's own warehouse, runs ONE maintenance action, and returns a
  * single summary row (a [[LocalScan]] — counts and ids, driver-scale by
  * construction: maintenance row work happens in the Spark jobs the engine
  * methods launch, never in the procedure result).
  *
  * Scale: each procedure is a metadata transaction plus (for compact /
  * maintain) distributed rewrite jobs — the same cost model as calling the
  * API directly; nothing here adds a collect or a driver loop.
  */
object GraftProcedures {

  /** One procedure: fixed parameters, fixed one-row output schema, a body
    * from (catalog, coerced args) to the summary row values. */
  private final class Proc(
      val pname: String,
      params: Seq[ProcedureParameter],
      outSchema: StructType,
      body: (GraftCatalog, InternalRow) => Seq[Any])
    extends UnboundProcedure {

    override def name(): String = pname
    override def description(): String = s"graft maintenance procedure $pname"

    def boundFor(catalog: GraftCatalog): BoundProcedure = new BoundProcedure {
      override def name(): String = pname
      override def description(): String = Proc.this.description()
      override def parameters(): Array[ProcedureParameter] = params.toArray
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): JIterator[Scan] = {
        val values = body(catalog, input).map {
          case s: String => UTF8String.fromString(s)
          case other => other
        }
        val row: InternalRow = new GenericInternalRow(values.toArray)
        java.util.List.of[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = Array(row)
          override def readSchema(): StructType = outSchema
        }).iterator()
      }
    }

    // bind() has no catalog handle — GraftCatalog.loadProcedure wraps via
    // boundFor; this default keeps the interface total if Spark ever binds
    // the unbound form directly.
    override def bind(inputType: StructType): BoundProcedure =
      throw new IllegalStateException(
        s"procedure $pname must be loaded through GraftCatalog")
  }

  /** The UnboundProcedure handed to Spark: binds to a catalog-carrying
    * BoundProcedure regardless of the input struct (Spark's
    * ProcedureArgumentCoercion casts arguments to the declared types). */
  private final class CatalogBound(p: Proc, catalog: GraftCatalog)
    extends UnboundProcedure {
    override def name(): String = p.pname
    override def description(): String = p.description()
    override def bind(inputType: StructType): BoundProcedure = p.boundFor(catalog)
  }

  private def in(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()
  private def inDefault(n: String, t: DataType, d: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(d).build()

  private def gen(c: GraftCatalog, table: String): GraftTableGenerator =
    c.openGeneratorByName(table)

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString

  /** Split a transform list on TOP-LEVEL commas only — `bucket(4,id),day(ts)`
    * is two transforms, the comma inside `bucket(...)` is not a separator. */
  private[catalog] def splitTransforms(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case ch => cur += ch
    }
    out += cur.result()
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def state(c: GraftCatalog, table: String): graft.meta.TableState =
    graft.meta.SnapshotLog(c.dirByName(table)).load().mainOnly

  /** Live file counts (data, delete) — the before/after summary compact
    * and maintain report. */
  private def liveCounts(c: GraftCatalog, table: String): (Long, Long) = {
    val st = state(c, table)
    (st.dataFiles.size.toLong, st.deleteFiles.size.toLong)
  }

  private def snapshotCount(c: GraftCatalog, table: String): Long =
    state(c, table).snapshots.size.toLong

  private def headId(c: GraftCatalog, table: String): Long =
    state(c, table).snapshots.lastOption.map(_.id).getOrElse(0L)

  private val all: Seq[Proc] = Seq(
    // rewrite_data_files: MoR → one fresh file per partition, deletes folded
    new Proc("compact",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("data_files_before", LongType, nullable = false),
        StructField("delete_files_before", LongType, nullable = false),
        StructField("data_files_after", LongType, nullable = false),
        StructField("delete_files_after", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        val (db, xb) = liveCounts(c, t)
        gen(c, t).compact().commit()
        val (da, xa) = liveCounts(c, t)
        Seq(db, xb, da, xa)
      }),

    // keep_last caps history depth; older_than_ms (Iceberg `older_than`)
    // expires by commit age instead when >= 0 — both rebase the horizon
    // into one baseline snapshot and GC the orphaned files
    new Proc("expire_snapshots",
      Seq(in("table", StringType), inDefault("keep_last", IntegerType, "5"),
        inDefault("older_than_ms", LongType, "-1")),
      StructType(Seq(
        StructField("snapshots_before", LongType, nullable = false),
        StructField("snapshots_after", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        val before = snapshotCount(c, t)
        val olderThan = r.getLong(2)
        if (olderThan >= 0L)
          gen(c, t).expireSnapshotsOlderThan(maxAgeMs = olderThan)
        else gen(c, t).expireSnapshots(keepLast = r.getInt(1))
        Seq(before, snapshotCount(c, t))
      }),

    new Proc("rollback_to_snapshot",
      Seq(in("table", StringType), in("snapshot_id", LongType)),
      StructType(Seq(
        StructField("previous_head", LongType, nullable = false),
        StructField("current_head", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        val prev = headId(c, t)
        gen(c, t).rollbackTo(r.getLong(1))
        Seq(prev, headId(c, t))
      }),

    // dry_run (Iceberg parity): list what WOULD be deleted, touch nothing
    // Iceberg rollback_to_timestamp: resolve the wall-clock to the last
    // snapshot at or before it, then the same truncation as
    // rollback_to_snapshot
    new Proc("rollback_to_timestamp",
      Seq(in("table", StringType), in("ts_ms", LongType)),
      StructType(Seq(
        StructField("previous_head", LongType, nullable = false),
        StructField("current_head", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        val prev = headId(c, t)
        val target = state(c, t).snapshots
          .filter(_.timestampMs <= r.getLong(1)).lastOption
          .getOrElse(throw new IllegalArgumentException(
            s"rollback_to_timestamp: no snapshot committed at or before " +
              s"${r.getLong(1)}"))
        gen(c, t).rollbackTo(target.id)
        Seq(prev, headId(c, t))
      }),

    new Proc("remove_orphan_files",
      Seq(in("table", StringType), inDefault("grace_ms", LongType, "0"),
        inDefault("dry_run", BooleanType, "false")),
      StructType(Seq(
        StructField("deleted_files", LongType, nullable = false))),
      (c, r) => {
        val g = gen(c, str(r, 0))
        val n =
          if (r.getBoolean(2)) g.listOrphanFiles(graceMs = r.getLong(1)).size
          else g.removeOrphanFiles(graceMs = r.getLong(1)).size
        Seq(n.toLong)
      }),

    // Iceberg rewrite_position_delete_files (v3 shape): fold each
    // partition's accumulated positional tombstones AND prior vectors
    // into ONE deletion-vector file per partition (bitmap per data file)
    new Proc("rewrite_position_deletes",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("delete_files_before", LongType, nullable = false),
        StructField("delete_files_after", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        val before = liveCounts(c, t)._2
        val g = gen(c, t).rewritePositionDeletesToDVs()
        if (g.staged > 0) g.commit()
        Seq(before, liveCounts(c, t)._2)
      }),

    // convert accumulated equality deletes into position vectors (the
    // eq->pos conversion a steady-state MoR service runs)
    new Proc("convert_equality_deletes",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("delete_files_before", LongType, nullable = false),
        StructField("delete_files_after", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        val before = liveCounts(c, t)._2
        val g = gen(c, t).rewriteEqualityDeletes()
        if (g.staged > 0) g.commit()
        Seq(before, liveCounts(c, t)._2)
      }),

    // ANALYZE TABLE: persisted stats generation (row count + per-column
    // NDV/min/max for the named columns, comma-separated)
    new Proc("analyze",
      Seq(in("table", StringType), inDefault("columns", StringType, "''")),
      StructType(Seq(
        StructField("row_count", LongType, nullable = false),
        StructField("analyzed_columns", LongType, nullable = false))),
      (c, r) => {
        val cols = str(r, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val stats = gen(c, str(r, 0)).analyze(cols)
        Seq(stats.rowCount, stats.cols.size.toLong)
      }),

    new Proc("fast_forward",
      Seq(in("table", StringType), in("branch", StringType)),
      StructType(Seq(
        StructField("current_head", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        gen(c, t).fastForward(str(r, 1))
        Seq(headId(c, t))
      }),

    // partition-spec evolution from SQL (reference op #2,
    // `IcebergTableGenerator.java:94-101`): `add`/`drop` are top-level-
    // comma-separated transform strings — `bucket(4,source_id)` stays one
    // transform. Later INSERTs lay out under the new spec; existing files
    // keep theirs (the hidden-partitioning evolution contract), published
    // by one pure-metadata snapshot like ALTER TABLE.
    new Proc("update_spec",
      Seq(in("table", StringType),
        inDefault("add", StringType, "''"),
        inDefault("drop", StringType, "''")),
      StructType(Seq(
        StructField("spec_id", IntegerType, nullable = false),
        StructField("partition_spec", StringType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        val g = gen(c, t)
          .updateSpec(splitTransforms(str(r, 1)), splitTransforms(str(r, 2)))
        g.commit() // publish the new spec version (readers resolve from head)
        val st = state(c, t)
        Seq(st.currentSpecId, st.partitionCols.mkString(", "))
      }),

    // declared WRITE ORDER from SQL (Iceberg `ALTER TABLE … WRITE ORDERED
    // BY` parity — shipped as a procedure like the branch DDL): every
    // later INSERT lays rows out sorted on the given columns, so per-file
    // [min,max] envelopes are disjoint from the first write — range scans
    // prune without ever paying a compactSorted rewrite
    new Proc("write_ordered",
      Seq(in("table", StringType), in("columns", StringType)),
      StructType(Seq(
        StructField("write_order", StringType, nullable = false))),
      (c, r) => {
        val cols = str(r, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        gen(c, str(r, 0)).writeOrdered(cols: _*)
        Seq(cols.mkString(", "))
      }),

    // branch/tag lifecycle (Iceberg's branch DDL ships as procedures too)
    new Proc("create_branch",
      Seq(in("table", StringType), in("branch", StringType)),
      StructType(Seq(
        StructField("branch", StringType, nullable = false),
        StructField("fork_snapshot_id", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0); val b = str(r, 1)
        val g = gen(c, t).createBranch(b)
        Seq(b, g.branchForkId(b))
      }),

    new Proc("drop_branch",
      Seq(in("table", StringType), in("branch", StringType)),
      StructType(Seq(
        StructField("dropped", StringType, nullable = false),
        StructField("current_head", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0); val b = str(r, 1)
        gen(c, t).dropBranch(b)
        Seq(b, headId(c, t))
      }),

    new Proc("create_tag",
      Seq(in("table", StringType), in("tag", StringType),
        inDefault("snapshot_id", LongType, "-1")),
      StructType(Seq(
        StructField("tag", StringType, nullable = false),
        StructField("snapshot_id", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0); val name = str(r, 1)
        gen(c, t).tag(name, r.getLong(2))
        Seq(name, graft.meta.SnapshotLog(c.dirByName(t)).refs(name))
      }),

    new Proc("drop_tag",
      Seq(in("table", StringType), in("tag", StringType)),
      StructType(Seq(StructField("dropped", StringType, nullable = false))),
      (c, r) => {
        gen(c, str(r, 0)).removeTag(str(r, 1))
        Seq(str(r, 1))
      }),

    // WAP publish: re-register an audit-branch snapshot's files onto main
    new Proc("cherrypick_snapshot",
      Seq(in("table", StringType), in("snapshot_id", LongType)),
      StructType(Seq(
        StructField("source_snapshot_id", LongType, nullable = false),
        StructField("current_head", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        gen(c, t).cherrypick(r.getLong(1))
        Seq(r.getLong(1), headId(c, t))
      }),

    // rewrite_data_files(strategy => 'sort' | 'zorder') parity: re-cluster
    // the live rows so range/equality predicates prune files from the
    // manifest metrics — sort for one key, z-order for mixed patterns
    new Proc("rewrite_sorted",
      Seq(in("table", StringType), in("columns", StringType),
        inDefault("rows_per_file", IntegerType, "100000")),
      StructType(Seq(
        StructField("strategy", StringType, nullable = false),
        StructField("data_files_after", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        val cols = str(r, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(cols.nonEmpty, "rewrite_sorted: give at least one column")
        val g = gen(c, t)
        val strategy =
          if (cols.size == 1) { g.compactSorted(cols.head, r.getInt(2)); "sort" }
          else { g.compactZOrder(cols, r.getInt(2)); "zorder" }
        g.commit()
        Seq(strategy, liveCounts(c, t)._1)
      }),

    // Iceberg add_files parity: adopt external parquet files in place —
    // bytes never move, one metadata commit, real stats envelopes
    // ([[GraftTableGenerator.addFiles]]; hive `col=value` layouts for
    // identity-partitioned specs)
    new Proc("add_files",
      Seq(in("table", StringType), in("source_dir", StringType)),
      StructType(Seq(
        StructField("added_files", LongType, nullable = false),
        StructField("added_rows", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        gen(c, t).addFiles(str(r, 1)).commit()
        val snap = state(c, t).snapshots.last
        Seq(snap.dataFiles.size.toLong, snap.dataFiles.map(_.recordCount).sum)
      }),

    // Iceberg snapshot-table parity: CREATE a graft table over an existing
    // parquet directory without copying it — schema inferred from the
    // files, then the whole corpus adopted via addFiles in one commit.
    // `partition_by` (comma-separated column names) declares an IDENTITY
    // spec for a hive-laid-out source: the `col=value` directories become
    // partition tuples, so partition pruning works from the first query
    // (files must still physically carry the columns — addFiles verifies).
    new Proc("snapshot",
      Seq(in("source_dir", StringType), in("table", StringType),
        inDefault("partition_by", StringType, "''")),
      StructType(Seq(
        StructField("table", StringType, nullable = false),
        StructField("added_files", LongType, nullable = false),
        StructField("added_rows", LongType, nullable = false))),
      (c, r) => {
        val spark = org.apache.spark.sql.SparkSession.active
        val srcDir = str(r, 0); val t = str(r, 1)
        val partCols = str(r, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val d = c.dirForCreate(t)
        val struct = spark.read.option("recursiveFileLookup", "true")
          .parquet(srcDir).schema
        val gschema = graft.schema.GraftSchema.of(
          struct.fields.map(f => f.name -> f.dataType).toSeq: _*)
        partCols.foreach(p => require(gschema.names.contains(p),
          s"snapshot: partition_by column $p is not in the file schema " +
            s"(${gschema.names.mkString(", ")}) — hive imports must carry " +
            "partition columns physically"))
        new GraftTableGenerator(spark, d.getParent.toString,
            d.getFileName.toString)
          .create(gschema, partCols)
          .addFiles(srcDir).commit()
        val snap = state(c, t).snapshots.last
        Seq(t, snap.dataFiles.size.toLong, snap.dataFiles.map(_.recordCount).sum)
      }),

    // the one-call service loop: fragment compaction, DV consolidation,
    // expiry, orphan GC
    new Proc("maintain",
      Seq(in("table", StringType),
        inDefault("min_frag_files", IntegerType, "4"),
        inDefault("keep_last", IntegerType, "5")),
      StructType(Seq(
        StructField("data_files_after", LongType, nullable = false),
        StructField("delete_files_after", LongType, nullable = false),
        StructField("snapshots_after", LongType, nullable = false))),
      (c, r) => {
        val t = str(r, 0)
        gen(c, t).maintain(minFragFiles = r.getInt(1), keepLast = r.getInt(2),
          orphanGraceMs = 0L)
        val (d, x) = liveCounts(c, t)
        Seq(d, x, snapshotCount(c, t))
      })
  )

  private val byName: Map[String, Proc] = all.map(p => p.pname -> p).toMap

  def load(catalog: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"graft procedures live in the `system` namespace, got $ident")
    byName.get(ident.name()).map(new CatalogBound(_, catalog)).getOrElse(
      throw new UnsupportedOperationException(
        s"no graft procedure ${ident.name()}; available: " +
          byName.keys.toSeq.sorted.mkString(", ")))
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      byName.keys.toSeq.sorted.map(n =>
        Identifier.of(Array("system"), n)).toArray
    else Array.empty
}
