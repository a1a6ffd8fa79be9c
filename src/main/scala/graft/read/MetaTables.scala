package graft.read

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.meta._

/** Queryable metadata tables — the analog of Iceberg's `tbl.files`,
  * `tbl.delete_files`, `tbl.snapshots` and `tbl.partitions` metadata
  * tables, which are part of the user-visible surface of any table the
  * reference generates (a reference user inspects their output with
  * `SELECT * FROM db.tbl.files`; reference tables are standard Iceberg,
  * `IcebergTableGenerator.java:96-117`).
  *
  * Everything derives from the snapshot log alone — zero data-file I/O.
  * The log parse is the same driver-side metadata read the scan planner
  * already performs ([[MorReader]]); results come back as DataFrames so
  * downstream joins/aggregations stay distributed. At Iceberg scale the
  * manifest list itself is read as a distributed scan; our single
  * JSON-lines log is the SURVEY §7.4.6 single-writer design, and the
  * row counts here are FILE counts (metadata-scale, millions at 100 TB
  * — well within a DataFrame materialized from the driver).
  *
  * `record_count` is the DECLARED manifest count, exactly like Iceberg's
  * metadata tables — `appendEmptyFile`'s lying `record_count=1`
  * (reference `IcebergTableGenerator.java:168`) shows up here as 1, by
  * design (metadata tables report the manifest, not the data). The
  * distributed bulk-append path stages a `-1` sentinel instead of a
  * count (no driver-side count job); that renders as NULL here and is
  * excluded from the partition/snapshot rollups — a sentinel must never
  * surface as a row count.
  */
// Serializable: the sharded-path tasks of [[liveFileRows]] call the
// module's pure helpers (rel/partStr) from executor closures
object MetaTables extends Serializable {

  /** Path relative to the table root — stable across warehouses. */
  private def rel(tableDir: String, p: String): String =
    p.stripPrefix(tableDir).stripPrefix("/")

  /** Canonical `k=v[/k=v...]` partition rendering (keys sorted). */
  private def partStr(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("/")

  private def state(tableDir: String, asOf: Option[Long]): TableState = {
    val st = SnapshotLog(tableDir).load()
    asOf.map(st.asOf).getOrElse(st)
  }

  /** Live data-file rows as a DataFrame — the shared feed of the
    * file-level metadata tables (`files`, `lineage_files`, `partitions`).
    * An inline log builds driver-side (metadata-scale, as before); a
    * SHARDED log plans from the OUTLINE and parses each manifest-group
    * file inside a Spark task — the file-level metadata tables stay
    * usable at 10^7 files instead of materializing every entry on the
    * driver (Iceberg's metadata tables are distributed scans for the
    * same reason). The removal fold and per-path dedup mirror
    * [[TableState.dataFiles]] exactly. `record_count_raw` keeps the -1
    * unknown-count sentinel; consumers null it out or filter it. */
  private def liveFileRows(spark: SparkSession, tableDir: String,
                           asOf: Option[Long]): DataFrame = {
    import spark.implicits._
    val out0 = SnapshotLog(tableDir).loadOutline().mainOnly
    val out = asOf.map(out0.asOf).getOrElse(out0)
    val cols = Seq("file_path", "partition", "spec_id", "seq",
      "record_count_raw", "first_row_id", "lineage_in_file")
    def render(f: DataFileEntry) =
      (rel(tableDir, f.path), partStr(f.partition), f.specId, f.seq,
        f.recordCount, f.firstRowId, f.lineageInFile)
    val removed = out.removedDataPaths
    val inline = out.outlines.flatMap(_.snapshot.dataFiles)
      .filterNot(f => removed(f.path)).distinctBy(_.path).map(render)
    val groups = out.outlines.flatMap(_.dataManifests)
    if (groups.isEmpty) return inline.toDF(cols: _*)
    val metaDir = out.metaDir
    val bcRemoved = spark.sparkContext.broadcast(removed)
    val grouped = spark.sparkContext
      .parallelize(groups, math.max(1, math.min(groups.size, 64)))
      .flatMap { name =>
        SnapshotLog.readDataManifestFile(metaDir, name).iterator
          .filterNot(f => bcRemoved.value(f.path)).map(render)
      }
    inline.toDF(cols: _*).unionByName(grouped.toDF(cols: _*))
      .dropDuplicates("file_path")
  }

  /** `tbl.files`: one row per LIVE data file at the (asOf) snapshot —
    * compaction-removed files are gone, time travel resurrects them. */
  def files(spark: SparkSession, tableDir: String,
            asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    liveFileRows(spark, tableDir, asOf)
      .select(col("file_path"), col("partition"), col("spec_id"), col("seq"),
        when(col("record_count_raw") < 0L, lit(null))
          .otherwise(col("record_count_raw")).as("record_count"))
  }

  /** Row-lineage view of the live data files (Iceberg-v3 `first_row_id`
    * surface): plain files carry the manifest-assigned base id (rows are
    * `first_row_id + position`); rewritten files report -1 with
    * `lineage_in_file = true` — their ids travel MATERIALIZED inside the
    * file, which is how identity survives compaction. */
  def lineageFiles(spark: SparkSession, tableDir: String,
                   asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    liveFileRows(spark, tableDir, asOf)
      .select(col("file_path"), col("partition"),
        col("record_count_raw").as("record_count"),
        col("first_row_id"), col("lineage_in_file"))
  }

  /** `tbl.delete_files`: one row per live delete file (pos + eq). */
  def deleteFiles(spark: SparkSession, tableDir: String,
                  asOf: Option[Long] = None): DataFrame = {
    import spark.implicits._
    state(tableDir, asOf).deleteFiles
      .map(f => (rel(tableDir, f.path), partStr(f.partition), f.kind,
        f.equalityCols.mkString(","), f.seq))
      .toDF("file_path", "partition", "kind", "equality_cols", "seq")
  }

  /** `tbl.snapshots`: one row per committed snapshot, with the files/rows
    * ADDED by that commit (manifest-declared), the writer-stamped commit
    * wall-clock (`committed_at`, epoch millis — Iceberg `committed_at`)
    * and the explicit operation kind (Iceberg `operation`). */
  def snapshots(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    state(tableDir, None).snapshots
      .map(s => (s.id, s.seq, s.schemaV, s.specId,
        s.dataFiles.size.toLong, s.deleteFiles.size.toLong,
        s.dataFiles.map(_.recordCount).filter(_ >= 0).sum,
        s.removedDataFiles.size.toLong, s.timestampMs, s.operation))
      .toDF("snapshot_id", "seq", "schema_v", "spec_id",
        "added_data_files", "added_delete_files", "added_rows",
        "removed_data_files", "committed_at", "operation")
  }

  /** `tbl.refs`: one row per named ref (the Iceberg refs metadata table;
    * all graft refs are tags — retained snapshots pinned by name). */
  def refs(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    SnapshotLog(tableDir).refs.toSeq.sortBy(_._1)
      .map { case (n, id) => (n, "tag", id) }
      .toDF("name", "type", "snapshot_id")
  }

  /** `tbl.history`: the table's commit timeline — one row per retained
    * snapshot in commit order, with the writer-stamped wall clock
    * (`made_current_at`, Iceberg's column of the same name) and the
    * parent link. The graft log is linear — [[graft.table
    * .GraftTableGenerator.rollbackTo]] TRUNCATES dropped snapshots out
    * of the log instead of leaving dead branches — so every retained
    * snapshot is an ancestor of the current one by construction;
    * `is_current_ancestor` is kept for Iceberg surface parity. */
  def history(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val snaps = state(tableDir, None).snapshots
    snaps.zipWithIndex
      .map { case (s, i) =>
        (s.timestampMs, s.id,
          if (i == 0) None else Some(snaps(i - 1).id), true) }
      .toDF("made_current_at", "snapshot_id", "parent_id",
        "is_current_ancestor")
  }

  /** `tbl.all_data_files`: every data file ANY retained snapshot
    * references — the time-travel surface, not just the live set
    * (Iceberg's `all_data_files` metadata table). `live` marks
    * membership in the current state: compaction- and rollback-removed
    * files show `live=false` until snapshot expiry drops the snapshots
    * that reference them. Each path appears once, under the snapshot
    * that ADDED it (rewrites always mint fresh probe-numbered paths, so
    * a path has exactly one adding snapshot). */
  def allDataFiles(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val st = state(tableDir, None)
    val live = st.dataFiles.map(_.path).toSet
    st.snapshots.flatMap(_.dataFiles)
      .groupBy(_.path).toSeq
      .map { case (p, fs) =>
        val f = fs.head
        (rel(tableDir, p), partStr(f.partition), f.specId, f.seq,
          if (f.recordCount < 0) None else Some(f.recordCount), live(p)) }
      .sortBy(_._1)
      .toDF("file_path", "partition", "spec_id", "seq", "record_count",
        "live")
  }

  /** `tbl.manifests`: one row per physical manifest unit (the Iceberg
    * manifest-list view) — inline snap-file lists report as `inline`,
    * sharded snapshots report each manifest-group file with its
    * persisted stats legend (data groups stay UNREAD — O(snap files)
    * however many entries the table holds). `added_rows` is NULL when
    * any member count is unknown, and always NULL on delete units (a
    * delete manifest entry declares no row count). */
  def manifests(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    SnapshotLog(tableDir).manifestIndex()
      .map { case (sid, content, unit, files, rows, mnSeq, mxSeq) =>
        (sid, content, unit, files, if (rows < 0) None else Some(rows),
          mnSeq, mxSeq) }
      .toDF("snapshot_id", "content", "manifest", "file_count",
        "added_rows", "min_seq", "max_seq")
  }

  /** `tbl.entries`: the per-snapshot manifest-entry ledger (Iceberg's
    * entries table): every file a snapshot ADDED (`status='added'`, with
    * its declared count) or REMOVED (`status='deleted'` — compaction /
    * expiry rebase rewrites), on both the data and delete sides. The
    * live file set is exactly the added-minus-deleted fold of this
    * table, which makes it the audit surface for rewrite honesty. */
  def entries(spark: SparkSession, tableDir: String,
              asOf: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val out0 = SnapshotLog(tableDir).loadOutline().mainOnly
    val out = asOf.map(out0.asOf).getOrElse(out0)
    val cols = Seq("snapshot_id", "status", "content", "file_path",
      "partition", "seq", "record_count")
    def addedData(sid: Long, f: DataFileEntry) =
      (sid, "added", "data", rel(tableDir, f.path), partStr(f.partition),
        f.seq, if (f.recordCount < 0) None else Some(f.recordCount))
    // delete entries / removal lists are metadata-scale (outline
    // materializes them anyway); only sharded DATA lists go distributed
    val inline = out.outlines.flatMap { o =>
      val s = o.snapshot
      s.dataFiles.map(addedData(s.id, _)) ++
      s.deleteFiles.map(f => (s.id, "added", "deletes",
        rel(tableDir, f.path), partStr(f.partition), f.seq,
        None: Option[Long])) ++
      s.removedDataFiles.map(p => (s.id, "deleted", "data",
        rel(tableDir, p), "", -1L, None: Option[Long])) ++
      s.removedDeleteFiles.map(p => (s.id, "deleted", "deletes",
        rel(tableDir, p), "", -1L, None: Option[Long]))
    }
    val groups = out.outlines.flatMap(o =>
      o.dataManifests.map(name => (o.snapshot.id, name)))
    if (groups.isEmpty) return inline.toDF(cols: _*)
    val metaDir = out.metaDir
    val grouped = spark.sparkContext
      .parallelize(groups, math.max(1, math.min(groups.size, 64)))
      .flatMap { case (sid, name) =>
        SnapshotLog.readDataManifestFile(metaDir, name)
          .iterator.map(addedData(sid, _))
      }
    inline.toDF(cols: _*).unionByName(grouped.toDF(cols: _*))
  }

  /** `tbl.position_deletes`: the CONTENT of the live positional tombstone
    * files (Iceberg's position_deletes metadata table) — one row per
    * (data file, position) pair, with the tombstone file that carries it.
    * Plain pos files are read as-is; delete VECTORS expand their 64-bit
    * bitmap words back to positions (`posexplode` over the words array,
    * then the set bits of each word) — all distributed, row-scale with
    * the number of deleted rows, zero driver materialization. */
  def positionDeletes(spark: SparkSession, tableDir: String,
                      asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val st = state(tableDir, asOf)
    val posPaths = st.deleteFiles.filter(_.kind == "pos").map(_.path)
    val dvPaths = st.deleteFiles.filter(_.kind == "dv").map(_.path)
    val posSchema = StructType(Seq(StructField("file_path", StringType),
      StructField("pos", LongType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(posSchema.fields :+ StructField("delete_file_path", StringType)))
    val plain =
      if (posPaths.isEmpty) empty
      else spark.read.schema(posSchema).parquet(posPaths: _*)
        .select(col("file_path"), col("pos"),
          regexp_replace(col("_metadata.file_path"), "^file:/+", "/")
            .as("delete_file_path"))
    val dvSchema = StructType(Seq(StructField("file_path", StringType),
      StructField("words", ArrayType(LongType))))
    val vectors =
      if (dvPaths.isEmpty) empty
      else spark.read.schema(dvSchema).parquet(dvPaths: _*)
        .select(col("file_path"),
          regexp_replace(col("_metadata.file_path"), "^file:/+", "/")
            .as("delete_file_path"),
          posexplode(col("words")).as(Seq("w_idx", "word")))
        .where(col("word") =!= 0L)
        .select(col("file_path"), col("delete_file_path"),
          explode(expr(
            "filter(transform(sequence(0, 63), b -> " +
              "IF((shiftright(word, b) & 1) = 1, " +
              "w_idx * 64L + CAST(b AS BIGINT), CAST(NULL AS BIGINT))), " +
              "x -> x IS NOT NULL)")).as("pos"))
        .select(col("file_path"), col("pos"), col("delete_file_path"))
    plain.unionByName(vectors)
      .withColumn("file_path",
        regexp_replace(col("file_path"), "^file:/+", "/"))
  }

  /** `tbl.partitions`: live data files and manifest rows per partition
    * (delete-unaware, exactly like Iceberg's partitions table — MoR
    * deletes are accounted in `delete_files`, not subtracted here). */
  def partitions(spark: SparkSession, tableDir: String,
                 asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    liveFileRows(spark, tableDir, asOf)
      .groupBy("partition")
      .agg(count(lit(1)).as("file_count"),
        coalesce(sum(when(col("record_count_raw") >= 0L,
          col("record_count_raw")).otherwise(0L)), lit(0L)).as("record_count"))
      .orderBy("partition")
  }
}
