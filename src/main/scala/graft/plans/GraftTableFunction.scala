package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

import graft.read.MorReader

/** SQL surface for the MoR engine: a table-valued function so plain SQL —
  * not just the Scala API — can query graft tables, time travel included:
  *
  *   SELECT * FROM graft_table('/wh/tbl')            -- current snapshot
  *   SELECT * FROM graft_table('/wh/tbl', 5)         -- FOR VERSION AS OF
  *   SELECT * FROM graft_table('/wh/tbl', 'audited') -- branch/tag ref
  *
  * The builder runs at analysis time and returns the fully-resolved MoR
  * read plan (pos/eq-delete anti-joins, per-epoch projection, pruning —
  * everything `MorReader` does), so Catalyst optimizes the expanded plan
  * exactly as if it had been built through the DataFrame API: filters on
  * the TVF's columns push down into the underlying parquet scans.
  */
object GraftTableFunction {

  val identifier: FunctionIdentifier = FunctionIdentifier("graft_table")

  val info: ExpressionInfo = new ExpressionInfo(
    "graft.plans.GraftTableFunction", "graft_table")

  val builder: Seq[Expression] => LogicalPlan = { args =>
    val spark = SparkSession.active
    def const(e: Expression): Any = {
      require(e.foldable, s"graft_table arguments must be literals, got $e")
      e.eval()
    }
    val df = args match {
      case Seq(p) =>
        MorReader.read(spark, const(p).toString)
      case Seq(p, v) => v.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          MorReader.readAt(spark, const(p).toString,
            const(v).asInstanceOf[Number].longValue)
        case StringType =>
          MorReader.readRef(spark, const(p).toString, const(v).toString)
        case other =>
          throw new IllegalArgumentException(
            s"graft_table second argument must be a snapshot id or ref name, got $other")
      }
      case _ =>
        throw new IllegalArgumentException(
          "graft_table(path [, snapshotId | refName])")
    }
    df.queryExecution.analyzed
  }

  val atIdentifier: FunctionIdentifier = FunctionIdentifier("graft_table_at")

  val atInfo: ExpressionInfo = new ExpressionInfo(
    "graft.plans.GraftTableFunction", "graft_table_at")

  /** `graft_table_at('/wh/tbl', tsMs)` — wall-clock time travel (`FOR
    * TIMESTAMP AS OF`) from plain SQL: the state as of the newest snapshot
    * whose writer-stamped commit time is <= tsMs. */
  val atBuilder: Seq[Expression] => LogicalPlan = { args =>
    val spark = SparkSession.active
    def const(e: Expression): Any = {
      require(e.foldable, s"graft_table_at arguments must be literals, got $e")
      e.eval()
    }
    args match {
      case Seq(p, ts) =>
        MorReader.readAtTime(spark, const(p).toString,
          const(ts).asInstanceOf[Number].longValue)
          .queryExecution.analyzed
      case _ =>
        throw new IllegalArgumentException("graft_table_at(path, tsMs)")
    }
  }

  val changesIdentifier: FunctionIdentifier =
    FunctionIdentifier("graft_table_changes")

  val changesInfo: ExpressionInfo = new ExpressionInfo(
    "graft.plans.GraftTableFunction", "graft_table_changes")

  /** `graft_table_changes('/wh/tbl', fromSnap, toSnap)` — the CDC
    * changelog (net inserts/deletes in the (from, to] snapshot window)
    * from plain SQL; the Iceberg `table_changes` parity surface. */
  val changesBuilder: Seq[Expression] => LogicalPlan = { args =>
    val spark = SparkSession.active
    def const(e: Expression): Any = {
      require(e.foldable, s"graft_table_changes arguments must be literals, got $e")
      e.eval()
    }
    args match {
      case Seq(p, from, to) =>
        MorReader.changelogBetween(spark, const(p).toString,
          const(from).asInstanceOf[Number].longValue,
          const(to).asInstanceOf[Number].longValue)
          .queryExecution.analyzed
      case _ =>
        throw new IllegalArgumentException(
          "graft_table_changes(path, fromSnapshotId, toSnapshotId)")
    }
  }

  val lineageIdentifier: FunctionIdentifier =
    FunctionIdentifier("graft_table_lineage")

  val lineageInfo: ExpressionInfo = new ExpressionInfo(
    "graft.plans.GraftTableFunction", "graft_table_lineage")

  /** `graft_table_lineage('/wh/tbl')` — the live rows plus Iceberg-v3 row
    * lineage (`_row_id`, `_last_updated_seq`) from plain SQL, so an
    * incremental SQL consumer can key its downstream state on identity
    * that survives compaction. */
  val lineageBuilder: Seq[Expression] => LogicalPlan = { args =>
    val spark = SparkSession.active
    args match {
      case Seq(p) =>
        require(p.foldable, s"graft_table_lineage argument must be a literal, got $p")
        MorReader.readLineage(spark, p.eval().toString)
          .queryExecution.analyzed
      case _ =>
        throw new IllegalArgumentException("graft_table_lineage(path)")
    }
  }

  val statsIdentifier: FunctionIdentifier =
    FunctionIdentifier("graft_table_stats")

  val statsInfo: ExpressionInfo = new ExpressionInfo(
    "graft.plans.GraftTableFunction", "graft_table_stats")

  /** `graft_table_stats('/wh/tbl')` — the persisted ANALYZE statistics
    * (per-column NDV / nulls / min-max, row count, staleness) as a SQL
    * metadata table ([[graft.meta.TableStats]]). */
  val statsBuilder: Seq[Expression] => LogicalPlan = { args =>
    val spark = SparkSession.active
    args match {
      case Seq(p) =>
        require(p.foldable, s"graft_table_stats argument must be a literal, got $p")
        graft.meta.TableStats.frame(spark, p.eval().toString)
          .queryExecution.analyzed
      case _ =>
        throw new IllegalArgumentException("graft_table_stats(path)")
    }
  }

  val metaIdentifier: FunctionIdentifier =
    FunctionIdentifier("graft_table_meta")

  val metaInfo: ExpressionInfo = new ExpressionInfo(
    "graft.plans.GraftTableFunction", "graft_table_meta")

  /** `graft_table_meta('/wh/tbl', 'files' | 'delete_files' | 'snapshots'
    * | 'partitions' | 'history' | 'refs' | 'all_files')` — the Iceberg
    * `tbl.files`-style metadata tables from plain SQL, one TVF keyed by
    * table name (Spark's TVF registry has no dotted-suffix syntax, so the
    * selector is an argument). */
  val metaBuilder: Seq[Expression] => LogicalPlan = { args =>
    val spark = SparkSession.active
    args match {
      case Seq(p, which) =>
        require(p.foldable && which.foldable,
          "graft_table_meta arguments must be literals")
        val dir = p.eval().toString
        val df = which.eval().toString match {
          case "files" => graft.read.MetaTables.files(spark, dir)
          case "delete_files" => graft.read.MetaTables.deleteFiles(spark, dir)
          case "snapshots" => graft.read.MetaTables.snapshots(spark, dir)
          case "partitions" => graft.read.MetaTables.partitions(spark, dir)
          case "history" => graft.read.MetaTables.history(spark, dir)
          case "refs" => graft.read.MetaTables.refs(spark, dir)
          case "all_files" => graft.read.MetaTables.allDataFiles(spark, dir)
          case other => throw new IllegalArgumentException(
            s"unknown metadata table '$other' (files, delete_files, " +
              "snapshots, partitions, history, refs, all_files)")
        }
        df.queryExecution.analyzed
      case _ =>
        throw new IllegalArgumentException("graft_table_meta(path, which)")
    }
  }

  /** Idempotent live-session registration (mirrors the scalar-function
    * path in `GraftFunctions.ensureRegistered`). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    if (!reg.functionExists(identifier)) {
      reg.registerFunction(identifier, info, builder)
    }
    if (!reg.functionExists(changesIdentifier)) {
      reg.registerFunction(changesIdentifier, changesInfo, changesBuilder)
    }
    if (!reg.functionExists(atIdentifier)) {
      reg.registerFunction(atIdentifier, atInfo, atBuilder)
    }
    if (!reg.functionExists(lineageIdentifier)) {
      reg.registerFunction(lineageIdentifier, lineageInfo, lineageBuilder)
    }
    if (!reg.functionExists(statsIdentifier)) {
      reg.registerFunction(statsIdentifier, statsInfo, statsBuilder)
    }
    if (!reg.functionExists(metaIdentifier)) {
      reg.registerFunction(metaIdentifier, metaInfo, metaBuilder)
    }
  }
}
