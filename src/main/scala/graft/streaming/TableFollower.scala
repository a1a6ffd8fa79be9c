package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.meta.SnapshotLog
import graft.read.MorReader

/** Follow a graft table as an INCREMENTAL SOURCE — the Iceberg streaming
  * read (`spark.readStream.format("iceberg")`) shape, which the reference
  * generator's tables support through the same snapshot metadata this
  * models (reference tables are standard Iceberg,
  * `IcebergTableGenerator.java:96-117`).
  *
  * Semantics (matching Iceberg's streaming-read defaults):
  *   - the FIRST poll delivers the table's full current contents (the
  *     "initial snapshot" — a MoR read, deletes applied) and sets the
  *     offset to the head snapshot;
  *   - every later poll delivers exactly the rows APPENDED since the
  *     offset ([[MorReader.appendsBetween]]): rewrite snapshots
  *     (compaction, z-order, expiry baselines — `operation="replace"`)
  *     re-express existing rows and are SKIPPED, so maintenance never
  *     re-delivers data (`skip-overwrite-snapshots`); delete-only
  *     snapshots add no data files and emit nothing
  *     (`skip-delete-snapshots`). Deletes are not propagated — this is
  *     the append-only consumption mode; row-level change consumption is
  *     [[MorReader.changelogBetween]].
  *
  * The offset is DURABLE (`<checkpointDir>/offset.txt`, written
  * atomically via temp-file + move) and advances only on [[commit]], so
  * the delivery contract is at-least-once: a consumer that crashes
  * between applying a batch and committing it sees the same batch again
  * on restart. Pair the apply with a keyed idempotent sink (an
  * [[EventMerge]]-style version-gated merge, or [[GraftTableGenerator
  * .upsert]]) and replay collapses to exactly-once EFFECT — the same
  * table-as-state argument as streaming CDC apply.
  *
  * Failure modes are loud, never silent holes:
  *   - snapshot expiry crossing the offset folds unconsumed appends into
  *     a rebased `replace` baseline the incremental scan rightly skips —
  *     detected because the offset id left retained history;
  *   - a rollback below the offset rewinds history the follower already
  *     consumed — detected as head < offset.
  *
  * Scale: a poll is one driver-side metadata read plus a scan of ONLY
  * the delta files — O(new data), independent of table size; the
  * follower itself holds no state but one long. At 100 TB this is the
  * incremental-ETL primitive: downstream jobs track a table without
  * re-reading it, and the maintenance loop (compaction/expiry) runs
  * freely underneath since rewrites are invisible to consumers.
  */
final class TableFollower(spark: SparkSession, tableDir: String,
                          checkpointDir: String) {

  private val offsetFile = Paths.get(checkpointDir, "offset.txt")

  /** Last snapshot id durably consumed; 0 = nothing (next poll is the
    * initial snapshot load). */
  def offset: Long =
    if (Files.exists(offsetFile)) Files.readString(offsetFile).trim.toLong
    else 0L

  /** One polled increment: rows plus the offset window it covers. */
  final case class Batch(rows: DataFrame, fromExclusive: Long,
                         toInclusive: Long)

  /** The next unconsumed increment, or None when caught up. Does NOT
    * advance the offset — [[commit]] the batch after its effects are
    * durable downstream. */
  def poll(): Option[Batch] = {
    val from = offset
    val st = SnapshotLog(tableDir).load().mainOnly
    val to = st.snapshots.lastOption.map(_.id).getOrElse(0L)
    if (to == from) return None
    require(to > from,
      s"table at $tableDir rolled back below the follower offset " +
        s"(offset $from, head $to) — reset the checkpoint to re-follow")
    require(from == 0L || st.snapshots.exists(_.id == from),
      s"follower offset $from predates the table's retained history " +
        "(snapshot expiry crossed it) — reset the checkpoint to re-follow")
    val rows =
      if (from == 0L) MorReader.read(spark, tableDir) // initial snapshot
      else MorReader.appendsBetween(spark, tableDir, from, to)
    Some(Batch(rows, from, to))
  }

  /** Durably advance the offset past `batch`. Call AFTER the batch's
    * downstream effects are committed (at-least-once ordering). */
  def commit(batch: Batch): Unit = {
    Files.createDirectories(offsetFile.getParent)
    val tmp = offsetFile.resolveSibling(s"offset-${batch.toInclusive}.tmp")
    Files.writeString(tmp, batch.toInclusive.toString)
    Files.move(tmp, offsetFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Poll→apply→commit until caught up; returns batches applied. `apply`
    * observes each batch at-least-once across crashes (see class doc). */
  def drain(apply: DataFrame => Unit): Int = {
    var n = 0
    var batch = poll()
    while (batch.isDefined) {
      apply(batch.get.rows)
      commit(batch.get)
      n += 1
      batch = poll()
    }
    n
  }

  /** CDC consumption mode: like [[poll]], but each batch carries
    * row-level CHANGES — a `change_kind` column (`insert`/`delete`)
    * ahead of the table schema ([[MorReader.changelogBetween]]); an
    * upstream update surfaces as delete(old)+insert(new). The initial
    * poll is the full current state as inserts. Same offset, same
    * guards, same at-least-once contract as [[poll]]. */
  def pollChanges(): Option[Batch] = {
    val from = offset
    poll().map { b =>
      if (from == 0L)
        b.copy(rows = b.rows.selectExpr("'insert' as change_kind", "*"))
      else
        b.copy(rows = MorReader.changelogBetween(spark, tableDir,
          b.fromExclusive, b.toInclusive))
    }
  }

  /** Replicate this table into `replica` — the CDC table-mirroring loop,
    * for tables key-unique on `keyCols` (the primary-key contract every
    * CDC replication scheme assumes). Each polled window collapses to
    * the final action per key (an insert beats the delete of the old
    * version it replaced) and applies as ONE version-gate-free
    * [[graft.table.GraftTableGenerator.mergeInto]] transaction through
    * the conflict-retry loop: matched inserts replace, matched deletes
    * kill, unmatched inserts append. Unlike [[drain]]'s append-only
    * mode, upstream deletes and updates PROPAGATE. Replaying a window
    * (crash between replica commit and offset commit) converges: re-run
    * inserts replace rows with themselves, re-run deletes match
    * nothing — exactly-once effect from at-least-once delivery. */
  def replicateInto(replica: graft.table.GraftTableGenerator,
                    keyCols: Seq[String]): Int = {
    import org.apache.spark.sql.functions._
    var n = 0
    var batch = pollChanges()
    while (batch.isDefined) {
      val rows = batch.get.rows
      val dataCols = rows.columns.filter(_ != "change_kind").toSeq
      // final action per key: 'insert' > 'delete' lexically, and the
      // to-state MoR merge leaves at most one live insert per key
      val latest = rows.groupBy(keyCols.map(col): _*)
        .agg(max_by(struct(("change_kind" +: dataCols).map(col): _*),
          col("change_kind")).as("_c"))
        .select(col("_c.*"))
      if (!latest.isEmpty)
        replica.commitWithRetry()(_.mergeInto(latest, keyCols,
          updateWhen = col("change_kind") === "insert",
          deleteWhen = col("change_kind") === "delete",
          insertWhen = col("change_kind") === "insert"))
      commit(batch.get)
      n += 1
      batch = pollChanges()
    }
    n
  }
}
