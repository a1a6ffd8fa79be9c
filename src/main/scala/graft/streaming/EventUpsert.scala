package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.table.GraftTableGenerator

/** Streaming CDC ingest into a Graft table: `foreachBatch` → one MoR
  * upsert transaction per micro-batch (global-scope eq-delete on the key
  * + append = ONE snapshot), the lakehouse ingestion shape — a
  * downstream batch reader gets key-unique live rows from
  * [[graft.read.MorReader]] and can time-travel the snapshot history the
  * stream wrote, batch by batch.
  *
  * Within a batch, rows collapse to ONE per key before the upsert
  * (greatest `verCol` wins, `max_by`) — a micro-batch carrying N updates
  * to a key must not append N live rows. Across failure/replay,
  * re-upserting the same rows is row-level idempotent: the same keys
  * eq-delete their previous versions again, so a replayed batch costs a
  * redundant snapshot, never a corrupt live set. No watermark state —
  * the TABLE is the state, which is what lets the job restart cold.
  *
  * Scale: the per-batch work is the upsert write path (partition slices
  * + one delete file); micro-batch cadence bounds snapshot-log growth,
  * and [[GraftTableGenerator.expireSnapshots]] +
  * [[GraftTableGenerator.compact]] are the maintenance pair that keep
  * the log and the delete fan-in bounded under continuous ingest.
  */
object EventUpsert {

  /** Latest row per key (greatest `verCol`) — the per-batch collapse.
    * Ties on `verCol` break deterministically by the remaining columns
    * (struct comparison is lexicographic by field), so a replayed batch
    * always elects the same winner — without this, replay after failure
    * could flip a tied key between runs. */
  def latestPerKey(batch: DataFrame, keyCols: Seq[String],
                   verCol: String): DataFrame = {
    val all = struct(batch.columns.map(col): _*)
    val order = struct(col(verCol) +:
      batch.columns.filterNot(_ == verCol).map(col): _*)
    batch.groupBy(keyCols.map(col): _*)
      .agg(max_by(all, order).as("_m"))
      .select(col("_m.*"))
  }

  /** Each micro-batch commits through the optimistic-concurrency retry
    * loop: a maintenance writer (compaction / snapshot expiry) racing the
    * ingester costs a refresh + re-stage, never a lost batch or an
    * interleaved snapshot. */
  def start(upserts: DataFrame, gen: GraftTableGenerator, keyCols: Seq[String],
            verCol: String, checkpointDir: String): StreamingQuery =
    upserts.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val latest = latestPerKey(batch, keyCols, verCol)
        if (!latest.isEmpty) { gen.commitWithRetry()(_.upsert(latest, keyCols)); () }
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
