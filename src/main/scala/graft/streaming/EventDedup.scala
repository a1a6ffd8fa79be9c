package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the ingest-side twin of the batch
  * `graft.ext.Dedup.exact` operator: an at-least-once source (replayed
  * Kafka offsets, retried file commits, client retries) re-delivers rows,
  * and the pipeline must make them effectively-exactly-once WITHOUT
  * keeping every id ever seen in state.
  *
  * `dropDuplicatesWithinWatermark` keeps an id in state only until the
  * event-time watermark passes its arrival, so state is bounded by
  * (arrival rate × watermark delay) — the contract that holds at 100 TB,
  * where an unbounded `dropDuplicates` state would grow forever. The
  * guarantee: a duplicate arriving within the watermark delay of its
  * first copy is ALWAYS dropped; one arriving later than the delay may
  * (correctly, per the declared bound) reappear.
  */
object EventDedup {

  /** Drop re-deliveries of the same `idCols` tuple arriving within the
    * watermark delay. `stream` must carry an event-time `ts` column. */
  def dedup(stream: DataFrame, idCols: Seq[String],
            watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
}
