package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.table.GraftTableGenerator

/** Streaming CDC APPLY: consume a changelog stream (each row a change
  * event with an `opCol` — `"U"` upsert / `"D"` delete — and a version
  * column, the Debezium-consumer shape) and apply each micro-batch as ONE
  * conditional [[GraftTableGenerator.mergeInto]] transaction:
  *   - latest op per key `"D"` → the table row dies,
  *   - latest op per key `"U"` → the row is replaced or inserted,
  *   - and every action is VERSION-GATED against the table
  *     (`ver > _t_ver` to update, `ver >= _t_ver` to delete), so a batch
  *     carrying LATE, OLDER changes — a rewound source, a replayed
  *     partition, cross-partition reordering — cannot overwrite newer
  *     table state. This is the guarantee plain [[EventUpsert]] (blind
  *     replace) cannot give.
  *
  * Within a batch, rows first collapse to the latest per key
  * ([[EventUpsert.latestPerKey]] — same deterministic tie election, so
  * replay re-elects the same winner). Replay is then row-level
  * idempotent BY the version gate: a re-applied `"U"` finds
  * `ver > _t_ver` false and leaves the row alone; a re-applied `"D"`
  * finds no match. No watermark state — the TABLE is the state, which is
  * what lets the job restart cold from any checkpoint.
  *
  * Scale: per batch, the merge's target read is file-pruned to the
  * batch's key envelope (see [[GraftTableGenerator.mergeInto]]), the join
  * is O(batch), and the write is one delete file + O(inserted) appends.
  * [[GraftTableGenerator.expireSnapshots]] / `compact` /
  * `compactPositionDeletes` are the maintenance loop that bounds log and
  * tombstone growth under continuous apply; each batch commits through
  * the optimistic-concurrency retry loop so maintenance races cost a
  * refresh + re-stage, never a lost batch.
  */
object EventMerge {

  def start(changes: DataFrame, gen: GraftTableGenerator, keyCols: Seq[String],
            verCol: String, opCol: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val latest = EventUpsert.latestPerKey(batch, keyCols, verCol)
        if (!latest.isEmpty) {
          gen.commitWithRetry()(_.mergeInto(latest, keyCols,
            updateWhen = col(opCol) =!= "D" && col(verCol) > col(s"_t_$verCol"),
            deleteWhen = col(opCol) === "D" && col(verCol) >= col(s"_t_$verCol"),
            insertWhen = col(opCol) =!= "D"))
          ()
        }
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
