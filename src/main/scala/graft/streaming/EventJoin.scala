package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: purchases matched to the same user's
  * clicks in a bounded preceding window — the attribution join every
  * event pipeline runs at ingest.
  *
  * Both sides carry watermarks AND the join condition bounds the time
  * range, which is exactly what lets Spark BOUND THE JOIN STATE: a
  * buffered click is evictable once the purchase-side watermark passes
  * `click_ts + window`, and vice versa. Without the range condition the
  * state grows forever — the difference between a demo and a pipeline
  * that survives week-long streams at 100 TB.
  */
object EventJoin {

  /** `purchases(event_id, user_id, p_ts)` ⋈ `clicks(c_user, c_ts)` where
    * the click happened within `windowSec` before the purchase (inclusive
    * on both ends, matching the batch oracle's BETWEEN). */
  def purchasesWithClicks(purchases: DataFrame, clicks: DataFrame,
                          windowSec: Long, watermark: String = "1 hour"): DataFrame =
    purchases.withWatermark("p_ts", watermark)
      .join(clicks.withWatermark("c_ts", watermark),
        expr(s"""user_id = c_user AND
                |c_ts BETWEEN p_ts - INTERVAL $windowSec SECONDS AND p_ts""".stripMargin))
      .select(col("event_id"), col("user_id"), col("p_ts"), col("c_ts"))
}
