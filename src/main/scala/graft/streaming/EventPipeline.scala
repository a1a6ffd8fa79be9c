package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** File-source Structured Streaming pipeline over the `events` shape:
  * `readStream` on a parquet directory → event-time tumbling-window
  * aggregation with a watermark → `writeStream` parquet sink (append
  * mode: a window emits exactly once, when the watermark passes it).
  *
  * This is the 100 TB streaming shape: new files land in the input dir
  * (or a real source like Kafka swaps in via `format(...)` only), state
  * is bounded by the watermark, output is an append-only fact table a
  * downstream batch query reads with plain `spark.read`.
  */
object EventPipeline {

  /** Input schema: ts already micros-typed (the ns→µs conversion happens
    * at ingest — streaming sources shouldn't re-derive it per batch). */
  val inputSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Windowed counts + value sums per (hour, event_type). */
  def windowedCounts(stream: DataFrame, watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("value_cents"))

  /** Wire the full pipeline: parquet dir in → parquet dir out. */
  def start(spark: SparkSession, inputDir: String, outputDir: String,
            checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream.schema(inputSchema)
      .option("maxFilesPerTrigger", 1) // bounded micro-batches
      .parquet(inputDir)
    windowedCounts(stream)
      .writeStream
      .format("parquet")
      .option("path", outputDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }
}
