package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventSessions
import graft.streaming.EventSessions.Ev

class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def eventRows(): Array[Ev] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), expr("ts div 1000").as("us"))
      .collect().map(r => Ev(r.getLong(0), r.getLong(1)))
  }

  /** Batch reference with the same µs-strict-> gap rule as EventSessions. */
  private def batchSummaries(gapSec: Long): Map[Long, (Long, Long)] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val w = Window.partitionBy("user_id").orderBy("us")
    spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), expr("ts div 1000").as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        col("us") - col("prev") > gapSec * 1000000L, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum("ns").as("n_sessions"), count(lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("mapGroupsWithState sessionization converges to the batch result") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = eventRows()
    val stream = MemoryStream[Ev]
    val out = EventSessions.streamingSummaries(spark, stream.toDS(), gapSec = 1800)
    val sq = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    try {
      // two micro-batches split by time — state must carry across batches
      val (first, second) = events.sortBy(_.tsMicros).splitAt(events.length / 2)
      stream.addData(first.toSeq); sq.processAllAvailable()
      stream.addData(second.toSeq); sq.processAllAvailable()
      // last update per user wins
      val streamed = spark.sql(
        "select userId, nSessions, nEvents from sessions")
        .collect().groupBy(_.getLong(0))
        .map { case (u, rows) =>
          val last = rows.maxBy(_.getLong(2)) // most events = latest update
          u -> (last.getLong(1), last.getLong(2))
        }
      assert(streamed == batchSummaries(1800))
    } finally sq.stop()
  }

  test("streaming result is batch-split invariant (one batch vs many)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = eventRows()
    def run(chunks: Seq[Seq[Ev]]): Map[Long, (Long, Long)] = {
      val stream = MemoryStream[Ev]
      val name = s"sess_${chunks.length}"
      val sq = EventSessions.streamingSummaries(spark, stream.toDS(), 1800)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        chunks.foreach { c => stream.addData(c); sq.processAllAvailable() }
        spark.sql(s"select userId, nSessions, nEvents from $name")
          .collect().groupBy(_.getLong(0))
          .map { case (u, rows) =>
            u -> { val l = rows.maxBy(_.getLong(2)); (l.getLong(1), l.getLong(2)) }
          }
      } finally sq.stop()
    }
    val sorted = events.sortBy(_.tsMicros).toSeq
    assert(run(Seq(sorted)) == run(sorted.grouped(100).toSeq))
  }
}
