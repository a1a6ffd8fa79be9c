package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.read.MorReader
import graft.schema.GraftSchema
import graft.table.GraftTableGenerator

/** `spark.readStream.format("graft")` / `writeStream.format("graft")` —
  * graft tables as Structured Streaming endpoints (snapshot-incremental
  * source offsets, exactly-once micro-batch sink). */
class GraftStreamSpec extends SparkSpec {

  private def idVal = GraftSchema.of("id" -> LongType, "val" -> LongType)

  private def rows(from: Long, to: Long) =
    spark.range(from, to).toDF("id").withColumn("val", col("id") * 2)

  test("appends mode: initial state, live appends, rewrites invisible") {
    val wh = Files.createTempDirectory("graft-stream").toString
    val g = new GraftTableGenerator(spark, wh, "src_t")
    g.create(idVal, Nil)
      .appendData(rows(0, 100)).commit()
      .appendData(rows(100, 200)).commit()
    val in = spark.readStream.format("graft")
      .option("maxSnapshotsPerBatch", "1").load(s"$wh/src_t")
    val sq = in.writeStream.format("memory").queryName("graft_app_sink")
      .option("checkpointLocation", s"$wh/ckpt")
      .outputMode("append").start()
    try {
      sq.processAllAvailable()
      assert(spark.table("graft_app_sink").count() == 200L)
      // a live append streams through as one delta batch
      g.appendData(rows(200, 250)).commit()
      sq.processAllAvailable()
      val ids = spark.table("graft_app_sink").select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (0L until 250L))
      // compaction is a rewrite — consumers must see NOTHING
      g.compact().commit()
      sq.processAllAvailable()
      assert(spark.table("graft_app_sink").count() == 250L)
    } finally sq.stop()
  }

  test("changelog mode: deletes arrive as change rows") {
    val wh = Files.createTempDirectory("graft-stream-cdc").toString
    val g = new GraftTableGenerator(spark, wh, "cdc_t")
    g.create(idVal, Nil).appendData(rows(0, 50)).commit()
    g.positionalDelete(col("id") < 10).commit()
    val in = spark.readStream.format("graft")
      .option("mode", "changelog")
      .option("maxSnapshotsPerBatch", "1").load(s"$wh/cdc_t")
    val sq = in.writeStream.format("memory").queryName("graft_cdc_sink")
      .option("checkpointLocation", s"$wh/ckpt")
      .outputMode("append").start()
    try {
      sq.processAllAvailable()
      val byKind = spark.table("graft_cdc_sink").groupBy("change_kind")
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byKind == Map("insert" -> 50L, "delete" -> 10L))
    } finally sq.stop()
  }

  test("maxRowsPerBatch / maxFilesPerBatch: backlog drains in bounded batches") {
    val wh = Files.createTempDirectory("graft-stream-rate").toString
    val g = new GraftTableGenerator(spark, wh, "rate_t")
    g.create(idVal, Nil)
      .appendData(rows(0, 100)).commit()   // 1 file, 100 rows
      .appendData(rows(100, 200)).commit() // 1 file, 100 rows
      .appendData(rows(200, 260)).commit() // 1 file, 60 rows
    // rows cap: unit-drive the offset protocol like the engine would
    // (delivered CONTENT per batch is gated end-to-end by the
    // stream_graft_ratelimit key's oracle)
    val src = new graft.streaming.GraftSource(spark, s"$wh/rate_t",
      "appends", 0L, 0L, maxRowsPerBatch = 150L)
    // 100 + 100 > 150 → one snapshot per offer until the backlog drains
    assert(src.getOffset.get.json().toLong == 1L)
    assert(src.getOffset.get.json().toLong == 2L)
    assert(src.getOffset.get.json().toLong == 3L)
    // drained: the offered offset stops advancing
    assert(src.getOffset.get.json().toLong == 3L)
    // files cap of 2: snapshots pair up (1+1 files, then the last)
    val srcF = new graft.streaming.GraftSource(spark, s"$wh/rate_t",
      "appends", 0L, 0L, maxFilesPerBatch = 2L)
    assert(srcF.getOffset.get.json().toLong == 2L)
    assert(srcF.getOffset.get.json().toLong == 3L)
    // a single snapshot BIGGER than the cap still advances (no stall)
    val srcTiny = new graft.streaming.GraftSource(spark, s"$wh/rate_t",
      "appends", 0L, 0L, maxRowsPerBatch = 10L)
    assert(srcTiny.getOffset.get.json().toLong == 1L)
  }

  test("startSnapshotId: consumption begins after the given snapshot") {
    val wh = Files.createTempDirectory("graft-stream-start").toString
    val g = new GraftTableGenerator(spark, wh, "start_t")
    g.create(idVal, Nil)
      .appendData(rows(0, 100)).commit()   // snapshot 1 — skipped
      .appendData(rows(100, 150)).commit() // snapshot 2 — delivered
    val sq = spark.readStream.format("graft")
      .option("startSnapshotId", "1").load(s"$wh/start_t")
      .writeStream.format("memory").queryName("graft_start_sink")
      .option("checkpointLocation", s"$wh/ckpt")
      .outputMode("append").start()
    try {
      sq.processAllAvailable()
      val ids = spark.table("graft_start_sink").select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (100L until 150L),
        s"only snapshot 2's appends must stream, got ${ids.size} rows")
    } finally sq.stop()
  }

  test("graft-to-graft replication: stream a table into another table") {
    val wh = Files.createTempDirectory("graft-stream-repl").toString
    val g = new GraftTableGenerator(spark, wh, "repl_src")
    g.create(idVal, Nil)
      .appendData(rows(0, 100)).commit()
      .appendData(rows(100, 150)).commit()
    new GraftTableGenerator(spark, wh, "repl_dst").create(idVal, Nil)
    val sq = spark.readStream.format("graft").load(s"$wh/repl_src")
      .writeStream.format("graft")
      .option("path", s"$wh/repl_dst")
      .option("checkpointLocation", s"$wh/ckpt")
      .outputMode("append").start()
    try {
      sq.processAllAvailable()
      val dst = MorReader.read(spark, s"$wh/repl_dst")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(dst == (0L until 150L))
      // incremental: one more source commit flows through
      g.appendData(rows(150, 170)).commit()
      sq.processAllAvailable()
      assert(MorReader.read(spark, s"$wh/repl_dst").count() == 170L)
    } finally sq.stop()
  }

  test("sink gate is atomic with the commit: a replayed batch never double-appends") {
    val wh = Files.createTempDirectory("graft-sink-gate").toString
    new GraftTableGenerator(spark, wh, "gate_t").create(idVal, Nil)
    val sink = new graft.streaming.GraftSink(spark, s"$wh/gate_t")
    sink.addBatch(0, rows(0, 50))
    // a crash AFTER the commit but before any separate gate write replays
    // the batch on restart — the batch id rode the snapshot summary, so
    // the replay is recognized no matter where the crash fell
    sink.addBatch(0, rows(0, 50))
    assert(MorReader.read(spark, s"$wh/gate_t").count() == 50L,
      "replayed batch must be skipped (no duplicate append)")
    sink.addBatch(1, rows(50, 80))
    assert(MorReader.read(spark, s"$wh/gate_t").count() == 80L)
    // the gate lives in the snapshot summaries, keyed by query id
    val gates = graft.meta.SnapshotLog(s"$wh/gate_t").summaries()
      .flatMap(_._3.get("graft.sink.batch.default"))
    assert(gates.toSet == Set("0", "1"))
  }

  test("Trigger.AvailableNow drains the latched backlog and terminates") {
    // v1-source AvailableNow semantics: Spark's wrapper latches ONE
    // getOffset at start and runs to it — so the full backlog drains in
    // one batch and the query stops. (Per-batch rate caps would latch the
    // first CAPPED offset instead — don't combine them with AvailableNow
    // on this endpoint; the scaladoc documents it.)
    val wh = Files.createTempDirectory("graft-avnow").toString
    val g = new GraftTableGenerator(spark, wh, "av_t")
    g.create(idVal, Nil)
      .appendData(rows(0, 100)).commit()
      .appendData(rows(100, 200)).commit()
      .appendData(rows(200, 260)).commit()
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    def drain(): Boolean = {
      val sq = spark.readStream.format("graft").load(s"$wh/av_t")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(df.count()); ()
        }
        .option("checkpointLocation", s"$wh/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append").start()
      sq.awaitTermination(120000)
    }
    assert(drain(), "AvailableNow query must terminate after the drain")
    assert(seen.get() == 260L)
    // a commit AFTER termination is not consumed (AvailableNow semantics);
    // a restart from the same checkpoint picks up exactly the delta
    g.appendData(rows(260, 300)).commit()
    assert(drain(), "restarted AvailableNow query must terminate")
    assert(seen.get() == 300L, s"restart must deliver only the delta, saw $seen")
  }

  test("sink writeMode=upsert: keyed replace-or-insert per batch, replay-safe") {
    val wh = Files.createTempDirectory("graft-sink-ups").toString
    new GraftTableGenerator(spark, wh, "ups_t").create(idVal, Nil)
    val sink = new graft.streaming.GraftSink(spark, s"$wh/ups_t",
      "upsert", Seq("id"))
    sink.addBatch(0, rows(0, 100))
    // batch 1 updates 40..59 (val = 5·id) and inserts 100..109
    sink.addBatch(1, spark.range(40, 60).toDF("id")
      .withColumn("val", col("id") * 5)
      .union(rows(100, 110)))
    sink.addBatch(1, rows(0, 10)) // replayed id — must be skipped
    val df = MorReader.read(spark, s"$wh/ups_t")
    assert(df.count() == 110L)
    assert(df.where(col("id") === 45L).collect()(0)
      .getAs[Long]("val") == 225L)
    assert(df.where(col("id") === 5L).collect()(0)
      .getAs[Long]("val") == 10L, "replay must not have reset val")
  }

  test("sink writeMode=cdc: net change batches apply as upsert + key delete") {
    val wh = Files.createTempDirectory("graft-sink-cdc").toString
    new GraftTableGenerator(spark, wh, "cdc_t").create(idVal, Nil)
    val sink = new graft.streaming.GraftSink(spark, s"$wh/cdc_t",
      "cdc", Seq("id"))
    def ch(kind: String, df: org.apache.spark.sql.DataFrame) =
      df.select(lit(kind).as("change_kind"), col("id"), col("val"))
    sink.addBatch(0, ch("insert", rows(0, 100)))
    // one net window: key 7 updated (delete+insert), keys 90..99 deleted
    sink.addBatch(1,
      ch("delete", rows(7, 8)).union(
        ch("insert", spark.range(7, 8).toDF("id")
          .withColumn("val", col("id") * 9))).union(
        ch("delete", rows(90, 100))))
    val df = MorReader.read(spark, s"$wh/cdc_t")
    assert(df.count() == 90L)
    assert(df.where(col("id") === 7L).collect()(0).getAs[Long]("val") == 63L)
    assert(df.where(col("id") >= 90L).count() == 0L)
    // replay of an applied change batch is a no-op
    sink.addBatch(1, ch("delete", rows(0, 50)))
    assert(MorReader.read(spark, s"$wh/cdc_t").count() == 90L)
    // an all-empty net batch commits nothing and breaks nothing
    sink.addBatch(2, ch("insert", rows(0, 0)))
    assert(MorReader.read(spark, s"$wh/cdc_t").count() == 90L)
  }
}
