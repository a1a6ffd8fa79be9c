package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.meta.SnapshotLog
import graft.read.MorReader
import graft.schema.GraftSchema
import graft.table.GraftTableGenerator

/** Streaming at ingest scale: one MILLION rows of CDC flow through the
  * changelog source → cdc sink pipeline (the `stream_graft_apply_cdc`
  * shape) in 8 snapshot windows — with a KILL injected mid-stream and a
  * restart from the same checkpoint. Asserts
  *   - exactly-once: the replica equals the source's final MoR state
  *     (count + two content sums), and every sink-gate batch id landed
  *     exactly once across BOTH query incarnations;
  *   - shape: one equality-delete file + one appended data file per
  *     non-empty applied batch (the r10 floor fix, now proven at scale);
  *   - wall budget on the streaming apply itself (both incarnations,
  *     excluding fixture generation).
  *
  * `SPARK_GRAFT_STREAM_N` shrinks the row count for local iteration;
  * the default is the full 1,000,000 across 8 windows.
  */
class StreamScaleSpec extends SparkSpec {

  private val n: Long = sys.env.get("SPARK_GRAFT_STREAM_N").map(_.toLong)
    .getOrElse(1000000L)
  private val windows = 8
  private val perWindow = n / windows
  private val wallBudgetSec =
    sys.env.get("SPARK_GRAFT_STREAM_BUDGET").map(_.toDouble).getOrElse(90.0)

  private def idVal = GraftSchema.of("id" -> LongType, "val" -> LongType)

  test(s"apply_cdc at $n rows / $windows windows: exactly-once across an " +
      "injected mid-stream restart, 1 delete file + 1 append per batch") {
    val tmp = Files.createTempDirectory("graft-stream-scale").toString
    val src = new GraftTableGenerator(spark, tmp, "src").create(idVal, Nil)
    // 8 one-snapshot windows: each appends its id range; windows 3 and 5
    // also DELETE a 10k slice of an earlier window in the same snapshot,
    // so the changelog carries real delete events, not just inserts
    for (w <- 0 until windows) {
      if (w == 3) src.deleteKeys(
        spark.range(0, 10000).toDF("id"), Seq("id"))
      if (w == 5) src.deleteKeys(
        spark.range(perWindow, perWindow + 10000).toDF("id"), Seq("id"))
      src.appendBulk(spark.range(w * perWindow, (w + 1) * perWindow)
        .toDF("id").withColumn("val", col("id") * 2), 4)
      src.commit()
    }
    val dst = s"$tmp/dst"
    new GraftTableGenerator(spark, tmp, "dst").create(idVal, Nil)

    def startQuery() = spark.readStream.format("graft")
      .option("mode", "changelog").option("maxSnapshotsPerBatch", "1")
      .load(s"$tmp/src")
      .writeStream.format("graft")
      .option("path", dst)
      .option("writeMode", "cdc").option("upsertKeys", "id")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()

    def appliedBatches: Seq[Long] = SnapshotLog(dst).summaries()
      .flatMap(_._3.collect {
        case (k, v) if k.startsWith("graft.sink.batch.") => v.toLong
      })

    val t0 = System.nanoTime()
    // incarnation 1: let SOME batches land, then kill mid-stream
    val sq1 = startQuery()
    try {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (appliedBatches.size < 3 && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally sq1.stop()
    val afterKill = appliedBatches
    assert(afterKill.nonEmpty, "no batch landed before the injected kill")
    assert(afterKill.size < windows,
      s"kill landed too late to exercise the restart (${afterKill.size})")
    // incarnation 2: same checkpoint — drains the rest exactly once
    val sq2 = startQuery()
    try sq2.processAllAvailable() finally sq2.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9

    // exactly-once: every gate batch id unique (a replayed batch after
    // the restart must be skipped by the snapshot-summary gate)
    val batches = appliedBatches
    assert(batches.distinct.size == batches.size,
      s"a batch landed twice across the restart: ${batches.sorted}")
    // replica == source final state (content, not just count)
    val want = MorReader.read(spark, s"$tmp/src")
      .agg(count(lit(1)), sum("id"), sum("val")).head()
    val got = MorReader.read(spark, dst)
      .agg(count(lit(1)), sum("id"), sum("val")).head()
    assert(got == want, s"replica $got != source $want")
    assert(want.getLong(0) == n - 20000, s"fixture drift: ${want.getLong(0)}")
    // shape: per applied batch, at most 1 eq-delete file + 1 data file
    // (the r10 one-delete-file-per-batch floor, held at scale)
    val st = SnapshotLog(dst).load()
    val perSnap = st.snapshots.filter(_.summary.keys.exists(
      _.startsWith("graft.sink.batch.")))
    perSnap.foreach { s =>
      assert(s.deleteFiles.count(_.kind == "eq") <= 1 &&
        s.dataFiles.size <= 1,
        s"batch snapshot ${s.id} wrote ${s.deleteFiles.size} delete / " +
          s"${s.dataFiles.size} data files — the per-batch floor regressed")
    }
    assert(wallSec < wallBudgetSec,
      f"streaming apply took $wallSec%.1f s (budget $wallBudgetSec%.0f s)")
    info(f"apply_cdc scale: $n rows, ${batches.size} batches " +
      f"(${afterKill.size} pre-kill), $wallSec%.1f s")
  }
}
