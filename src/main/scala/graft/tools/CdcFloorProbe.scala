package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.read.MorReader
import graft.schema.GraftSchema
import graft.table.GraftTableGenerator

/** Decomposes `stream_graft_apply_cdc`'s wall time (VERDICT r9 task 8:
  * 3.5-4.3 s for 4 micro-batches — the slowest declared key; is that the
  * exactly-once gate, the per-batch sink work, or irreducible Structured
  * Streaming state machinery?). Measures min-of-N for:
  *
  *   a. noop drain     — same changelog source, 4 batches, foreachBatch{}
  *   b. declared shape — cdc sink, maxSnapshotsPerBatch=1 (4 batches)
  *   c. one catch-up   — cdc sink, no snapshot cap (1 net batch)
  *   d. dst create     — the per-run fixture cost inside the timed key
  *
  * (b - a) is the sink's cost; (a) is the source+streaming floor; (b - c)
  * is the price of per-commit batching. Results land in COVERAGE.md.
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=5 sbt "runMain graft.tools.CdcFloorProbe"
  */
object CdcFloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val idVal = GraftSchema.of("id" -> LongType, "val" -> LongType)
    def rows(from: Long, to: Long): DataFrame =
      spark.range(from, to).toDF("id").withColumn("val", col("id") * 2)

    // the stream_graft_apply_cdc fixture: 4 commits (append, upsert,
    // delete, append)
    val wh = Files.createTempDirectory("graft-cdcfloor").toString
    val g = new GraftTableGenerator(spark, wh, "src")
    g.create(idVal, Nil).appendData(rows(0, 100)).commit()
    g.upsert(spark.range(40, 60).toDF("id").withColumn("val", col("id") * 5),
      Seq("id")).commit()
    g.positionalDelete(col("id") % 10 === 3).commit()
    g.appendData(rows(100, 150)).commit()
    val src = s"$wh/src"

    def time(label: String)(body: => Unit): Unit = {
      body // warm-up
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"CDCFLOOR $label%-22s min=${times.min}%6.3f  " +
        f"med=${times.sorted.apply(reps / 2)}%6.3f  max=${times.max}%6.3f")
    }

    def freshDst(): String = {
      val tmp = Files.createTempDirectory("graft-cdcfloor-dst").toString
      new GraftTableGenerator(spark, tmp, "dst").create(idVal, Nil)
      tmp
    }

    time("dst_create") { freshDst() }

    time("noop_drain_4batches") {
      val ckpt = Files.createTempDirectory("graft-cdcfloor-ck").toString
      val sq = spark.readStream.format("graft")
        .option("mode", "changelog").option("maxSnapshotsPerBatch", "1")
        .load(src)
        .writeStream.foreachBatch((_: DataFrame, _: Long) => ())
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try sq.processAllAvailable() finally sq.stop()
    }

    def applyCdc(cap: Option[Int]): Unit = {
      val tmp = freshDst()
      val reader0 = spark.readStream.format("graft").option("mode", "changelog")
      val reader = cap.fold(reader0)(c =>
        reader0.option("maxSnapshotsPerBatch", c.toString))
      val sq = reader.load(src)
        .writeStream.format("graft")
        .option("path", s"$tmp/dst")
        .option("writeMode", "cdc").option("upsertKeys", "id")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
      try sq.processAllAvailable() finally sq.stop()
      require(MorReader.read(spark, s"$tmp/dst").count() == 140L)
    }

    time("declared_4batches") { applyCdc(Some(1)) }
    time("one_catchup_batch") { applyCdc(None) }

    spark.stop()
  }
}
