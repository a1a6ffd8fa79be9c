package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.read.MorReader
import graft.schema.GraftSchema
import graft.table.GraftTableGenerator

/** Declared keys for the graft STREAMING endpoints
  * (`spark.readStream.format("graft")` — snapshot-incremental source;
  * `writeStream.format("graft")` — exactly-once table sink): the Iceberg
  * streaming-read/write shape driven to completion under the DuckDB
  * oracle. Source tables are built once per JVM from exact integer
  * ranges; each run replays the stream from a FRESH checkpoint, so the
  * delivered corpus is deterministic (append-mode delivery is
  * exactly-once per checkpoint by construction). */
object StreamTableQueries {

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private lazy val wh: String =
    Files.createTempDirectory("graft-stream-q").toString

  private def idVal = GraftSchema.of("id" -> LongType, "val" -> LongType)

  private def rows(s: SparkSession, from: Long, to: Long): DataFrame =
    s.range(from, to).toDF("id").withColumn("val", col("id") * 2)

  /** 3 append snapshots (0..99, 100..199, 200..259) + a compaction the
    * stream must NOT re-deliver. */
  private def srcT(s: SparkSession): String = {
    built.computeIfAbsent("src_t", _ => {
      val g = new GraftTableGenerator(s, wh, "src_t")
      g.create(idVal, Nil)
        .appendData(rows(s, 0, 100)).commit()
        .appendData(rows(s, 100, 200)).commit()
        .appendData(rows(s, 200, 260)).commit()
      g.compact().commit()
      "src_t"
    })
    s"$wh/src_t"
  }

  /** append 0..99, positional delete id%10=3, append 100..149. */
  private def cdcT(s: SparkSession): String = {
    built.computeIfAbsent("cdc_t", _ => {
      val g = new GraftTableGenerator(s, wh, "cdc_t")
      g.create(idVal, Nil).appendData(rows(s, 0, 100)).commit()
      g.positionalDelete(col("id") % 10 === 3).commit()
      g.appendData(rows(s, 100, 150)).commit()
      "cdc_t"
    })
    s"$wh/cdc_t"
  }

  /** CDC-apply source: append 0..99, UPDATE ids 40..59 (upsert, val=5·id),
    * positional delete id%10=3, append 100..149 — inserts, an update
    * (arriving as delete+insert of one key in one window) and pure
    * deletes, each in its own snapshot. */
  private def cdcUpdT(s: SparkSession): String = {
    built.computeIfAbsent("cdcu_t", _ => {
      val g = new GraftTableGenerator(s, wh, "cdcu_t")
      g.create(idVal, Nil).appendData(rows(s, 0, 100)).commit()
      g.upsert(s.range(40, 60).toDF("id").withColumn("val", col("id") * 5),
        Seq("id")).commit()
      g.positionalDelete(col("id") % 10 === 3).commit()
      g.appendData(rows(s, 100, 150)).commit()
      "cdcu_t"
    })
    s"$wh/cdcu_t"
  }

  /** Drain a graft-source stream into a memory sink, fresh checkpoint. */
  private def drain(s: SparkSession, dir: String, sinkName: String,
                    mode: String): Unit = {
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val sq = s.readStream.format("graft")
      .option("mode", mode)
      .option("maxSnapshotsPerBatch", "1").load(dir)
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try sq.processAllAvailable() finally sq.stop()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // snapshot-incremental append consumption: one micro-batch per commit,
    // rewrites skipped — the drained corpus is exactly the table
    "stream_graft_source" -> ((s, _) => {
      drain(s, srcT(s), "graft_source_sink", "appends")
      s.table("graft_source_sink")
        .agg(count(lit(1)).as("n"), sum("id").as("id_sum"),
          sum("val").as("val_sum"))
    }),

    // row-level CDC consumption: the delete commit arrives as change rows
    "stream_graft_cdc" -> ((s, _) => {
      drain(s, cdcT(s), "graft_cdc_sink", "changelog")
      s.table("graft_cdc_sink")
        .groupBy("change_kind")
        .agg(count(lit(1)).as("n"), sum("id").as("id_sum"))
        .orderBy("change_kind")
    }),

    // rate-limited catch-up (Iceberg max-rows-per-micro-batch parity):
    // maxRowsPerBatch=100 splits the 260-row backlog into bounded
    // micro-batches along snapshot edges — 100, 100, 60 — instead of one
    // giant catch-up batch; the compaction snapshot costs (and delivers)
    // nothing. batch_seq numbers the NON-EMPTY batches in delivery order.
    "stream_graft_ratelimit" -> ((s, _) => {
      val src = srcT(s)
      val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
      val counts = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
      val sq = s.readStream.format("graft")
        .option("maxRowsPerBatch", "100").load(src)
        .writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          val r = df.agg(count(lit(1)),
            coalesce(sum("id"), lit(0L))).collect()(0)
          counts.put(id, (r.getLong(0), r.getLong(1)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try sq.processAllAvailable() finally sq.stop()
      import scala.jdk.CollectionConverters._
      val delivered = counts.asScala.toSeq.filter(_._2._1 > 0).sortBy(_._1)
        .zipWithIndex.map { case ((_, (n, sm)), i) => (i.toLong, n, sm) }
      import s.implicits._
      delivered.toDF("batch_seq", "n", "id_sum").orderBy("batch_seq")
    }),

    // graft → graft CDC replication: the changelog stream (net per-window
    // diffs) applied through the sink's writeMode=cdc — per batch, ONE
    // equality-delete file covering every touched key + one appended data
    // file, in one exactly-once snapshot; the replica's MoR read must
    // equal the source's final state including the update and the deletes.
    // Two snapshot windows per batch (the r9 floor analysis,
    // tools/CdcFloorProbe: micro-batch machinery alone costs ~0.4 s/batch
    // with a NOOP sink, so batch count — not sink work — set the old 4-
    // batch key's wall time; per-commit batching is spec-covered in
    // GraftStreamSpec).
    "stream_graft_apply_cdc" -> ((s, _) => {
      val src = cdcUpdT(s)
      val tmp = Files.createTempDirectory("graft-cdc-apply").toString
      new GraftTableGenerator(s, tmp, "dst").create(idVal, Nil)
      val sq = s.readStream.format("graft")
        .option("mode", "changelog").option("maxSnapshotsPerBatch", "2")
        .load(src)
        .writeStream.format("graft")
        .option("path", s"$tmp/dst")
        .option("writeMode", "cdc").option("upsertKeys", "id")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
      try sq.processAllAvailable() finally sq.stop()
      MorReader.read(s, s"$tmp/dst")
        .agg(count(lit(1)).as("n"), sum("id").as("id_sum"),
          sum("val").as("val_sum"))
    }),

    // graft → graft: stream one table into another through the
    // exactly-once sink; the replica must read as the source
    "stream_graft_replicate" -> ((s, _) => {
      val src = srcT(s)
      val tmp = Files.createTempDirectory("graft-repl").toString
      new GraftTableGenerator(s, tmp, "dst").create(idVal, Nil)
      val sq = s.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .option("path", s"$tmp/dst")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
      try sq.processAllAvailable() finally sq.stop()
      MorReader.read(s, s"$tmp/dst")
        .agg(count(lit(1)).as("n"), sum("id").as("id_sum"),
          sum("val").as("val_sum"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "stream_graft_source" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(range) AS BIGINT) AS id_sum,
        |       CAST(SUM(range * 2) AS BIGINT) AS val_sum
        |FROM range(0, 260)""".stripMargin,

    // inserts: initial 100 + appended 50; deletes: ids 3,13,...,93
    "stream_graft_cdc" ->
      """SELECT * FROM (
        |  SELECT 'delete' AS change_kind, CAST(10 AS BIGINT) AS n,
        |         CAST(SUM(range) AS BIGINT) AS id_sum
        |  FROM range(0, 100) WHERE range % 10 = 3
        |  UNION ALL
        |  SELECT 'insert', CAST(150 AS BIGINT), CAST(SUM(range) AS BIGINT)
        |  FROM range(0, 150)
        |) ORDER BY change_kind""".stripMargin,

    "stream_graft_replicate" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(range) AS BIGINT) AS id_sum,
        |       CAST(SUM(range * 2) AS BIGINT) AS val_sum
        |FROM range(0, 260)""".stripMargin,

    // final state: ids 0..149 minus {3,13,...,93}; val = 5·id on the
    // surviving updated band 40..59, else 2·id
    "stream_graft_apply_cdc" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(SUM(CASE WHEN id BETWEEN 40 AND 59 THEN id * 5
        |                     ELSE id * 2 END) AS BIGINT) AS val_sum
        |FROM range(0, 150) t(id) WHERE NOT (id % 10 = 3 AND id < 100)""".stripMargin,

    // snapshot-edge batches under maxRowsPerBatch=100: 0..99, 100..199,
    // 200..259 — id sums 4950, 14950, 13770
    "stream_graft_ratelimit" ->
      """SELECT CAST(batch_seq AS BIGINT) AS batch_seq, CAST(n AS BIGINT) AS n,
        |       CAST(id_sum AS BIGINT) AS id_sum
        |FROM (VALUES (0, 100, 4950), (1, 100, 14950), (2, 60, 13770))
        |  AS t(batch_seq, n, id_sum)
        |ORDER BY batch_seq""".stripMargin
  )
}
