package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.gen.Bundles
import graft.scenarios.Scenarios
import graft.streaming.{EventPipeline, EventSessions}
import graft.streaming.EventSessions.Ev

class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def eventRows(): Array[Ev] = {
    graft.queries.Q.events(spark, dir)
      .select(col("user_id"), col("_us").as("us"))
      .collect().map(r => Ev(r.getLong(0), r.getLong(1)))
  }

  /** Batch reference with the same µs-strict-> gap rule as EventSessions. */
  private def batchSummaries(gapSec: Long): Map[Long, (Long, Long)] = {
    val w = Window.partitionBy("user_id").orderBy("us")
    graft.queries.Q.events(spark, dir)
      .select(col("user_id"), col("_us").as("us"))
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

  test("file-source pipeline: readStream → watermark window → parquet sink == batch") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("pipeline")
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")

    val events = graft.queries.Q.events(spark, dir)
      .select(col("event_id"), col("_ts").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy("ts").cache()
    val n = events.count()
    // land the events as 3 input files in time order, plus a far-future
    // sentinel file that advances the watermark past every real window
    Files.createDirectories(java.nio.file.Paths.get(in))
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("land")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator()
      while (part.hasNext) {
        val p = part.next()
        if (p.toString.endsWith(".parquet"))
          Files.move(p, java.nio.file.Paths.get(in, s"$name.parquet"))
      }
    }
    val chunks = events.collect().grouped((n / 3 + 1).toInt).toSeq
    chunks.zipWithIndex.foreach { case (rows, i) =>
      land(spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1),
        events.schema), s"chunk$i")
    }
    // far-future sentinel advances the watermark past every real window
    land(events.limit(1)
      .withColumn("ts", col("ts") + expr("interval 365 days"))
      .withColumn("event_type", lit("__sentinel__")), "zz_sentinel")

    val sq = EventPipeline.start(spark, in, out, ckpt)
    try sq.processAllAvailable() finally sq.stop()

    val streamed = spark.read.parquet(out)
      .where(col("event_type") =!= "__sentinel__")
      .select("hour_start", "event_type", "cnt", "value_cents")
      .collect().map(_.toString).sorted.toSeq
    val batch = EventPipeline.windowedCounts(events).collect()
      .map(_.toString).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup: re-deliveries within the watermark drop; state bounded") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val base = graft.queries.Q.events(spark, dir)
      .select(col("event_id"), col("_us").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toSeq
    val stream = MemoryStream[(Long, Long)]
    val df = stream.toDS().toDF("event_id", "us")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"))
    val out = graft.streaming.EventDedup.dedup(df, Seq("event_id"), "1 hour")
    val sq = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = base.splitAt(base.length / 2)
      // batch 1: first half, each event delivered TWICE (in-batch dup)
      stream.addData(a ++ a); sq.processAllAvailable()
      // batch 2: second half + re-delivery of the first half's tail
      // (cross-batch dup within the watermark delay)
      stream.addData(b ++ a.takeRight(50)); sq.processAllAvailable()
      // advance the watermark far past everything so all rows emit
      val lastUs = base.last._2
      stream.addData(Seq((-1L, lastUs + 100L * 3600L * 1000000L)))
      sq.processAllAvailable()
      val got = spark.sql("select event_id from dedup_out where event_id >= 0")
        .collect().map(_.getLong(0)).sorted
      // every duplicate delivery dropped: exactly one row per event id
      assert(got.toSeq == base.map(_._1).sorted)
    } finally sq.stop()
  }

  test("stream-stream interval join == batch join (clicks→purchase attribution)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ev = graft.queries.Q.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("_us").as("us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._3).toSeq
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toSeq

    val pStream = MemoryStream[(Long, Long, Long)]
    val cStream = MemoryStream[(Long, Long)]
    val pDf = pStream.toDS().toDF("event_id", "user_id", "p_us")
      .select(col("event_id"), col("user_id"), expr("timestamp_micros(p_us)").as("p_ts"))
    val cDf = cStream.toDS().toDF("c_user", "c_us")
      .select(col("c_user"), expr("timestamp_micros(c_us)").as("c_ts"))
    val out = graft.streaming.EventJoin.purchasesWithClicks(pDf, cDf, windowSec = 1800)
    val sq = out.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      // interleave both sides across two batches — pairs must match across
      // the batch boundary via buffered state
      val (p1, p2) = purchases.splitAt(purchases.length / 2)
      val (c1, c2) = clicks.splitAt(clicks.length / 2)
      pStream.addData(p1); cStream.addData(c1); sq.processAllAvailable()
      pStream.addData(p2); cStream.addData(c2); sq.processAllAvailable()
      val streamed = spark.sql("select event_id, user_id, p_ts, c_ts from ssjoin")
        .collect().map(_.toString).sorted.toSeq
      // batch reference: same join on static frames
      val pB = purchases.toDF("event_id", "user_id", "p_us")
        .select(col("event_id"), col("user_id"), expr("timestamp_micros(p_us)").as("p_ts"))
      val cB = clicks.toDF("c_user", "c_us")
        .select(col("c_user"), expr("timestamp_micros(c_us)").as("c_ts"))
      val batch = pB.join(cB,
          expr("user_id = c_user AND c_ts BETWEEN p_ts - INTERVAL 1800 SECONDS AND p_ts"))
        .select(col("event_id"), col("user_id"), col("p_ts"), col("c_ts"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally sq.stop()
  }

  test("foreachBatch upsert sink: one snapshot per batch, key-unique live rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val wh = java.nio.file.Files.createTempDirectory("stream-upsert").toString
    val g = new graft.table.GraftTableGenerator(spark, wh, "stream_upsert")
    g.create(graft.schema.GraftSchema.of(
      "k" -> IntegerType, "v" -> StringType, "ver" -> IntegerType), Nil)
    val stream = MemoryStream[(Int, String, Int)]
    val sq = graft.streaming.EventUpsert.start(
      stream.toDS().toDF("k", "v", "ver"), g, Seq("k"), "ver",
      java.nio.file.Files.createTempDirectory("upsert-ckpt").toString)
    try {
      // batch 1 carries TWO versions of k=1 — must collapse to ver 2
      stream.addData((1, "a", 1), (2, "b", 1), (1, "a2", 2))
      sq.processAllAvailable()
      // batch 2 replaces k=2, inserts k=3
      stream.addData((2, "c", 3), (3, "d", 1))
      sq.processAllAvailable()
      val live = g.read.collect()
        .map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
      assert(live == Map(1 -> ("a2", 2), 2 -> ("c", 3), 3 -> ("d", 1)))
      // one snapshot per micro-batch; time travel sees batch-1 state
      val st = graft.meta.SnapshotLog(g.tableDir.toString).load()
      assert(st.snapshots.size == 2)
      val atBatch1 = graft.read.MorReader
        .readAt(spark, g.tableDir.toString, st.snapshots.head.id)
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(atBatch1 == Map(1 -> "a2", 2 -> "b"))
    } finally sq.stop()
  }

  test("streaming WAP: micro-batches land on a branch; audit gates the fast-forward") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.types.IntegerType
    val wh = java.nio.file.Files.createTempDirectory("stream-wap").toString
    val g = new graft.table.GraftTableGenerator(spark, wh, "stream_wap")
    g.create(graft.schema.GraftSchema.of("k" -> IntegerType), Nil)
    g.appendData(Seq(0).toDF("k")).commit()
    g.createBranch("ingest")
    g.writeTo("ingest")
    val stream = MemoryStream[Int]
    val sq = stream.toDS().toDF("k").writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("wap-ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        g.appendData(batch).commit(); ()
      }.start()
    try {
      stream.addData(1, 2, 3); sq.processAllAvailable()
      stream.addData(4, 5); sq.processAllAvailable()
      // pre-publication: main serves only the pre-stream state
      assert(graft.read.MorReader.read(spark, g.tableDir.toString).count() == 1L)
      // audit the BRANCH (row count + key uniqueness), then publish
      val staged = g.readBranch("ingest")
      assert(staged.count() == 6L)
      assert(staged.select("k").distinct().count() == 6L)
      g.writeTo("main").fastForward("ingest")
      assert(g.read.collect().map(_.getInt(0)).sorted.toSeq == (0 to 5))
      // the audit window is snapshot-per-batch: time travel still works
      val st = graft.meta.SnapshotLog(g.tableDir.toString).load()
      assert(st.snapshots.size == 3) // base + 2 published micro-batches
    } finally sq.stop()
  }

  test("foreachBatch CDC merge sink: version-gated apply; late old changes and replays are no-ops") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val wh = java.nio.file.Files.createTempDirectory("stream-merge").toString
    val g = new graft.table.GraftTableGenerator(spark, wh, "stream_merge")
    g.create(graft.schema.GraftSchema.of(
      "k" -> IntegerType, "v" -> StringType, "ver" -> IntegerType), Nil)
    val stream = MemoryStream[(Int, String, Int, String)]
    val sq = graft.streaming.EventMerge.start(
      stream.toDS().toDF("k", "v", "ver", "op"), g, Seq("k"), "ver", "op",
      java.nio.file.Files.createTempDirectory("merge-ckpt").toString)
    try {
      // batch 1: inserts; k=1 carries two versions → collapses to ver 2
      stream.addData((1, "a", 1, "U"), (1, "a2", 2, "U"),
        (2, "b", 1, "U"), (3, "c", 1, "U"))
      sq.processAllAvailable()
      // batch 2: delete k=2; update k=3; LATE OLDER update of k=1 must be
      // ignored; delete of an absent key is a no-op, not an insert
      stream.addData((2, "x", 5, "D"), (3, "c2", 2, "U"),
        (1, "late", 1, "U"), (9, "z", 1, "D"))
      sq.processAllAvailable()
      // batch 3: REPLAY of batch 2's effective changes — version gates
      // make the whole batch a row-level no-op
      stream.addData((2, "x", 5, "D"), (3, "c2", 2, "U"))
      sq.processAllAvailable()
      val live = g.read.collect()
        .map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
      assert(live == Map(1 -> ("a2", 2), 3 -> ("c2", 2)))
      // a late old DELETE (ver 1 < table ver 2) must not kill the row
      stream.addData((3, "junk", 1, "D"))
      sq.processAllAvailable()
      assert(g.read.where(col("k") === 3).count() == 1)
      assert(g.read.count() == 2)
    } finally sq.stop()
  }

  test("upsert per-batch collapse breaks version ties deterministically") {
    import spark.implicits._
    // two rows tie on (k=1, ver=1) — the winner must be the same on every
    // evaluation (replay safety), decided by the remaining columns
    val batch = Seq((1, "a", 1), (1, "b", 1), (2, "x", 2)).toDF("k", "v", "ver")
    def run() = graft.streaming.EventUpsert.latestPerKey(batch, Seq("k"), "ver")
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    val first = run()
    assert(first == Map(1 -> ("b", 1), 2 -> ("x", 2))) // lexicographically greatest row
    assert((1 to 5).forall(_ => run() == first))
  }

  test("maintenance writer races the streaming ingester: conflicts refresh + re-stage") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val wh = java.nio.file.Files.createTempDirectory("stream-race").toString
    val g = new graft.table.GraftTableGenerator(spark, wh, "stream_race")
    g.create(graft.schema.GraftSchema.of(
      "k" -> IntegerType, "v" -> StringType, "ver" -> IntegerType), Nil)
    val stream = MemoryStream[(Int, String, Int)]
    val sq = graft.streaming.EventUpsert.start(
      stream.toDS().toDF("k", "v", "ver"), g, Seq("k"), "ver",
      java.nio.file.Files.createTempDirectory("race-ckpt").toString)
    try {
      stream.addData((1, "a", 1), (2, "b", 1))
      sq.processAllAvailable()
      // a second writer attaches and compacts — the table advances BEHIND
      // the ingester's back, so the ingester's next commit is stale
      val m = new graft.table.GraftTableGenerator(spark, wh, "stream_race").open()
      m.commitWithRetry()(_.compact())
      stream.addData((2, "c", 2), (3, "d", 1)) // conflicts once, retries, lands
      sq.processAllAvailable()
      // maintenance pair again: compact + expire under continuous ingest
      m.refresh()
      m.commitWithRetry()(_.compact())
      m.expireSnapshots(keepLast = 2)
      stream.addData((1, "e", 3), (4, "f", 1))
      sq.processAllAvailable()
      val live = g.read.collect()
        .map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
      assert(live == Map(1 -> ("e", 3), 2 -> ("c", 2), 3 -> ("d", 1), 4 -> ("f", 1)))
      assert(g.read.count() == 4) // key-unique: the map didn't hide dupes
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

  test("table follower: initial MoR load, append-only increments, rewrites invisible, durable resume") {
    import graft.streaming.TableFollower
    import graft.table.GraftTableGenerator
    val wh = java.nio.file.Files.createTempDirectory("follow-wh").toString
    val ckpt = java.nio.file.Files.createTempDirectory("follow-ckpt").toString
    val up = new GraftTableGenerator(spark, wh, "follow_up")
    up.create(Scenarios.OrdersSchema, Nil)
      .append(Bundles.ordersUnpartitioned(), 2, 100).commit()   // ids 0..199
      .equalityDelete(col("order_id") % 10 === 7, Seq("order_id")).commit()
    val down = new GraftTableGenerator(spark, wh, "follow_down")
    down.create(Scenarios.OrdersSchema, Nil)

    // initial load is the MoR state (deletes applied), not raw appends
    val f = new TableFollower(spark, up.tableDir.toString, ckpt)
    assert(f.drain(b => down.appendData(b).commit()) == 1)
    assert(down.read.count() == 180)
    assert(f.poll().isEmpty) // caught up

    // compaction between polls re-expresses those 180 rows — invisible;
    // the new append and a NON-propagated eq-delete arrive as one batch
    up.compact().commit()
      .append(Bundles.ordersUnpartitioned(), 1, 50).commit()    // ids 200..249
      .equalityDelete(col("order_id") % 10 === 3, Seq("order_id")).commit()
    assert(f.drain(b => down.appendData(b).commit()) == 1)
    assert(down.read.count() == 230) // 180 + 50; nothing re-delivered
    assert(down.read.where(col("order_id") % 10 === 3).count() > 0) // append-only

    // crash between apply and commit replays the same batch (at-least-once)
    up.append(Bundles.ordersUnpartitioned(), 1, 10).commit()    // ids 250..259
    val b1 = f.poll().get
    assert(b1.rows.count() == 10) // applied... then crash before commit
    val f2 = new TableFollower(spark, up.tableDir.toString, ckpt)
    val b2 = f2.poll().get
    assert(b2.fromExclusive == b1.fromExclusive && b2.rows.count() == 10)
    f2.commit(b2)
    assert(f2.poll().isEmpty)

    // expiry INSIDE the consumed window is fine (baseline keeps the offset
    // id as a skipped replace); expiry CROSSING the offset fails loudly
    up.expireSnapshots(keepLast = 2)
    assert(f2.poll().isEmpty)
    up.append(Bundles.ordersUnpartitioned(), 1, 10).commit()
      .append(Bundles.ordersUnpartitioned(), 1, 10).commit()
      .expireSnapshots(keepLast = 1) // horizon passes the offset
    val ex = intercept[IllegalArgumentException](f2.poll())
    assert(ex.getMessage.contains("retained history"))

    // rollback below the offset fails loudly on a fresh follow of history
    val up2 = new GraftTableGenerator(spark, wh, "follow_up2")
    up2.create(Scenarios.OrdersSchema, Nil)
      .append(Bundles.ordersUnpartitioned(), 1, 10).commit()
      .append(Bundles.ordersUnpartitioned(), 1, 10).commit()
    val ckpt2 = java.nio.file.Files.createTempDirectory("follow-ckpt2").toString
    val f3 = new TableFollower(spark, up2.tableDir.toString, ckpt2)
    f3.drain(_.count())
    up2.rollbackTo(1L)
    val ex2 = intercept[IllegalArgumentException](f3.poll())
    assert(ex2.getMessage.contains("rolled back"))
  }

  test("table follower CDC replication: deletes and updates propagate, replay converges") {
    import graft.streaming.TableFollower
    import graft.table.GraftTableGenerator
    val wh = java.nio.file.Files.createTempDirectory("replica-wh").toString
    val ckpt = java.nio.file.Files.createTempDirectory("replica-ckpt")
    val up = new GraftTableGenerator(spark, wh, "replica_up")
    up.create(Scenarios.OrdersSchema, Nil)
      .append(Bundles.ordersUnpartitioned(), 2, 100).commit()   // ids 0..199
      .equalityDelete(col("order_id") % 10 === 7, Seq("order_id")).commit()
    val rep = new GraftTableGenerator(spark, wh, "replica_down")
    rep.create(Scenarios.OrdersSchema, Nil)
    val f = new TableFollower(spark, up.tableDir.toString, ckpt.toString)
    assert(f.replicateInto(rep, Seq("order_id")) == 1)
    assert(rep.read.count() == 180) // initial state, deletes applied

    // one window mixing delete, update (upsert = delete+insert in the
    // changelog), compaction (invisible), and fresh appends
    val updated = up.read.where(col("order_id").between(30, 34))
      .withColumn("source_id", lit(99))
    up.equalityDelete(col("order_id") < 20, Seq("order_id")).commit()
      .upsert(updated, Seq("order_id")).commit()
      .compact().commit()
      .append(Bundles.ordersUnpartitioned(), 1, 50).commit()    // ids 200..249
    assert(f.replicateInto(rep, Seq("order_id")) == 1)
    assert(rep.read.count() == 212) // 180 - 18 deleted + 50 appended
    assert(rep.read.where(col("source_id") === 99).count() == 5) // updates landed
    // exact mirror: replica == upstream live state, row for row
    assert(up.read.except(rep.read).isEmpty && rep.read.except(up.read).isEmpty)

    // replay the whole last window (stale offset checkpoint) — converges
    val stale = java.nio.file.Files.createTempDirectory("replica-stale")
    java.nio.file.Files.writeString(stale.resolve("offset.txt"), "2")
    val f2 = new TableFollower(spark, up.tableDir.toString, stale.toString)
    assert(f2.replicateInto(rep, Seq("order_id")) == 1)
    assert(rep.read.count() == 212)
    assert(up.read.except(rep.read).isEmpty && rep.read.except(up.read).isEmpty)
  }
}
