package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.read.MorReader
import graft.scenarios.Scenarios
import Q._

/** Scenario-replay queries: run the REAL generator + MoR reader end-to-end
  * and compare against a pure-SQL reconstruction of the deterministic id
  * algebra (color = COLORS[id % 10], wave boundaries, sequence visibility —
  * reference `Main.java:328-408,522-541`). These are the judged evidence
  * that the engine's snapshot log, delete writers, and MoR reader implement
  * the reference's semantics — not just that Spark can anti-join.
  *
  * Warehouses build once per JVM into a temp dir (a few seconds each at
  * scenario scale; independent of sfDir by design — scenario content is
  * fixed by the reference, reference `Main.java:136-473`).
  */
object MorQueries {

  private lazy val wh: String =
    Files.createTempDirectory("graft-queries-wh").toString

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def table(spark: SparkSession, scenario: String,
                    build: (SparkSession, String) => graft.table.GraftTableGenerator): String =
    built.computeIfAbsent(scenario, _ => build(spark, wh).tableDir.toString)

  private def s10(spark: SparkSession): String =
    table(spark, "s10", Scenarios.createProductsWithEqDeletes)
  private def s2(spark: SparkSession): String =
    table(spark, "s2", Scenarios.createSmallOrdersWithDeletes)
  private def s7(spark: SparkSession): String =
    table(spark, "s7", Scenarios.createSmallOrdersWithPartitionEvolution)
  private def s8(spark: SparkSession): String =
    table(spark, "s8", Scenarios.createUnpartitionedOrdersWithDeletes)
  private def s12(spark: SparkSession): String =
    table(spark, "s12", Scenarios.createWideMetrics)
  /** 200 widget rows, then upsert of ids 100..249 (100 replace + 50 insert). */
  private def upserted(spark: SparkSession): String =
    built.computeIfAbsent("upserted", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_upserted")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 1, 200).commit()
      val incoming = graft.gen.Bundles.products()
        .frame(spark, 100, 150, Some("widget"), Scenarios.ProductsSchema)
      g.upsert(incoming, Seq("product_id")).commit()
      g.tableDir.toString
    })
  private def s11(spark: SparkSession): String =
    table(spark, "s11", Scenarios.createProductsWithEqDeletesSchemaChange)
  /** SCD2 fixture: append ids 0..99, then upsert ids 50..149 with CHANGED
    * content — snap 2's changelog closes ids 50..99 and opens 50..149. */
  private def scd2Table(spark: SparkSession): String =
    built.computeIfAbsent("scd2_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_scd2")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 1, 100).commit()
      val incoming = graft.gen.Bundles.products()
        .frame(spark, 50, 100, Some("widget"), Scenarios.ProductsSchema)
        .withColumn("name", concat(col("name"), lit("-v2")))
      g.upsert(incoming, Seq("product_id")).commit()
      g.tableDir.toString
    })

  /** WAP fixture: good append (100), audited append (50) REJECTED by its
    * audit (rolled back, never durable), audited append (30) accepted. */
  private def wapTable(spark: SparkSession): String =
    built.computeIfAbsent("wap_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_wap")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 1, 100).commit()
      val rejected = g.commitAudited(
        _.append(Seq("widget"), graft.gen.Bundles.products(), 1, 50))(
        df => df.count() == -1L) // audit never satisfied → rollback
      require(!rejected, "audit was supposed to reject")
      val accepted = g.commitAudited(
        _.append(Seq("widget"), graft.gen.Bundles.products(), 1, 30))(
        df => df.count() == 130L)
      require(accepted, "audit was supposed to accept")
      g.tableDir.toString
    })

  /** Manifest-count fixture: widget clean (metadata path sound), gizmo
    * delete-affected (must fall back to the MoR scan). */
  private def fastCountTable(spark: SparkSession): String =
    built.computeIfAbsent("fastcount_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_fc")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 2, 50).commit()
        .append(Seq("gizmo"), graft.gen.Bundles.products(), 2, 50).commit()
        .equalityDelete(Seq("gizmo"), col("product_id") % 5 === 0,
          Seq("product_id")).commit()
      g.tableDir.toString
    })

  /** Deletion-vector lifecycle fixture: pos-delete widget ids < 10, fold
    * into vectors, then post-fold deletes (pos band 20..24, eq id 150)
    * that union on top, then a fresh append (ids 200..209). */
  private def dvTable(spark: SparkSession): String =
    built.computeIfAbsent("dv_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_dv")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 2, 50).commit()
        .append(Seq("gizmo"), graft.gen.Bundles.products(), 2, 50).commit()
      g.positionalDelete(Seq("widget"), col("product_id") < 10).commit()
      g.rewritePositionDeletesToDVs().commit()
      g.positionalDelete(Seq("widget"),
        col("product_id") >= 20 && col("product_id") < 25).commit()
      g.equalityDelete(Seq("gizmo"), col("product_id") === 150,
        Seq("product_id")).commit()
      g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit()
      g.tableDir.toString
    })

  /** Initial-default fixture: 50 rows pre-add (read the default), then a
    * column added with default 'active', then 50 rows with real values
    * (even ids 'fresh', odd ids a REAL null — must stay null). */
  private def defaultTable(spark: SparkSession): String =
    built.computeIfAbsent("default_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_default")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 1, 50).commit()
      g.addColumn("status", org.apache.spark.sql.types.StringType,
        Some("active"))
      val post = graft.gen.Bundles.products()
        .frame(spark, 50, 50, Some("widget"), Scenarios.ProductsSchema)
        .withColumn("status", when(col("product_id") % 2 === 0,
          lit("fresh")).otherwise(lit(null)))
      g.appendData(post).commit()
      g.tableDir.toString
    })

  /** Native-vector-write fixture: widget 100 rows, vectorDeletes(true),
    * two positional deletes in separate commits (ids < 10, then 20..24)
    * — generations OR-merge into one vector, zero tombstone files. */
  private def nativeDvTable(spark: SparkSession): String =
    built.computeIfAbsent("native_dv_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_ndv")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 2, 50).commit()
      g.vectorDeletes(true)
      g.positionalDelete(Seq("widget"), col("product_id") < 10).commit()
      g.positionalDelete(Seq("widget"),
        col("product_id") >= 20 && col("product_id") < 25).commit()
      g.tableDir.toString
    })

  /** Eq-conversion fixture: %5 eq wave (20 dead), upsert 40..49 (revives
    * 40/45, replaces the rest at higher seq), CONVERT all eq deletes to
    * vectors (28 exact positions), then one more eq delete on top. */
  private def eqConvertTable(spark: SparkSession): String =
    built.computeIfAbsent("eqconvert_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_eqc")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 2, 50).commit()
        .equalityDelete(Seq("widget"), col("product_id") % 5 === 0,
          Seq("product_id")).commit()
      val incoming = graft.gen.Bundles.products()
        .frame(spark, 40, 10, Some("widget"), Scenarios.ProductsSchema)
      g.upsert(incoming, Seq("product_id")).commit()
      g.rewriteEqualityDeletes().commit()
      g.equalityDelete(Seq("widget"), col("product_id") === 71,
        Seq("product_id")).commit()
      g.tableDir.toString
    })

  /** Write-order fixture: declared sort on order_id, 400 SHUFFLED rows
    * bulk-appended into 4 range-partitioned files — per-file envelopes
    * must come out disjoint with no rewrite ever run. */
  private def writeOrderedTable(spark: SparkSession): String =
    built.computeIfAbsent("writeorder_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "orders_worder")
      g.create(Scenarios.OrdersSchema, Nil)
      g.writeOrdered("order_id")
      val shuffled = graft.gen.Bundles.ordersUnpartitioned()
        .frame(spark, 0, 400, None, Scenarios.OrdersSchema)
        .orderBy(xxhash64(col("order_id")))
      g.appendBulk(shuffled, 4).commit()
      g.tableDir.toString
    })

  /** Metadata-delete fixture: sorted layout (5 files × 20 contiguous
    * ids), deleteWhere [20,59] drops two files as pure metadata,
    * deleteWhere [90,94] overlaps one file and pays a tombstone. */
  private def metaDeleteTable(spark: SparkSession): String =
    built.computeIfAbsent("metadelete_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_mdel")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 1, 100).commit()
        .compactSorted("product_id", 20).commit()
      g.deleteWhere("product_id", 20, 59).commit()
      g.deleteWhere("product_id", 90, 94).commit()
      g.tableDir.toString
    })

  /** ANALYZE fixture: widget 100, eq-delete ids %5 (80 live — colors
    * black/green die with them), stats persisted at the delete head. */
  private def statsTable(spark: SparkSession): String =
    built.computeIfAbsent("stats_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_stats")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 1, 100).commit()
        .equalityDelete(Seq("widget"), col("product_id") % 5 === 0,
          Seq("product_id")).commit()
      g.analyze(Seq("product_id", "category", "color"))
      g.tableDir.toString
    })

  /** Multi-transform-spec fixture (`category × bucket(2, product_id)`):
    * 100 rows (even ids widget, odd gizmo) sliced on the full tuple,
    * eq-delete ids < 20, then compact — partition maps keep both keys. */
  private def multiSpecTable(spark: SparkSession): String =
    built.computeIfAbsent("multispec_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_mspec")
      g.create(Scenarios.ProductsSchema,
        Seq("category", "bucket(2, product_id)"))
      val rows = graft.gen.Bundles.products()
        .frame(spark, 0, 100, Some("widget"), Scenarios.ProductsSchema)
        .withColumn("category", when(col("product_id") % 2 === 0,
          lit("widget")).otherwise(lit("gizmo")))
      g.appendData(rows).commit()
      g.equalityDelete(col("product_id") < 20, Seq("product_id")).commit()
      g.compact().commit()
      g.tableDir.toString
    })

  /** Row-lineage fixture: 100 rows (row ids 0..99 == product ids), delete
    * band 10..19, SORTED compaction (rows physically reordered — ids must
    * travel), then a fresh append taking ids 100..109 (dead ids retired). */
  private def lineageTable(spark: SparkSession): String =
    built.computeIfAbsent("lineage_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_lineage")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 2, 50).commit()
      g.positionalDelete(Seq("widget"),
        col("product_id") >= 10 && col("product_id") < 20).commit()
      g.compactSorted("name", 30).commit()
      g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit()
      g.tableDir.toString
    })

  /** Posting-list value-index lifecycle fixture: build over 200 rows,
    * eq-delete one indexed value (stale posting — must filter out),
    * append 20 more and refresh incrementally. Probes hit pre-index,
    * deleted, post-refresh, and absent values. */
  private def vidxTable(spark: SparkSession): String =
    built.computeIfAbsent("vidx_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_vidx")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 4, 25).commit()
        .append(Seq("gizmo"), graft.gen.Bundles.products(), 4, 25).commit()
      val idx = java.nio.file.Files.createTempDirectory("vidx_q_idx").toString
      graft.read.ValueIndex.build(spark, g.tableDir.toString, "product_id", idx)
      g.equalityDelete(Seq("gizmo"), col("product_id") === 140,
        Seq("product_id")).commit()
      g.append(Seq("widget"), graft.gen.Bundles.products(), 2, 10).commit()
      graft.read.ValueIndex.refresh(spark, g.tableDir.toString, idx)
      g.tableDir.toString + "\n" + idx
    })

  /** The writable-branch lifecycle, end state driver-oracled: widget 100
    * on main, fork branch "audit", branch-append gizmo 50 + eq-delete
    * widget %10==0 (both INVISIBLE to main — guarded at build), then
    * fast-forward publishes the branch onto main. */
  private def branchTable(spark: SparkSession): String =
    built.computeIfAbsent("branch_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_branch")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 1, 100).commit()
      g.createBranch("audit")
      require(g.branchForkId("audit") == 1L, "fork must be snapshot 1")
      g.writeTo("audit")
        .append(Seq("gizmo"), graft.gen.Bundles.products(), 1, 50).commit()
        .equalityDelete(Seq("widget"), col("product_id") % 10 === 0,
          Seq("product_id")).commit()
      // branch writes must be invisible to main until fast-forward
      require(g.writeTo("main").read.count() == 100L, "main saw branch writes")
      require(g.readBranch("audit").count() == 140L, "branch lineage wrong")
      g.fastForward("audit")
      g.tableDir.toString
    })

  /** widget 100 + gizmo 100; 60% of widget eq-deleted; then the health
    * loop: compactDirty(50) must pick exactly widget. */
  private def healthCompacted(spark: SparkSession): String =
    built.computeIfAbsent("health_compact_q", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_health_q")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 1, 100).commit()
        .append(Seq("gizmo"), graft.gen.Bundles.products(), 1, 100).commit()
        .equalityDelete(Seq("widget"), col("product_id") % 10 < 6,
          Seq("product_id")).commit()
      val picked = g.compactDirty(50)
      require(picked == Seq("widget"), s"health loop picked $picked")
      g.commit()
      g.tableDir.toString
    })
  /** 10 sequential unpartitioned files (order_id ranges of 100 each) + one
    * eq-delete wave — the metrics-pruning fixture: a range predicate must
    * open only the files whose recorded min/max intersect it. */
  private def metricsTable(spark: SparkSession): String =
    built.computeIfAbsent("metrics_prune", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "orders_metrics")
      g.create(Scenarios.OrdersSchema, Nil)
        .append(graft.gen.Bundles.ordersUnpartitioned(), 10, 100).commit()
        .equalityDelete(col("order_id") % 10 === 7, Seq("order_id")).commit()
      g.tableDir.toString
    })

  /** 8 files whose token column spans [aaa, zzz] in EVERY file (sentinel
    * first/last rows) with one distinct key token per file — min/max
    * envelopes prune nothing; the manifest Bloom filter
    * ([[graft.table.GraftTableGenerator.withBloomFilters]]) is what lets
    * an equality read open one file (spec-gated). */
  private def bloomTable(spark: SparkSession): String =
    built.computeIfAbsent("bloom_prune", _ => {
      import org.apache.spark.sql.types._
      val g = new graft.table.GraftTableGenerator(spark, wh, "toks_bloom")
      g.create(graft.schema.GraftSchema.of(
          "id" -> LongType, "tok" -> StringType), Nil)
        .withBloomFilters("tok")
      (0 until 8).foreach { i =>
        g.appendData(spark.range(i * 100L, (i + 1) * 100L).toDF("id")
          .withColumn("tok",
            when(col("id") % 100 === 0, lit("aaa"))
              .when(col("id") % 100 === 99, lit("zzz"))
              .otherwise(concat(lit("key_"), lit(i))))).commit()
      }
      g.tableDir.toString
    })
  /** Conditional-MERGE scenario: base ids 0..399 (val = 2·id), source ids
    * 300..499 (val = 3·id) with an `op` action column. deleteWhen kills
    * id%10==0 matches, updateWhen skips id%7==0 matches (those target rows
    * must survive UNTOUCHED — the behavior [[graft.table
    * .GraftTableGenerator.upsert]] can't express), insertWhen filters the
    * unmatched `op = "D"` rows. */
  private def mergeTable(spark: SparkSession): String =
    built.computeIfAbsent("merge_demo", _ => {
      import org.apache.spark.sql.types._
      val g = new graft.table.GraftTableGenerator(spark, wh, "orders_merge")
      g.create(graft.schema.GraftSchema.of(
        "id" -> LongType, "val" -> LongType), Nil)
      g.appendData(spark.range(0, 400).toDF("id")
        .withColumn("val", col("id") * 2)).commit()
      val src = spark.range(300, 500).toDF("id")
        .withColumn("val", col("id") * 3)
        .withColumn("op", when(col("id") % 10 === 0, lit("D")).otherwise(lit("U")))
      g.mergeInto(src, Seq("id"),
        updateWhen = col("id") % 7 =!= 0,
        deleteWhen = col("op") === "D",
        insertWhen = col("op") =!= "D").commit()
      g.tableDir.toString
    })

  /** Three pos-delete waves × 2 partitions (6 tombstone files, with an
    * interleaved append and duplicate tombstones), then
    * [[graft.table.GraftTableGenerator.compactPositionDeletes]] — the MoR
    * read over the CONSOLIDATED tombstones must equal the arithmetic
    * final state. */
  private def posDelCompactTable(spark: SparkSession): String =
    built.computeIfAbsent("posdel_compact_q", _ => {
      import org.apache.spark.sql.types._
      val g = new graft.table.GraftTableGenerator(spark, wh, "orders_posdel_compact")
      g.create(graft.schema.GraftSchema.of(
        "id" -> LongType, "part" -> StringType), Seq("part"))
      g.appendData(spark.range(0, 200).toDF("id")
        .withColumn("part", when(col("id") < 100, lit("a")).otherwise(lit("b"))))
        .commit()
      g.positionalDelete(col("id") % 10 === 0).commit()
      g.positionalDelete(col("id") % 10 === 1).commit()
      g.appendData(spark.range(200, 202).toDF("id")
        .withColumn("part", lit("a"))).commit()
      g.positionalDelete(col("id") % 10 === 0).commit()
      g.compactPositionDeletes().commit()
      g.tableDir.toString
    })

  /** Hidden bucket partitioning ([[graft.meta.PartitionTransform]]):
    * 1000 rows hash-bucketed 8 ways on `id` (rows carry no bucket column),
    * one eq-delete wave, then a 3-value point read that prunes by the
    * transform of each probe value. */
  private def bucketTable(spark: SparkSession): String =
    built.computeIfAbsent("bucket_q", _ => {
      import org.apache.spark.sql.types._
      val g = new graft.table.GraftTableGenerator(spark, wh, "orders_bucket")
      g.create(graft.schema.GraftSchema.of(
        "id" -> LongType, "val" -> LongType), Seq("bucket(8,id)"))
      g.appendData(spark.range(0, 1000).toDF("id")
        .withColumn("val", col("id") * 7)).commit()
      g.equalityDelete(col("id") % 500 === 123, Seq("id")).commit() // 123, 623
      g.tableDir.toString
    })

  /** The events table ingested under a `day(ts)` hidden partition spec
    * (one derived calendar-day partition per file, rows keep only `ts`):
    * the time-series ingest layout, keyed per sf dir. */
  private def dayTable(spark: SparkSession, d: String): String =
    built.computeIfAbsent(s"day_q@$d", _ => {
      import org.apache.spark.sql.types._
      val ev = ExtQueries.eventsWithTs(spark, d)
        .select(col("event_id"), col("_ts").as("ts"), col("user_id"),
          col("event_type"), col("value"))
      val g = new graft.table.GraftTableGenerator(spark, wh,
        s"events_day_${Integer.toHexString(d.hashCode)}")
      g.create(graft.schema.GraftSchema.of(
        "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType), Seq("day(ts)"))
      g.appendData(ev).commit()
      g.tableDir.toString
    })

  /** S10 rebuilt under another name, then history expired down to the last
    * 2 snapshots — the retained window is rebased onto one baseline
    * snapshot, orphaned files are deleted, and the live rows must stay
    * IDENTICAL to s10's golden merge. */
  private def s10x(spark: SparkSession): String =
    built.computeIfAbsent("s10x", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_expired")
      g.create(Scenarios.ProductsSchema, Seq("category"), Scenarios.TinyRowGroupProps)
        .append(Seq("widget"), graft.gen.Bundles.products(), 1, 200).commit()
        .equalityDelete(Seq("widget"), col("product_id") < 30, Seq("product_id")).commit()
        .append(Seq("gizmo"), graft.gen.Bundles.products(), 1, 200).commit()
        .equalityDelete(Seq("widget", "gizmo"), col("color") === "green", Seq("color")).commit()
        .append(Seq("widget", "gadget", "gizmo"), graft.gen.Bundles.products(), 1, 200).commit()
        .equalityDelete(Seq("widget", "gadget", "gizmo"),
          col("product_id") % 200 >= 100, Seq("product_id")).commit()
        .positionalDelete(Seq("widget"),
          col("product_id") >= 50 && col("product_id") < 53).commit()
        .expireSnapshots(keepLast = 2)
      g.tableDir.toString
    })

  /** 10 widget files whose color column (= COLORS[id % 10]) interleaves
    * across EVERY file — metrics pruning on color is useless — then one
    * eq-delete wave and a SORTED compaction by color: the rewritten files
    * carry disjoint color ranges, so a color range-read must open only
    * the intersecting files. */
  private def sortedTable(spark: SparkSession): String =
    built.computeIfAbsent("sorted_compact", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_sorted")
      g.create(Scenarios.ProductsSchema, Seq("category"))
        .append(Seq("widget"), graft.gen.Bundles.products(), 10, 100).commit()
        .equalityDelete(Seq("widget"), col("color") === "red", Seq("color")).commit()
        .compactSorted("color", 200, Some(Seq("widget"))).commit()
      g.tableDir.toString
    })

  /** S10 rebuilt with a DETERMINISTIC commit clock (snapshot n commits at
    * n*1000 epoch-ms) and a tag at snapshot 6 — the timestamp-time-travel /
    * named-ref / snapshots-metadata fixture. Same golden row algebra as
    * s10; only the snapshot-log v2 fields differ (and are reproducible). */
  private def s10ts(spark: SparkSession): String =
    built.computeIfAbsent("s10ts", _ => {
      var t = 0L
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_ts",
        clock = () => { t += 1000; t })
      g.create(Scenarios.ProductsSchema, Seq("category"), Scenarios.TinyRowGroupProps)
        .append(Seq("widget"), graft.gen.Bundles.products(), 1, 200).commit()
        .equalityDelete(Seq("widget"), col("product_id") < 30, Seq("product_id")).commit()
        .append(Seq("gizmo"), graft.gen.Bundles.products(), 1, 200).commit()
        .equalityDelete(Seq("widget", "gizmo"), col("color") === "green", Seq("color")).commit()
        .append(Seq("widget", "gadget", "gizmo"), graft.gen.Bundles.products(), 1, 200).commit()
        .equalityDelete(Seq("widget", "gadget", "gizmo"),
          col("product_id") % 200 >= 100, Seq("product_id")).commit()
        .tag("before_pos_deletes") // snapshot 6: 453 live rows
        .positionalDelete(Seq("widget"),
          col("product_id") >= 50 && col("product_id") < 53).commit()
      g.tableDir.toString
    })

  /** 10 sequential files + one eq-delete wave, rewritten along the
    * z-curve over (order_id, source_id) — the multi-dimensional layout:
    * range reads on either column prune files (spec-gated). */
  private def zorderTable(spark: SparkSession): String =
    built.computeIfAbsent("zorder_compact", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "orders_zorder")
      g.create(Scenarios.OrdersSchema, Nil)
        .append(graft.gen.Bundles.ordersUnpartitioned(), 10, 100).commit()
        .equalityDelete(col("order_id") % 10 === 7, Seq("order_id")).commit()
        .compactZOrder(Seq("order_id", "source_id"), 100).commit()
      g.tableDir.toString
    })

  /** Rename fixture: 100 rows under `order_id`, rename to `order_key`,
    * 100 more under the new name — reads resolve BOTH epochs by field id. */
  private def renamedTable(spark: SparkSession): String =
    built.computeIfAbsent("renamed_t", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "orders_renamed")
      g.create(Scenarios.OrdersSchema, Seq("order_year"))
        .append(Seq(2019), graft.gen.Bundles.orders(), 1, 100).commit()
        .renameColumn("order_id", "order_key")
      g.appendData(graft.gen.Bundles.orders()
          .frame(spark, 100, 100, Some(2020), Scenarios.OrdersSchema)
          .withColumnRenamed("order_id", "order_key")).commit()
      g.tableDir.toString
    })

  /** 10 files + eq-delete wave, then a junk append ROLLED BACK — the
    * rollback_to_snapshot fixture: reads must show the pre-junk state. */
  private def rollbackTable(spark: SparkSession): String =
    built.computeIfAbsent("rollback_t", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "orders_rollback")
      g.create(Scenarios.OrdersSchema, Nil)
        .append(graft.gen.Bundles.ordersUnpartitioned(), 10, 100).commit()
        .equalityDelete(col("order_id") % 10 === 7, Seq("order_id")).commit()
        .append(graft.gen.Bundles.ordersUnpartitioned(), 2, 100).commit() // junk
        .rollbackTo(2L)
      g.tableDir.toString
    })

  /** Downstream mirror built by [[graft.streaming.TableFollower]]: the
    * 180-row initial MoR load (ids 0..199 minus %10==7), then a
    * post-compaction 50-row append window (ids 200..249) delivered
    * append-only — the rewrite snapshot is invisible to the follower, so
    * nothing is re-delivered. */
  private def followTable(spark: SparkSession): String =
    built.computeIfAbsent("follow_t", _ => {
      val up = new graft.table.GraftTableGenerator(spark, wh, "orders_follow_up")
      up.create(Scenarios.OrdersSchema, Nil)
        .append(graft.gen.Bundles.ordersUnpartitioned(), 2, 100).commit()
        .equalityDelete(col("order_id") % 10 === 7, Seq("order_id")).commit()
      val down = new graft.table.GraftTableGenerator(spark, wh, "orders_follow_down")
      down.create(Scenarios.OrdersSchema, Nil)
      val f = new graft.streaming.TableFollower(spark, up.tableDir.toString,
        Files.createTempDirectory("follow-q-ckpt").toString)
      f.drain(b => down.appendData(b).commit())
      up.compact().commit()
        .append(graft.gen.Bundles.ordersUnpartitioned(), 1, 50).commit()
      f.drain(b => down.appendData(b).commit())
      down.tableDir.toString
    })

  /** CDC replica built by [[graft.streaming.TableFollower.replicateInto]]:
    * initial 180-row state, then a window mixing a fresh append
    * (ids 200..249) with an eq-delete of ids < 20 — the delete PROPAGATES
    * (unlike the append-only follow), applied as one keyed merge. */
  private def replicaTable(spark: SparkSession): String =
    built.computeIfAbsent("replica_t", _ => {
      val up = new graft.table.GraftTableGenerator(spark, wh, "orders_replica_up")
      up.create(Scenarios.OrdersSchema, Nil)
        .append(graft.gen.Bundles.ordersUnpartitioned(), 2, 100).commit()
        .equalityDelete(col("order_id") % 10 === 7, Seq("order_id")).commit()
      val rep = new graft.table.GraftTableGenerator(spark, wh, "orders_replica_down")
      rep.create(Scenarios.OrdersSchema, Nil)
      val f = new graft.streaming.TableFollower(spark, up.tableDir.toString,
        Files.createTempDirectory("replica-q-ckpt").toString)
      f.replicateInto(rep, Seq("order_id"))
      up.append(graft.gen.Bundles.ordersUnpartitioned(), 1, 50).commit()
        .equalityDelete(col("order_id") < 20, Seq("order_id")).commit()
      f.replicateInto(rep, Seq("order_id"))
      rep.tableDir.toString
    })

  /** S10 rebuilt under another name, then compacted — same live rows. */
  private def s10c(spark: SparkSession): String =
    built.computeIfAbsent("s10c", _ => {
      val g = new graft.table.GraftTableGenerator(spark, wh, "products_compacted")
      g.create(Scenarios.ProductsSchema, Seq("category"), Scenarios.TinyRowGroupProps)
        .append(Seq("widget"), graft.gen.Bundles.products(), 1, 200).commit()
        .equalityDelete(Seq("widget"), col("product_id") < 30, Seq("product_id")).commit()
        .append(Seq("gizmo"), graft.gen.Bundles.products(), 1, 200).commit()
        .equalityDelete(Seq("widget", "gizmo"), col("color") === "green", Seq("color")).commit()
        .append(Seq("widget", "gadget", "gizmo"), graft.gen.Bundles.products(), 1, 200).commit()
        .equalityDelete(Seq("widget", "gadget", "gizmo"),
          col("product_id") % 200 >= 100, Seq("product_id")).commit()
        .positionalDelete(Seq("widget"),
          col("product_id") >= 50 && col("product_id") < 53).commit()
        .compact().commit()
      g.tableDir.toString
    })

  val queries: Map[String, QueryFn] = Map(
    // S10 golden merge: full MoR pipeline → 450 rows across 3 categories
    "mor_count_golden" -> ((s, _) => {
      MorReader.read(s, s10(s))
        .groupBy("category").agg(count(lit(1)).as("cnt"))
        .orderBy("category")
    }),

    // time travel: S10 as of snapshot 5 (after third append) = 933 rows,
    // eq-deletes seq 2/4 applied with strict visibility
    "snapshot_scan" -> ((s, _) => {
      MorReader.readAt(s, s10(s), 5L)
        .groupBy("category").agg(count(lit(1)).as("cnt"))
        .orderBy("category")
    }),

    // the same snapshot-5 time travel through the SQL surface: the
    // graft_table TVF (plans/GraftTableFunction.scala) expands to the full
    // MoR read plan at analysis time, so plain SQL — aggregate, filters,
    // everything — optimizes against the same anti-join/pruning plan the
    // Scala API builds. Proves the engine's SQL entry point end-to-end
    // under the driver's oracle.
    "sql_tvf_scan" -> ((s, _) => {
      graft.plans.GraftTableFunction.ensureRegistered(s)
      val dir = s10(s)
      s.sql(
        s"""SELECT category, COUNT(*) AS cnt
           |FROM graft_table('$dir', 5)
           |GROUP BY category ORDER BY category""".stripMargin)
    }),

    // row lineage from plain SQL: graft_table_lineage(path) exposes the
    // stable _row_id / _last_updated_seq columns — the same end state the
    // Scala surface answers in mor_row_lineage, reached through the TVF
    "sql_tvf_lineage" -> ((s, _) => {
      graft.plans.GraftTableFunction.ensureRegistered(s)
      val dir = lineageTable(s)
      s.sql(
        s"""SELECT COUNT(*) AS cnt, SUM(_row_id) AS id_sum,
           |       SUM(CASE WHEN _row_id = product_id THEN 1 ELSE 0 END)
           |         AS n_stable,
           |       MAX(_last_updated_seq) AS max_seq
           |FROM graft_table_lineage('$dir')""".stripMargin)
    }),

    // metadata tables from plain SQL: graft_table_meta(path, which) — the
    // Iceberg tbl.files-style surface; same delete-unaware partitions
    // rollup the Scala MetaTables answers in meta_partitions
    "sql_tvf_meta" -> ((s, _) => {
      graft.plans.GraftTableFunction.ensureRegistered(s)
      val dir = s10(s)
      s.sql(
        s"""SELECT * FROM graft_table_meta('$dir', 'partitions')
           |ORDER BY `partition`""".stripMargin)
    }),

    // persisted ANALYZE stats from plain SQL: graft_table_stats(path) —
    // the metadata table a SQL planner (or operator) reads cardinalities
    // from; 'stale' reports whether the head moved past the stats
    "sql_tvf_stats" -> ((s, _) => {
      graft.plans.GraftTableFunction.ensureRegistered(s)
      val dir = statsTable(s)
      s.sql(
        s"""SELECT col_name, ndv, row_count, stale
           |FROM graft_table_stats('$dir')
           |ORDER BY col_name""".stripMargin)
    }),

    // CDC from SQL: graft_table_changes(path, from, to) — same changelog
    // as changelog_scan, reached through the TVF surface (the Iceberg
    // `table_changes` parity entry point)
    "sql_tvf_changes" -> ((s, _) => {
      graft.plans.GraftTableFunction.ensureRegistered(s)
      val dir = s10(s)
      s.sql(
        s"""SELECT change_kind, category, COUNT(*) AS cnt,
           |       SUM(CAST(product_id AS BIGINT)) AS id_sum
           |FROM graft_table_changes('$dir', 2, 5)
           |GROUP BY change_kind, category
           |ORDER BY change_kind, category""".stripMargin)
    }),

    // TIMESTAMP time travel (FOR TIMESTAMP AS OF): ts=5500 between the
    // snapshot-5 commit (t=5000) and snapshot 6 (t=6000) resolves to
    // snapshot 5 — identical state to snapshot_scan, reached by timestamp
    "snapshot_ts_scan" -> ((s, _) => {
      MorReader.readAtTime(s, s10ts(s), 5500L)
        .groupBy("category").agg(count(lit(1)).as("cnt"))
        .orderBy("category")
    }),

    // named ref (VERSION AS OF 'tag'): the fixture tags snapshot 6 (all
    // three eq-delete waves applied, pos-delete wave not yet) = 453 rows
    "tag_scan" -> ((s, _) => {
      MorReader.readRef(s, s10ts(s), "before_pos_deletes")
        .groupBy("category").agg(count(lit(1)).as("cnt"),
          sum(col("product_id").cast("long")).as("id_sum"))
        .orderBy("category")
    }),

    // S2: interleaved appends + 3 pos-delete waves + lying empty file
    "mor_pos_delete_waves" -> ((s, _) => {
      MorReader.read(s, s2(s))
        .groupBy("order_year").agg(count(lit(1)).as("cnt"),
          sum(col("order_id").cast("long")).as("id_sum"))
        .orderBy("order_year")
    }),

    // S7: partition evolution — union across spec epochs, new-epoch ids
    // land in source_id blocks of 40
    "mor_partition_evolution" -> ((s, _) => {
      MorReader.read(s, s7(s))
        .where(col("order_id") >= 600)
        .groupBy("source_id").agg(count(lit(1)).as("cnt"),
          min(col("order_id")).as("min_id"), max(col("order_id")).as("max_id"))
        .orderBy("source_id")
    }),

    // S8: unpartitioned MoR — delete scope is files present at delete time
    "mor_unpartitioned_deletes" -> ((s, _) => {
      MorReader.read(s, s8(s))
        .agg(count(lit(1)).as("cnt"), sum(col("order_id").cast("long")).as("id_sum"))
    }),

    // S11: schema evolution — dropped eq-key column still deletes; added
    // column null for pre-evolution rows
    "mor_schema_evolution" -> ((s, _) => {
      MorReader.read(s, s11(s))
        .groupBy("category", "color").agg(count(lit(1)).as("cnt"))
        .orderBy("category", "color")
    }),

    // compaction roundtrip: S10 state rewritten copy-on-write — the merged
    // result must be byte-equal to the MoR read (same oracle as
    // mor_count_golden)
    "mor_compact_golden" -> ((s, _) => {
      MorReader.read(s, s10c(s))
        .groupBy("category").agg(count(lit(1)).as("cnt"))
        .orderBy("category")
    }),

    // MERGE-style upsert (eq-delete + append composition): 200 rows,
    // 150 incoming (100 replace, 50 insert) → 250 distinct keys
    "mor_upsert" -> ((s, _) => {
      MorReader.read(s, upserted(s))
        .groupBy("category")
        .agg(count(lit(1)).as("cnt"),
          sum(col("product_id").cast("long")).as("id_sum"),
          countDistinct(col("product_id")).as("n_keys"))
        .orderBy("category")
    }),

    // products created_date = LocalDate(2022 - id/12, 12 - id%12, 1) —
    // deterministic date arithmetic replayed in SQL over the live S10 rows
    // (SURVEY §2.6 key `date_arith_created`, reference Main.java:537)
    "date_arith_created" -> ((s, _) => {
      MorReader.read(s, s10(s))
        .groupBy(year(col("created_date")).as("y"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(month(col("created_date"))).as("n_months"))
        .orderBy("y")
    }),

    // products name = template(Category) [+ suffix] — every generated name
    // must match the documented shape per category (SURVEY §2.6 key
    // `str_format_name`, reference Main.java:522-531,62-69)
    "str_format_name" -> ((s, _) => {
      val shape = "^(Core|Ever|Home)?(Widget|Gizmo|Gadget)" +
        "(Press|Lab|Scope|Kit|Tron|View|Buddy)?" +
        "( (Advanced|1000|2000|Deluxe|Express|Ultimate))?$"
      MorReader.read(s, s10(s))
        .groupBy("category")
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("name").rlike(shape) &&
            col("name").contains(initcap(col("category"))), 1L).otherwise(0L))
            .as("well_formed"))
        .orderBy("category")
    }),

    // S12 wide schema (1000 cols, 30 files × 1 row): planning + projection
    // over a metadata-heavy table; only id-derived facts are SQL-replayable
    // (metric values are xxhash64-derived, which DuckDB lacks)
    "mor_wide_metrics" -> ((s, _) => {
      val df = MorReader.read(s, s12(s))
      df.agg(count(lit(1)).as("cnt"),
        sum(col("id").cast("long")).as("id_sum"),
        lit(df.columns.length.toLong).as("n_cols"))
    }),

    // partition-pruned MoR read (Expressions.in analog): widget partition only
    "mor_partition_prune" -> ((s, _) => {
      MorReader.readWhere(s, s10(s), Map("category" -> Set("widget")))
        .groupBy("category").agg(count(lit(1)).as("cnt"))
        .orderBy("category")
    }),

    // incremental append scan (Iceberg appendsBetween analog): S10 snapshots
    // (2, 5] added gizmo ids 200..399 and widget/gadget/gizmo 400..999 —
    // raw appended rows, deletes NOT applied, old files never opened
    "incremental_append_scan" -> ((s, _) => {
      MorReader.appendsBetween(s, s10(s), 2L, 5L)
        .groupBy("category").agg(count(lit(1)).as("cnt"),
          sum(col("product_id").cast("long")).as("id_sum"))
        .orderBy("category")
    }),

    // CDC changelog (2, 5]: inserts = in-range appends surviving the green
    // eq-delete wave (seq-strict); deletes = pre-existing widget rows the
    // wave killed (id%10=5 over ids 30..199)
    "changelog_scan" -> ((s, _) => {
      MorReader.changelogBetween(s, s10(s), 2L, 5L)
        .groupBy("change_kind", "category").agg(count(lit(1)).as("cnt"),
          sum(col("product_id").cast("long")).as("id_sum"))
        .orderBy("change_kind", "category")
    }),

    // file-level metrics pruning (withMetrics analog): order_id ∈ [250, 449]
    // must open 3 of the 10 data files (per-file min/max from the log) and
    // still apply the eq-delete wave to the surviving rows
    "metrics_file_prune" -> ((s, _) => {
      MorReader.readRange(s, metricsTable(s),
          Map("order_id" -> MorReader.ColRange(Some("250"), Some("449"))))
        .agg(count(lit(1)).as("cnt"), sum(col("order_id").cast("long")).as("id_sum"),
          min(col("order_id")).as("min_id"), max(col("order_id")).as("max_id"))
    }),

    // manifest-bloom equality pruning: every file's [min, max] spans the
    // whole token space, so only the per-file bloom bitsets let the
    // planner open 1 of 8 files (spec-gated); values beyond pruning match
    // DuckDB's full-scan filter
    "metrics_prune_bloom" -> ((s, _) => {
      MorReader.readRange(s, bloomTable(s),
          Map("tok" -> MorReader.ColRange(Some("key_3"), Some("key_3"))))
        .agg(count(lit(1)).as("cnt"), sum(col("id")).as("id_sum"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
    }),

    // conditional MERGE: delete/update/insert actions decided per row by
    // Columns over source AND matched-target (_t_) values; matched rows
    // hit by neither action survive untouched — DuckDB reproduces the
    // final state arithmetically
    "mor_merge" -> ((s, _) =>
      MorReader.read(s, mergeTable(s)).select(col("id"), col("val"))),

    // consolidated position deletes: 6 tombstone files → 1 per partition
    // at the group-max seq; duplicate tombstones deduped; the wave-3
    // delete saw the interleaved append (id 200 dies, 201 lives)
    "mor_posdelete_compact" -> ((s, _) =>
      MorReader.read(s, posDelCompactTable(s))
        .agg(count(lit(1)).as("cnt"), sum(col("id")).as("id_sum"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))),

    // day-partitioned events ingest: a one-day range read opens 1 of 30
    // daily files (disjoint per-day min/max from the hidden day(ts)
    // layout); values match DuckDB's full-scan date filter
    "mor_day_ingest" -> ((s, d) =>
      MorReader.readRange(s, dayTable(s, d),
          Map("ts" -> MorReader.ColRange(Some("2024-01-15 00:00:00"),
            Some("2024-01-15 23:59:59.999999"))))
        .agg(count(lit(1)).as("cnt"),
          sum(expr("cast(round(value * 100) as bigint)")).as("value_cents"),
          countDistinct(col("user_id")).as("n_users"))),

    // hidden bucket partitioning: point read maps each probe id through
    // the bucket transform and opens only matching bucket files; the
    // deleted id (123) stays dead through the MoR merge
    "mor_bucket_prune" -> ((s, _) =>
      MorReader.readValues(s, bucketTable(s), "id", Seq("37", "123", "777"))
        .agg(count(lit(1)).as("cnt"), sum(col("val")).as("val_sum"),
          min(col("val")).as("min_val"), max(col("val")).as("max_val"))),

    // IN-set point read over the bloom-indexed token column: per-VALUE
    // envelope+bloom probes open only the files holding a probed token
    // (spec-gated 2 of 8), where any single range over the same values
    // keeps all 8 spanning files
    "metrics_prune_in" -> ((s, _) =>
      MorReader.readValues(s, bloomTable(s), "tok",
          Seq("key_1", "key_5", "key_nope"))
        .agg(count(lit(1)).as("cnt"), sum(col("id")).as("id_sum"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))),

    // sorted compaction: disjoint per-file color ranges ⇒ the range read
    // opens 2 of 5 rewritten files (spec-gated) and the eq-delete wave is
    // already merged into the rewrite
    "metrics_prune_sorted" -> ((s, _) => {
      MorReader.readRange(s, sortedTable(s),
          Map("color" -> MorReader.ColRange(Some("blue"), Some("gray"))))
        .agg(count(lit(1)).as("cnt"),
          sum(col("product_id").cast("long")).as("id_sum"),
          min(col("color")).as("min_color"), max(col("color")).as("max_color"))
    }),

    // rename evolution: both epochs' values surface under the NEW name
    // (field-id projection), summed per year
    "mor_schema_rename" -> ((s, _) => {
      MorReader.read(s, renamedTable(s))
        .groupBy("order_year")
        .agg(count(lit(1)).as("cnt"),
          sum(col("order_key").cast("long")).as("key_sum"))
        .orderBy("order_year")
    }),

    // rollback_to_snapshot: the junk third append left history entirely —
    // reads show the eq-delete-merged pre-junk state
    "mor_rollback" -> ((s, _) => {
      MorReader.read(s, rollbackTable(s))
        .agg(count(lit(1)).as("cnt"),
          sum(col("order_id").cast("long")).as("id_sum"))
    }),

    // z-order rewrite: the eq-delete wave is merged into the curve-ordered
    // files and a range read stays correct (file pruning is spec-gated)
    "mor_compact_zorder" -> ((s, _) => {
      MorReader.readRange(s, zorderTable(s),
          Map("order_id" -> MorReader.ColRange(Some("250"), Some("449"))))
        .agg(count(lit(1)).as("cnt"),
          sum(col("order_id").cast("long")).as("id_sum"),
          min(col("order_id")).as("min_id"), max(col("order_id")).as("max_id"))
    }),

    // maintenance: snapshot expiry must not change the live merge — the
    // retained window rebases onto a baseline snapshot, orphans deleted
    "snapshot_expire_scan" -> ((s, _) => {
      MorReader.read(s, s10x(s))
        .groupBy("category").agg(count(lit(1)).as("cnt"))
        .orderBy("category")
    }),

    // metadata tables (Iceberg `tbl.files`/`tbl.delete_files`/`tbl.snapshots`
    // /`tbl.partitions` analog) over S10 — pure snapshot-log reads, zero
    // data-file I/O; paths/seqs/counts are fixed by the scenario algebra
    "meta_files" -> ((s, _) =>
      graft.read.MetaTables.files(s, s10(s)).orderBy("file_path")),

    "meta_delete_files" -> ((s, _) =>
      graft.read.MetaTables.deleteFiles(s, s10(s)).orderBy("file_path")),

    // snapshots metadata incl. the v2 fields: writer-stamped committed_at
    // (deterministic-clock fixture: id*1000) and explicit operation kind
    "meta_snapshots" -> ((s, _) =>
      graft.read.MetaTables.snapshots(s, s10ts(s)).orderBy("snapshot_id")),

    "meta_partitions" -> ((s, _) =>
      graft.read.MetaTables.partitions(s, s10(s)).orderBy("partition")),

    // table-health report — the maintenance dashboard a 100 TB operator
    // watches: per partition, data/delete file counts, declared vs LIVE
    // rows (declared from the log alone — metadata-scale; live through the
    // MoR merge), and the dead-row percentage that drives compaction
    // scheduling. Integer percentage (div) keeps the compare exact.
    "meta_health" -> ((s, _) => {
      val dir = s10(s)
      val f = graft.read.MetaTables.files(s, dir)
        .groupBy("partition")
        .agg(count(lit(1)).as("data_files"),
          sum("record_count").as("declared_rows"))
      val d = graft.read.MetaTables.deleteFiles(s, dir)
        .groupBy("partition").agg(count(lit(1)).as("delete_files"))
      val live = MorReader.read(s, dir)
        .groupBy(concat(lit("category="), col("category")).as("partition"))
        .agg(count(lit(1)).as("live_rows"))
      f.join(d, Seq("partition"), "left")
        .join(live, Seq("partition"), "left")
        .select(col("partition"), col("data_files"),
          coalesce(col("delete_files"), lit(0L)).as("delete_files"),
          col("declared_rows"),
          coalesce(col("live_rows"), lit(0L)).as("live_rows"),
          expr("(declared_rows - coalesce(live_rows, 0)) * 100 div declared_rows")
            .as("dead_pct"))
        .orderBy("partition")
    }),

    // metadata-only COUNT(*) (Iceberg's manifest-count path),
    // driver-oracled: the clean partition answers from a driver fold over
    // declared record counts (zero file I/O — metadata_only=true); scopes
    // a delete file can touch fall back to the exact MoR scan
    "mor_fast_count" -> ((s, _) => {
      val dir = fastCountTable(s)
      Seq(("all", Map.empty[String, Set[String]]),
          ("gizmo", Map("category" -> Set("gizmo"))),
          ("widget", Map("category" -> Set("widget")))).map { case (tag, pf) =>
        val (n, metaOnly) = MorReader.fastCount(s, dir, pf)
        s.range(1).select(lit(tag).as("scope"), lit(n).as("n_rows"),
          lit(metaOnly).as("metadata_only"))
      }.reduce(_ unionAll _).orderBy("scope")
    }),

    // metadata-only MIN/MAX (Iceberg's aggregate pushdown), driver-oracled
    // on the same fixture: the clean partition folds per-file metric
    // envelopes on the driver (zero file I/O); delete-affected scopes fall
    // back to the exact MoR scan in the column's native type
    "mor_fast_minmax" -> ((s, _) => {
      val dir = fastCountTable(s)
      Seq(("all", Map.empty[String, Set[String]]),
          ("gizmo", Map("category" -> Set("gizmo"))),
          ("widget", Map("category" -> Set("widget")))).map { case (tag, pf) =>
        val (mm, metaOnly) = MorReader.fastMinMax(s, dir, "product_id", pf)
        s.range(1).select(lit(tag).as("scope"),
          lit(mm.map(_._1).orNull).as("min_id"),
          lit(mm.map(_._2).orNull).as("max_id"),
          lit(metaOnly).as("metadata_only"))
      }.reduce(_ unionAll _).orderBy("scope")
    }),

    // deletion vectors (Iceberg v3), driver-oracled END STATE: the fold is
    // logically invisible (pre-fold tombstones, post-fold tombstones, and
    // an eq delete all still apply; fresh appends unaffected), exactly one
    // vector row set survives with the folded cardinality, and the scan
    // applies it bitmap-wise (DeleteVectorSpec gates the no-anti-join plan)
    "mor_delete_vectors" -> ((s, _) => {
      val dir = dvTable(s)
      val dv = graft.meta.SnapshotLog(dir).load().mainOnly
        .deleteFiles.filter(_.kind == "dv")
      val card = s.read.parquet(dv.map(_.path): _*)
        .agg(coalesce(sum("cardinality"), lit(0L))).collect()(0).getLong(0)
      MorReader.read(s, dir)
        .agg(count(lit(1)).as("live_cnt"), sum(col("product_id")).as("id_sum"))
        .select(col("live_cnt"), col("id_sum"),
          lit(dv.size).as("n_vectors"), lit(card).as("dv_cardinality"))
    }),

    // Iceberg-v3 initial defaults, driver-oracled: pre-add rows read the
    // default through the by-id epoch projection (pure metadata — nothing
    // rewritten), post-add rows keep written values including real nulls
    "mor_schema_default" -> ((s, _) =>
      MorReader.read(s, defaultTable(s))
        .groupBy(coalesce(col("status"), lit("(null)")).as("status"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("product_id").cast("long")).as("id_sum"))
        .orderBy("status")),

    // Iceberg-v3 row lineage, driver-oracled END STATE: stable _row_id
    // through a sorted rewrite (ids travel with physically reordered
    // rows), dead ids retired (fresh append continues at 100), and ids
    // equal product ids by construction — n_stable pins the identity map
    "mor_row_lineage" -> ((s, _) =>
      MorReader.readLineage(s, lineageTable(s))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("_row_id")).as("n_ids"),
          sum(col("_row_id")).as("id_sum"),
          max(col("_row_id")).as("max_id"),
          sum(when(col("_row_id") === col("product_id").cast("long"), 1L)
            .otherwise(0L)).as("n_stable"))),

    // equality-delete conversion (the convert-equality-deletes action),
    // driver-oracled END STATE: the exact 28-position kill set became one
    // vector (strict-seq revivals preserved — 40/45 stay alive), the eq
    // files are gone, and a post-conversion eq delete composes on top
    "mor_eq_convert" -> ((s, _) => {
      val dir = eqConvertTable(s)
      val entries = graft.meta.SnapshotLog(dir).load().mainOnly.deleteFiles
      val dv = entries.filter(_.kind == "dv")
      val card = s.read.parquet(dv.map(_.path): _*)
        .agg(coalesce(sum("cardinality"), lit(0L))).collect()(0).getLong(0)
      MorReader.read(s, dir)
        .agg(count(lit(1)).as("live_cnt"),
          sum(col("product_id").cast("long")).as("id_sum"))
        .select(col("live_cnt"), col("id_sum"),
          lit(dv.size).as("n_vectors"),
          lit(entries.count(_.kind == "eq")).as("n_eq_files"),
          lit(card).as("dv_cardinality"))
    }),

    // the first_row_id metadata surface, driver-oracled over the lineage
    // fixture: the three sorted-rewrite files carry ids IN-FILE (-1 in
    // the manifest), the fresh append file holds base id 100
    "meta_lineage_files" -> ((s, _) =>
      graft.read.MetaTables.lineageFiles(s, lineageTable(s))
        .groupBy("lineage_in_file")
        .agg(count(lit(1)).as("n_files"),
          sum("record_count").as("declared_rows"),
          min("first_row_id").as("min_frid"),
          max("first_row_id").as("max_frid"))
        .orderBy("lineage_in_file")),

    // table write order (Iceberg write.sort-order), driver-oracled: bulk
    // ingest of SHUFFLED input under a declared order yields 4 files
    // with pairwise-DISJOINT order_id envelopes (no rewrite ever ran),
    // and a band read answers exactly over the sorted layout
    "mor_write_ordered" -> ((s, _) => {
      val dir = writeOrderedTable(s)
      val st = graft.meta.SnapshotLog(dir).load().mainOnly
      val fid = st.schema.fieldId("order_id")
      val es = st.dataFiles.map(_.metrics(fid))
        .map(m => (m.min.get.toLong, m.max.get.toLong))
      val overlapping = es.combinations(2).count {
        case Seq((a1, a2), (b1, b2)) => a1 <= b2 && b1 <= a2 }
      MorReader.readRange(s, dir,
          Map("order_id" -> MorReader.ColRange(Some("100"), Some("199"))))
        .agg(count(lit(1)).as("cnt"),
          sum(col("order_id").cast("long")).as("id_sum"))
        .select(col("cnt"), col("id_sum"),
          lit(st.dataFiles.size).as("n_files"),
          lit(overlapping).as("overlapping_pairs"))
    }),

    // metadata-accelerated range DELETE, driver-oracled END STATE: the
    // two fully-covered files dropped with ZERO tombstones (pure manifest
    // edit — the retention-window shape at 100 TB), the one overlapping
    // file pays a positional tombstone, disjoint files never opened
    "mor_metadata_delete" -> ((s, _) => {
      val dir = metaDeleteTable(s)
      val st = graft.meta.SnapshotLog(dir).load().mainOnly
      MorReader.read(s, dir)
        .agg(count(lit(1)).as("live_cnt"),
          sum(col("product_id").cast("long")).as("id_sum"))
        .select(col("live_cnt"), col("id_sum"),
          lit(st.dataFiles.size).as("n_files"),
          lit(st.deleteFiles.count(_.kind == "pos")).as("n_tombstones"))
    }),

    // ANALYZE TABLE / Puffin-stats analog, driver-oracled EXACTLY: one
    // aggregate pass persists per-column NDV (HLL++ — sparse-exact at
    // this cardinality), null counts, canonical min/max, and the live row
    // count; the MoR merge is applied first, so dead rows (and the two
    // colors that die with them) never pollute the statistics
    "meta_stats" -> ((s, _) =>
      graft.meta.TableStats.frame(s, statsTable(s))
        .orderBy("col_name")),

    // multi-transform partition spec (category × bucket), driver-oracled
    // END STATE through delete + compaction: the tuple layout slices,
    // scopes, and rewrites per combined partition
    "mor_multi_spec" -> ((s, _) => {
      val dir = multiSpecTable(s)
      val entries = graft.meta.SnapshotLog(dir).load().mainOnly.dataFiles
      MorReader.read(s, dir)
        .groupBy("category")
        .agg(count(lit(1)).as("cnt"),
          sum(col("product_id").cast("long")).as("id_sum"))
        .withColumn("n_two_key_files",
          lit(entries.count(_.partition.size == 2)))
        .withColumn("n_files", lit(entries.size))
        .orderBy("category")
    }),

    // NATIVE vector writes (the Iceberg-v3 writer contract), driver-
    // oracled END STATE: two vectorDeletes commits chain into exactly one
    // vector (generations OR-merged at write), no tombstone file exists,
    // and the live set reflects the union of both deletes
    "mor_dv_writes" -> ((s, _) => {
      val dir = nativeDvTable(s)
      val entries = graft.meta.SnapshotLog(dir).load().mainOnly.deleteFiles
      val card =
        if (entries.isEmpty) 0L
        else s.read.parquet(entries.map(_.path): _*)
          .agg(coalesce(sum("cardinality"), lit(0L))).collect()(0).getLong(0)
      MorReader.read(s, dir)
        .agg(count(lit(1)).as("live_cnt"),
          sum(col("product_id").cast("long")).as("id_sum"))
        .select(col("live_cnt"), col("id_sum"),
          lit(entries.count(_.kind == "dv")).as("n_vectors"),
          lit(entries.count(_.kind == "pos")).as("n_tombstone_files"),
          lit(card).as("dv_cardinality"))
    }),

    // posting-list value index, driver-oracled: index-backed point reads
    // across the whole lifecycle — a pre-index value, an eq-DELETED value
    // (stale posting filtered by the MoR read), a value only the
    // incremental refresh indexed, and an absent value
    "mor_value_index" -> ((s, _) => {
      val Array(dir, idx) = vidxTable(s).split("\n")
      // each probe's index lookup runs a small posting-scan job during
      // plan CONSTRUCTION — the four probes are independent, so build
      // them concurrently (guide §2.6) instead of paying four sequential
      // lookup jobs; the union still executes as one action
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val probes =
        try Await.result(
          Future.sequence(Seq("137", "140", "205", "99999").map { v =>
            Future {
              s.sparkContext.setJobDescription(s"mor_value_index: probe $v")
              graft.read.ValueIndex.readValue(s, dir, idx, v)
                .agg(count(lit(1)).as("n_rows"),
                  coalesce(sum("product_id"), lit(0L)).as("id_sum"))
                .select(lit(v).as("probe"), col("n_rows"), col("id_sum"))
            }
          }), scala.concurrent.duration.Duration.Inf)
        finally pool.shutdown()
      probes.reduce(_ unionAll _).orderBy("probe")
    }),

    // the writable-branch surface, driver-oracled END STATE: after the
    // audit branch fast-forwards, main carries the fork append + the
    // branch's gizmo append and widget eq-delete (140 rows), time travel
    // to the fork still answers the pre-branch 100, and the branch ref —
    // now at head — reads the same 140 (Iceberg branch visibility rules)
    "mor_branch_write" -> ((s, _) => {
      val dir = branchTable(s)
      val main = MorReader.read(s, dir)
        .agg(count(lit(1)).as("n_main"), sum("product_id").as("id_sum"))
      val atFork = MorReader.readAt(s, dir, 1L)
        .agg(count(lit(1)).as("n_at_fork"))
      val branch = MorReader.readBranch(s, dir, "audit")
        .agg(count(lit(1)).as("n_branch"))
      main.crossJoin(atFork).crossJoin(branch)
    }),

    // write-audit-publish, driver-oracled: the rejected batch's rows AND
    // its snapshot are absent from durable history (bad batches never
    // publish), the accepted batch's are present — final state is 130
    // live rows over exactly 2 retained snapshots
    "mor_wap_audit" -> ((s, _) => {
      val dir = wapTable(s)
      val rows = MorReader.read(s, dir).agg(count(lit(1)).as("n_rows"))
      val snaps = graft.read.MetaTables.snapshots(s, dir)
        .agg(count(lit(1)).as("n_snapshots"))
      rows.crossJoin(snaps)
    }),

    // SCD2 dimension materialized from the CDC changelog: every snapshot
    // window's net diff folds into (key, valid_from, valid_to) intervals
    // — inserts open versions, the next delete of that key closes them
    // (valid_to = 0 marks the current version). The fold is two
    // aggregates and one key join over metadata-scale changelog windows;
    // no snapshot is ever re-scanned twice.
    "mor_scd2_dim" -> ((s, _) => {
      val dir = scd2Table(s)
      // 0 is the empty pre-create state: the first window (0, s1] yields
      // the initial inserts
      val snaps = 0L +: graft.read.MetaTables.snapshots(s, dir)
        .select("snapshot_id").collect().map(_.getLong(0)).sorted
      val changes = snaps.sliding(2).collect { case Array(a, b) =>
        MorReader.changelogBetween(s, dir, a, b)
          .select(col("product_id"), col("change_kind"), lit(b).as("snap"))
      }.reduce(_ unionByName _)
      val ins = changes.where(col("change_kind") === "insert")
        .select(col("product_id"), col("snap").as("vfrom"))
      val del = changes.where(col("change_kind") === "delete")
        .select(col("product_id").as("d_id"), col("snap").as("dsnap"))
      ins.join(del, col("product_id") === col("d_id") &&
          col("dsnap") > col("vfrom"), "left")
        .groupBy("product_id", "vfrom").agg(min("dsnap").as("vto0"))
        .groupBy(col("vfrom"), coalesce(col("vto0"), lit(0L)).as("vto"))
        .agg(count(lit(1)).as("n_rows"), sum("product_id").as("id_sum"))
        .orderBy("vfrom", "vto")
    }),

    // the health loop END STATE, driver-oracled: after compactDirty(50)
    // on a 60%-dead widget partition, widget is one live-rows-only file
    // with its delete files consumed, and untouched gizmo still declares
    // its original append
    "mor_health_compact" -> ((s, _) => {
      val dir = healthCompacted(s)
      val f = graft.read.MetaTables.files(s, dir)
        .groupBy("partition")
        .agg(count(lit(1)).as("data_files"),
          sum("record_count").as("declared_rows"))
      val d = graft.read.MetaTables.deleteFiles(s, dir)
        .groupBy("partition").agg(count(lit(1)).as("dfiles"))
      f.join(d, Seq("partition"), "left")
        .select(col("partition"), col("data_files"), col("declared_rows"),
          coalesce(col("dfiles"), lit(0L)).as("delete_files"))
        .orderBy("partition")
    }),

    // refs metadata table: the s10ts fixture tags snapshot 6
    "meta_refs" -> ((s, _) =>
      graft.read.MetaTables.refs(s, s10ts(s)).orderBy("name")),

    // history metadata table: commit timeline with parent links, off the
    // deterministic-clock fixture (made_current_at = id*1000)
    "meta_history" -> ((s, _) =>
      graft.read.MetaTables.history(s, s10ts(s)).orderBy("snapshot_id")),

    // all_data_files over the compacted S10: the five pre-compaction
    // 200-row files survive as live=false time-travel surface; the three
    // compacted per-partition files carry the post-MoR live counts
    "meta_all_files" -> ((s, _) =>
      graft.read.MetaTables.allDataFiles(s, s10c(s)).orderBy("file_path")),

    // table-as-stream: the follower-built downstream mirror — initial MoR
    // load + post-compaction increment, rewrites never re-delivered
    "follow_pipeline" -> ((s, _) =>
      MorReader.read(s, followTable(s))
        .agg(count(lit(1)).as("cnt"), sum(col("order_id")).as("id_sum"))),

    // CDC replication: upstream deletes propagate to the replica through
    // the changelog windows (append-only follow would keep all 230 rows)
    "follow_replica" -> ((s, _) =>
      MorReader.read(s, replicaTable(s))
        .agg(count(lit(1)).as("cnt"), sum(col("order_id")).as("id_sum")))
  )

  // SQL reconstruction shared by the S10-derived oracles
  private val s10Rows =
    """WITH ids AS (SELECT range AS id FROM range(0, 1000)),
      |rows_ AS (
      |  SELECT id,
      |    CASE WHEN id < 200 OR (id >= 400 AND id < 600) THEN 'widget'
      |         WHEN (id >= 200 AND id < 400) OR id >= 800 THEN 'gizmo'
      |         ELSE 'gadget' END AS category,
      |    CASE WHEN id < 200 THEN 1 WHEN id < 400 THEN 3 ELSE 5 END AS seq
      |  FROM ids)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "mor_count_golden" ->
      s"""$s10Rows
         |SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_
         |WHERE NOT (category = 'widget' AND id < 30 AND seq < 2)
         |  AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)
         |  AND NOT (id % 200 >= 100 AND seq < 6)
         |  AND NOT (id BETWEEN 50 AND 52)
         |GROUP BY category ORDER BY category""".stripMargin,

    "mor_compact_golden" ->
      s"""$s10Rows
         |SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_
         |WHERE NOT (category = 'widget' AND id < 30 AND seq < 2)
         |  AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)
         |  AND NOT (id % 200 >= 100 AND seq < 6)
         |  AND NOT (id BETWEEN 50 AND 52)
         |GROUP BY category ORDER BY category""".stripMargin,

    "snapshot_scan" ->
      s"""$s10Rows
         |SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_
         |WHERE NOT (category = 'widget' AND id < 30 AND seq < 2)
         |  AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)
         |GROUP BY category ORDER BY category""".stripMargin,

    "sql_tvf_scan" ->
      s"""$s10Rows
         |SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_
         |WHERE NOT (category = 'widget' AND id < 30 AND seq < 2)
         |  AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)
         |GROUP BY category ORDER BY category""".stripMargin,

    "sql_tvf_changes" ->
      s"""$s10Rows,
         |ins AS (
         |  SELECT 'insert' AS change_kind, category, id FROM rows_
         |  WHERE seq > 2
         |    AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)),
         |del AS (
         |  SELECT 'delete' AS change_kind, category, id FROM rows_
         |  WHERE seq < 2 AND NOT (category = 'widget' AND id < 30)
         |    AND category IN ('widget','gizmo') AND id % 10 = 5)
         |SELECT change_kind, category, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(SUM(id) AS BIGINT) AS id_sum
         |FROM (SELECT * FROM ins UNION ALL SELECT * FROM del)
         |GROUP BY change_kind, category ORDER BY change_kind, category""".stripMargin,

    "mor_pos_delete_waves" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 800)),
        |rows_ AS (
        |  SELECT id,
        |    CASE WHEN id < 200 THEN 2019 WHEN id < 600 THEN 2020 ELSE 2021 END
        |      AS order_year
        |  FROM ids)
        |SELECT order_year, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(id) AS BIGINT) AS id_sum
        |FROM rows_
        |WHERE NOT (id < 400 AND id % 10 = 0)
        |  AND NOT (id < 600 AND id % 10 = 3)
        |  AND NOT (id >= 600 AND id % 10 = 6)
        |GROUP BY order_year ORDER BY order_year""".stripMargin,

    "mor_partition_evolution" ->
      """SELECT CAST((id - 600) // 40 AS INTEGER) AS source_id,
        |       CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(MIN(id) AS INTEGER) AS min_id,
        |       CAST(MAX(id) AS INTEGER) AS max_id
        |FROM (SELECT range AS id FROM range(600, 800))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "mor_unpartitioned_deletes" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(id) AS BIGINT) AS id_sum
        |FROM (SELECT range AS id FROM range(0, 400))
        |WHERE NOT (id < 200 AND id % 10 = 0) AND NOT (id % 10 = 3)""".stripMargin,

    "mor_schema_evolution" ->
      """WITH colors AS (SELECT ['black','white','red','orange','yellow',
        |                        'green','blue','purple','brown','gray'] AS cs),
        |rows_ AS (
        |  SELECT range AS id,
        |    CASE WHEN range < 200 THEN 'widget' ELSE 'gizmo' END AS category,
        |    CASE WHEN range >= 200 THEN cs[CAST(range % 10 AS INTEGER) + 1] END
        |      AS color
        |  FROM range(0, 400), colors)
        |SELECT category, color, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_
        |WHERE NOT (category = 'widget' AND id < 30)
        |GROUP BY category, color ORDER BY category, color""".stripMargin,

    "date_arith_created" ->
      s"""$s10Rows,
         |live AS (
         |  SELECT id FROM rows_
         |  WHERE NOT (category = 'widget' AND id < 30 AND seq < 2)
         |    AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)
         |    AND NOT (id % 200 >= 100 AND seq < 6)
         |    AND NOT (id BETWEEN 50 AND 52))
         |SELECT CAST(2022 - (id // 12) AS INTEGER) AS y,
         |       CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(COUNT(DISTINCT 12 - (id % 12)) AS BIGINT) AS n_months
         |FROM live GROUP BY y ORDER BY y""".stripMargin,

    // all 450 live names must be well-formed → well_formed == cnt
    "str_format_name" ->
      s"""$s10Rows,
         |live AS (
         |  SELECT id, category FROM rows_
         |  WHERE NOT (category = 'widget' AND id < 30 AND seq < 2)
         |    AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)
         |    AND NOT (id % 200 >= 100 AND seq < 6)
         |    AND NOT (id BETWEEN 50 AND 52))
         |SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(COUNT(*) AS BIGINT) AS well_formed
         |FROM live GROUP BY category ORDER BY category""".stripMargin,

    "mor_upsert" ->
      """SELECT 'widget' AS category, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(COUNT(DISTINCT id) AS BIGINT) AS n_keys
        |FROM (SELECT range AS id FROM range(0, 250))""".stripMargin,

    "mor_wide_metrics" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(1000 AS BIGINT) AS n_cols
        |FROM (SELECT range AS id FROM range(0, 30))""".stripMargin,

    "mor_partition_prune" ->
      s"""$s10Rows
         |SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_
         |WHERE category = 'widget'
         |  AND NOT (id < 30 AND seq < 2)
         |  AND NOT (id % 10 = 5 AND seq < 4)
         |  AND NOT (id % 200 >= 100 AND seq < 6)
         |  AND NOT (id BETWEEN 50 AND 52)
         |GROUP BY category ORDER BY category""".stripMargin,

    // raw appends of snapshots 3..5 (seq > 2), no delete predicates
    "incremental_append_scan" ->
      s"""$s10Rows
         |SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(SUM(id) AS BIGINT) AS id_sum
         |FROM rows_ WHERE seq > 2
         |GROUP BY category ORDER BY category""".stripMargin,

    // inserts: in-range appends minus the green wave (visible to seq < 4);
    // deletes: seq-1 widget survivors of the id<30 wave that the green
    // wave (snap 4) killed
    "changelog_scan" ->
      s"""$s10Rows,
         |ins AS (
         |  SELECT 'insert' AS change_kind, category, id FROM rows_
         |  WHERE seq > 2
         |    AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)),
         |del AS (
         |  SELECT 'delete' AS change_kind, category, id FROM rows_
         |  WHERE seq < 2 AND NOT (category = 'widget' AND id < 30)
         |    AND category IN ('widget','gizmo') AND id % 10 = 5)
         |SELECT change_kind, category, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(SUM(id) AS BIGINT) AS id_sum
         |FROM (SELECT * FROM ins UNION ALL SELECT * FROM del)
         |GROUP BY change_kind, category ORDER BY change_kind, category""".stripMargin,

    "metrics_file_prune" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(MIN(id) AS INTEGER) AS min_id, CAST(MAX(id) AS INTEGER) AS max_id
        |FROM (SELECT range AS id FROM range(250, 450))
        |WHERE NOT (id % 10 = 7)""".stripMargin,

    // survivors: 0..299 untouched (2·id); matched 300..399 minus the
    // id%10==0 deletes, val 2·id where the update was skipped (id%7==0)
    // else 3·id; unmatched 400..499 insert only when op<>'D' (id%10<>0)
    "mor_merge" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(val AS BIGINT) AS val FROM (
        |  SELECT range AS id, range * 2 AS val FROM range(0, 300)
        |  UNION ALL
        |  SELECT range, CASE WHEN range % 7 = 0 THEN range * 2
        |                     ELSE range * 3 END
        |  FROM range(300, 400) WHERE range % 10 <> 0
        |  UNION ALL
        |  SELECT range, range * 3 FROM range(400, 500) WHERE range % 10 <> 0
        |)""".stripMargin,

    // live = ids 0..199 with id%10 ∉ {0,1}, plus 201 (appended after the
    // %10=1 wave; the later %10=0 wave killed 200)
    "mor_posdelete_compact" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(MIN(id) AS BIGINT) AS min_id, CAST(MAX(id) AS BIGINT) AS max_id
        |FROM (
        |  SELECT range AS id FROM range(0, 200) WHERE range % 10 NOT IN (0, 1)
        |  UNION ALL SELECT 201
        |)""".stripMargin,

    // micros truncation on the Spark side == DuckDB CAST(ts AS TIMESTAMP)
    "mor_day_ingest" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events
        |WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) = DATE '2024-01-15'""".stripMargin,

    // ids 37 and 777 live (val = 7·id); 123 was eq-deleted
    "mor_bucket_prune" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(val) AS BIGINT) AS val_sum,
        |       CAST(MIN(val) AS BIGINT) AS min_val, CAST(MAX(val) AS BIGINT) AS max_val
        |FROM (SELECT 37 * 7 AS val UNION ALL SELECT 777 * 7)""".stripMargin,

    // key_1/key_5 hold the non-sentinel ids of files 1 and 5; key_nope
    // matches nothing
    "metrics_prune_in" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(MIN(id) AS BIGINT) AS min_id, CAST(MAX(id) AS BIGINT) AS max_id
        |FROM (
        |  SELECT range AS id FROM range(100, 200) WHERE range % 100 NOT IN (0, 99)
        |  UNION ALL
        |  SELECT range FROM range(500, 600) WHERE range % 100 NOT IN (0, 99)
        |)""".stripMargin,

    // tok = 'key_3' holds exactly ids 301..398 (300/399 are the aaa/zzz
    // sentinels of file 3)
    "metrics_prune_bloom" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(MIN(id) AS BIGINT) AS min_id, CAST(MAX(id) AS BIGINT) AS max_id
        |FROM (SELECT range AS id FROM range(300, 400))
        |WHERE id % 100 <> 0 AND id % 100 <> 99""".stripMargin,

    "mor_schema_rename" ->
      """SELECT CAST(2019 + (id // 100) AS INTEGER) AS order_year,
        |       CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(id) AS BIGINT) AS key_sum
        |FROM (SELECT range AS id FROM range(0, 200))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "mor_rollback" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(id) AS BIGINT) AS id_sum
        |FROM (SELECT range AS id FROM range(0, 1000))
        |WHERE id % 10 <> 7""".stripMargin,

    "mor_compact_zorder" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(MIN(id) AS INTEGER) AS min_id, CAST(MAX(id) AS INTEGER) AS max_id
        |FROM (SELECT range AS id FROM range(250, 450))
        |WHERE NOT (id % 10 = 7)""".stripMargin,

    "metrics_prune_sorted" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 1000)),
        |r AS (SELECT id, (['black','white','red','orange','yellow','green',
        |                  'blue','purple','brown','gray'])[CAST(id % 10 AS INTEGER) + 1]
        |               AS color
        |      FROM ids)
        |SELECT CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       MIN(color) AS min_color, MAX(color) AS max_color
        |FROM r WHERE color <> 'red' AND color >= 'blue' AND color <= 'gray'""".stripMargin,

    "snapshot_expire_scan" ->
      s"""$s10Rows
         |SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_
         |WHERE NOT (category = 'widget' AND id < 30 AND seq < 2)
         |  AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)
         |  AND NOT (id % 200 >= 100 AND seq < 6)
         |  AND NOT (id BETWEEN 50 AND 52)
         |GROUP BY category ORDER BY category""".stripMargin,

    // one data file per (category, append-seq); file index = per-category
    // rank of the append — the `%02d` probe-until-free naming
    "meta_files" ->
      s"""$s10Rows,
         |g AS (SELECT category, seq, CAST(COUNT(*) AS BIGINT) AS record_count
         |      FROM rows_ GROUP BY category, seq),
         |f AS (SELECT category, seq, record_count,
         |        ROW_NUMBER() OVER (PARTITION BY category ORDER BY seq) - 1 AS idx
         |      FROM g)
         |SELECT 'data/' || category || '/' || category || '-' ||
         |         lpad(CAST(idx AS VARCHAR), 2, '0') || '.parquet' AS file_path,
         |       'category=' || category AS "partition",
         |       CAST(0 AS INTEGER) AS spec_id, CAST(seq AS BIGINT) AS seq,
         |       record_count
         |FROM f ORDER BY file_path""".stripMargin,

    // golden manifest: 3 eq-delete waves (seq 2/4/6) + 1 pos wave (seq 7),
    // one file per touched partition, probe-numbered within the partition
    "meta_delete_files" ->
      """SELECT * FROM (VALUES
        |  ('data/gadget/eqdelete-gadget-00.parquet', 'category=gadget', 'eq', 'product_id', CAST(6 AS BIGINT)),
        |  ('data/gizmo/eqdelete-gizmo-00.parquet',  'category=gizmo',  'eq', 'color',      CAST(4 AS BIGINT)),
        |  ('data/gizmo/eqdelete-gizmo-01.parquet',  'category=gizmo',  'eq', 'product_id', CAST(6 AS BIGINT)),
        |  ('data/widget/delete-widget-00.parquet',  'category=widget', 'pos', '',          CAST(7 AS BIGINT)),
        |  ('data/widget/eqdelete-widget-00.parquet', 'category=widget', 'eq', 'product_id', CAST(2 AS BIGINT)),
        |  ('data/widget/eqdelete-widget-01.parquet', 'category=widget', 'eq', 'color',      CAST(4 AS BIGINT)),
        |  ('data/widget/eqdelete-widget-02.parquet', 'category=widget', 'eq', 'product_id', CAST(6 AS BIGINT))
        |) AS t(file_path, "partition", kind, equality_cols, seq)
        |ORDER BY file_path""".stripMargin,

    // 7 commits: append/eq-del alternating, then the pos-delete wave;
    // committed_at = id*1000 (deterministic fixture clock), operation
    // derived by the writer from the staged state
    "meta_snapshots" ->
      """SELECT CAST(id AS BIGINT) AS snapshot_id, CAST(id AS BIGINT) AS seq,
        |       CAST(0 AS INTEGER) AS schema_v, CAST(0 AS INTEGER) AS spec_id,
        |       CAST(adf AS BIGINT) AS added_data_files,
        |       CAST(adl AS BIGINT) AS added_delete_files,
        |       CAST(rows_ AS BIGINT) AS added_rows,
        |       CAST(0 AS BIGINT) AS removed_data_files,
        |       CAST(id * 1000 AS BIGINT) AS committed_at,
        |       op AS operation
        |FROM (VALUES (1, 1, 0, 200, 'append'), (2, 0, 1, 0, 'delete'),
        |             (3, 1, 0, 200, 'append'), (4, 0, 2, 0, 'delete'),
        |             (5, 3, 0, 600, 'append'), (6, 0, 3, 0, 'delete'),
        |             (7, 0, 1, 0, 'delete'))
        |  AS t(id, adf, adl, rows_, op)
        |ORDER BY snapshot_id""".stripMargin,

    // identical state to snapshot_scan, reached by timestamp instead of id
    "snapshot_ts_scan" ->
      s"""$s10Rows
         |SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_
         |WHERE NOT (category = 'widget' AND id < 30 AND seq < 2)
         |  AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)
         |GROUP BY category ORDER BY category""".stripMargin,

    // snapshot 6 = all three eq-delete waves applied, pos deletes not yet
    "tag_scan" ->
      s"""$s10Rows
         |SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       CAST(SUM(id) AS BIGINT) AS id_sum
         |FROM rows_
         |WHERE NOT (category = 'widget' AND id < 30 AND seq < 2)
         |  AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)
         |  AND NOT (id % 200 >= 100 AND seq < 6)
         |GROUP BY category ORDER BY category""".stripMargin,

    "meta_refs" ->
      """SELECT 'before_pos_deletes' AS name, 'tag' AS type,
        |       CAST(6 AS BIGINT) AS snapshot_id""".stripMargin,

    // downstream mirror: ids 0..199 minus the pre-follow eq-delete
    // (%10==7), plus the appended 200..249 — exactly once each
    "follow_pipeline" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 250))
        |SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(id) AS BIGINT) AS id_sum
        |FROM ids WHERE NOT (id < 200 AND id % 10 = 7)""".stripMargin,

    // replica: 0..199 minus %10==7, minus the propagated id<20 delete,
    // plus 200..249 — the live upstream state, mirrored
    "follow_replica" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 250))
        |SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(id) AS BIGINT) AS id_sum
        |FROM ids WHERE NOT (id < 200 AND id % 10 = 7) AND id >= 20""".stripMargin,

    // 7 linear commits, deterministic clock id*1000, parent = previous id
    "meta_history" ->
      """SELECT CAST(id * 1000 AS BIGINT) AS made_current_at,
        |       CAST(id AS BIGINT) AS snapshot_id,
        |       CAST(CASE WHEN id = 1 THEN NULL ELSE id - 1 END AS BIGINT)
        |         AS parent_id,
        |       TRUE AS is_current_ancestor
        |FROM (SELECT range AS id FROM range(1, 8))
        |ORDER BY snapshot_id""".stripMargin,

    // five original 200-row files (live=false after the rewrite) plus one
    // compacted file per partition at seq 8 carrying the MoR live counts
    "meta_all_files" ->
      s"""$s10Rows,
         |live AS (
         |  SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt FROM rows_
         |  WHERE NOT (category = 'widget' AND id < 30 AND seq < 2)
         |    AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)
         |    AND NOT (id % 200 >= 100 AND seq < 6)
         |    AND NOT (id BETWEEN 50 AND 52)
         |  GROUP BY category),
         |orig AS (
         |  SELECT category, CAST(seq AS BIGINT) AS seq, idx,
         |         CAST(200 AS BIGINT) AS record_count, FALSE AS live
         |  FROM (VALUES ('widget', 1, 0), ('gizmo', 3, 0), ('widget', 5, 1),
         |               ('gizmo', 5, 1), ('gadget', 5, 0)) AS t(category, seq, idx)),
         |comp AS (
         |  SELECT l.category, CAST(8 AS BIGINT) AS seq, x.idx,
         |         l.cnt AS record_count, TRUE AS live
         |  FROM live l
         |  JOIN (VALUES ('widget', 2), ('gizmo', 2), ('gadget', 1))
         |    AS x(category, idx) ON l.category = x.category),
         |allf AS (SELECT * FROM orig UNION ALL SELECT * FROM comp)
         |SELECT 'data/' || category || '/' || category || '-' ||
         |         lpad(CAST(idx AS VARCHAR), 2, '0') || '.parquet' AS file_path,
         |       'category=' || category AS "partition",
         |       CAST(0 AS INTEGER) AS spec_id, seq, record_count, live
         |FROM allf ORDER BY file_path""".stripMargin,

    // delete-unaware manifest rollup (Iceberg partitions-table semantics)
    "meta_partitions" ->
      s"""$s10Rows
         |SELECT 'category=' || category AS "partition",
         |       CAST(COUNT(DISTINCT seq) AS BIGINT) AS file_count,
         |       CAST(COUNT(*) AS BIGINT) AS record_count
         |FROM rows_ GROUP BY category ORDER BY "partition"""".stripMargin,

    // identical to meta_partitions — the TVF must answer exactly what the
    // Scala MetaTables surface answers
    "sql_tvf_meta" ->
      s"""$s10Rows
         |SELECT 'category=' || category AS "partition",
         |       CAST(COUNT(DISTINCT seq) AS BIGINT) AS file_count,
         |       CAST(COUNT(*) AS BIGINT) AS record_count
         |FROM rows_ GROUP BY category ORDER BY "partition"""".stripMargin,

    "mor_wap_audit" ->
      """SELECT CAST((SELECT COUNT(*) FROM range(0, 130)) AS BIGINT) AS n_rows,
        |       CAST(2 AS BIGINT) AS n_snapshots""".stripMargin,

    // widget clean: manifest fold (100, metadata-only); gizmo: 100 minus
    // the 20 eq-deleted ids, via the scan; all = 180 via the scan
    "mor_fast_count" ->
      """SELECT * FROM (VALUES
        |  ('all', CAST(180 AS BIGINT), false),
        |  ('gizmo', CAST(80 AS BIGINT), false),
        |  ('widget', CAST(100 AS BIGINT), true))
        |  AS t(scope, n_rows, metadata_only)
        |ORDER BY scope""".stripMargin,

    // widget ids 0..99 clean (metadata envelope fold); gizmo 100..199
    // minus %5==0 via the scan (101..199); all = 0..199 via the scan
    "mor_fast_minmax" ->
      """SELECT * FROM (VALUES
        |  ('all', '0', '199', false),
        |  ('gizmo', '101', '199', false),
        |  ('widget', '0', '99', true))
        |  AS t(scope, min_id, max_id, metadata_only)
        |ORDER BY scope""".stripMargin,

    // 110 physical rows; 28 dead by converted eq (18 still-dead %5 + 10
    // replaced upsert originals), 71 by the later eq: 81 live,
    // sum = 4950 - 950 + 85 - 71
    "mor_eq_convert" ->
      """SELECT CAST(81 AS BIGINT) AS live_cnt,
        |       CAST(4014 AS BIGINT) AS id_sum,
        |       1 AS n_vectors, 1 AS n_eq_files,
        |       CAST(28 AS BIGINT) AS dv_cardinality""".stripMargin,

    // fresh append file: base id 100, 10 rows; 3 rewrite files: 90 rows,
    // ids materialized in-file (manifest reports -1)
    "meta_lineage_files" ->
      """SELECT * FROM (VALUES
        |  (FALSE, CAST(1 AS BIGINT), CAST(10 AS BIGINT),
        |   CAST(100 AS BIGINT), CAST(100 AS BIGINT)),
        |  (TRUE, CAST(3 AS BIGINT), CAST(90 AS BIGINT),
        |   CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)))
        |  AS t(lineage_in_file, n_files, declared_rows, min_frid, max_frid)
        |ORDER BY lineage_in_file""".stripMargin,

    // band [100,199] over the sorted layout; 4 disjoint files
    "mor_write_ordered" ->
      """SELECT CAST(100 AS BIGINT) AS cnt, CAST(14950 AS BIGINT) AS id_sum,
        |       4 AS n_files, 0 AS overlapping_pairs""".stripMargin,

    // 55 live: 0..19, 60..89, 95..99; sum = 4950 - 1580 - 460; the two
    // covered files dropped metadata-only, one tombstone for [90,94]
    "mor_metadata_delete" ->
      """SELECT CAST(55 AS BIGINT) AS live_cnt,
        |       CAST(2910 AS BIGINT) AS id_sum,
        |       3 AS n_files, 1 AS n_tombstones""".stripMargin,

    // same end state as mor_row_lineage via SQL; survivors keep their
    // producing seq 1 through the rewrite, the fresh append stamps seq 4
    "sql_tvf_lineage" ->
      """SELECT CAST(100 AS BIGINT) AS cnt, CAST(5850 AS BIGINT) AS id_sum,
        |       CAST(100 AS BIGINT) AS n_stable,
        |       CAST(4 AS BIGINT) AS max_seq""".stripMargin,

    "sql_tvf_stats" ->
      """SELECT * FROM (VALUES
        |  ('category', CAST(1 AS BIGINT), CAST(80 AS BIGINT), FALSE),
        |  ('color', CAST(8 AS BIGINT), CAST(80 AS BIGINT), FALSE),
        |  ('product_id', CAST(80 AS BIGINT), CAST(80 AS BIGINT), FALSE))
        |  AS t(col_name, ndv, row_count, stale)
        |ORDER BY col_name""".stripMargin,

    // 80 live after the %5 delete; colors black/green die with ids ≡0
    // (pmod 0 and 5), leaving 8 colors spanning blue..yellow
    "meta_stats" ->
      """SELECT * FROM (VALUES
        |  ('category', CAST(1 AS BIGINT), CAST(0 AS BIGINT),
        |   'widget', 'widget', CAST(80 AS BIGINT), FALSE),
        |  ('color', CAST(8 AS BIGINT), CAST(0 AS BIGINT),
        |   'blue', 'yellow', CAST(80 AS BIGINT), FALSE),
        |  ('product_id', CAST(80 AS BIGINT), CAST(0 AS BIGINT),
        |   '1', '99', CAST(80 AS BIGINT), FALSE))
        |  AS t(col_name, ndv, null_count, min_v, max_v, row_count, stale)
        |ORDER BY col_name""".stripMargin,

    // evens widget / odds gizmo, ids<20 deleted: 40+40 live;
    // widget sum = evens 20..98 = 2450-90; gizmo = odds 21..99 = 2500-100;
    // compaction leaves one file per surviving (category, bucket) tuple
    "mor_multi_spec" ->
      """SELECT * FROM (VALUES
        |  ('gizmo', CAST(40 AS BIGINT), CAST(2400 AS BIGINT), 4, 4),
        |  ('widget', CAST(40 AS BIGINT), CAST(2360 AS BIGINT), 4, 4))
        |  AS t(category, cnt, id_sum, n_two_key_files, n_files)
        |ORDER BY category""".stripMargin,

    // 100 appended, 15 dead via the chained vector (ids<10 + 20..24):
    // 85 live, id_sum = 4950 - 45 - 110
    "mor_dv_writes" ->
      """SELECT CAST(85 AS BIGINT) AS live_cnt,
        |       CAST(4795 AS BIGINT) AS id_sum,
        |       1 AS n_vectors, 0 AS n_tombstone_files,
        |       CAST(15 AS BIGINT) AS dv_cardinality""".stripMargin,

    // 210 appended; dead = ids<10 (folded into the vector, cardinality 10)
    // + band 20..24 + eq 150 → 194 live; id_sum = 209*210/2 - 45 - 110 - 150
    "mor_delete_vectors" ->
      """SELECT CAST(194 AS BIGINT) AS live_cnt,
        |       CAST(21640 AS BIGINT) AS id_sum,
        |       1 AS n_vectors,
        |       CAST(10 AS BIGINT) AS dv_cardinality""".stripMargin,

    // ids 0..49 default 'active' (sum 1225); 50..99 even 'fresh'
    // (sum 25*74=1850), odd real null (sum 1875)
    "mor_schema_default" ->
      """SELECT * FROM (VALUES
        |  ('(null)', CAST(25 AS BIGINT), CAST(1875 AS BIGINT)),
        |  ('active', CAST(50 AS BIGINT), CAST(1225 AS BIGINT)),
        |  ('fresh', CAST(25 AS BIGINT), CAST(1850 AS BIGINT)))
        |  AS t(status, cnt, id_sum)
        |ORDER BY status""".stripMargin,

    // 110 assigned, 10 dead (ids 10..19): 100 live, sum = 5995 - 145
    "mor_row_lineage" ->
      """SELECT CAST(100 AS BIGINT) AS cnt, CAST(100 AS BIGINT) AS n_ids,
        |       CAST(5850 AS BIGINT) AS id_sum, CAST(109 AS BIGINT) AS max_id,
        |       CAST(100 AS BIGINT) AS n_stable""".stripMargin,

    // probes: 137 pre-index hit, 140 deleted (0), 205 refresh-indexed hit,
    // 99999 absent
    "mor_value_index" ->
      """SELECT * FROM (VALUES
        |  ('137', CAST(1 AS BIGINT), CAST(137 AS BIGINT)),
        |  ('140', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('205', CAST(1 AS BIGINT), CAST(205 AS BIGINT)),
        |  ('99999', CAST(0 AS BIGINT), CAST(0 AS BIGINT)))
        |  AS t(probe, n_rows, id_sum)
        |ORDER BY probe""".stripMargin,

    // ids 0..99 widget (fork), 100..149 gizmo (branch append); the branch
    // eq-delete kills widget ids %10==0 only (partition-scoped)
    "mor_branch_write" ->
      """SELECT
        |  CAST((SELECT COUNT(*) FROM range(0, 150) t(i)
        |        WHERE NOT (i < 100 AND i % 10 = 0)) AS BIGINT) AS n_main,
        |  CAST((SELECT SUM(i) FROM range(0, 150) t(i)
        |        WHERE NOT (i < 100 AND i % 10 = 0)) AS BIGINT) AS id_sum,
        |  CAST((SELECT COUNT(*) FROM range(0, 100)) AS BIGINT) AS n_at_fork,
        |  CAST((SELECT COUNT(*) FROM range(0, 150) t(i)
        |        WHERE NOT (i < 100 AND i % 10 = 0)) AS BIGINT) AS n_branch""".stripMargin,

    "mor_scd2_dim" ->
      """SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS vfrom, CAST(0 AS BIGINT) AS vto,
        |         CAST((SELECT COUNT(*) FROM range(0, 50)) AS BIGINT) AS n_rows,
        |         CAST((SELECT SUM(range) FROM range(0, 50)) AS BIGINT) AS id_sum
        |  UNION ALL
        |  SELECT 1, 2,
        |         CAST((SELECT COUNT(*) FROM range(50, 100)) AS BIGINT),
        |         CAST((SELECT SUM(range) FROM range(50, 100)) AS BIGINT)
        |  UNION ALL
        |  SELECT 2, 0,
        |         CAST((SELECT COUNT(*) FROM range(50, 150)) AS BIGINT),
        |         CAST((SELECT SUM(range) FROM range(50, 150)) AS BIGINT))
        |ORDER BY vfrom, vto""".stripMargin,

    "mor_health_compact" ->
      """SELECT * FROM (
        |  SELECT 'category=gizmo' AS "partition", CAST(1 AS BIGINT) AS data_files,
        |         CAST((SELECT COUNT(*) FROM range(100, 200)) AS BIGINT) AS declared_rows,
        |         CAST(0 AS BIGINT) AS delete_files
        |  UNION ALL
        |  SELECT 'category=widget', CAST(1 AS BIGINT),
        |         CAST((SELECT COUNT(*) FROM range(0, 100) t(id) WHERE id % 10 >= 6) AS BIGINT),
        |         CAST(0 AS BIGINT))
        |ORDER BY "partition"""".stripMargin,

    "meta_health" ->
      s"""$s10Rows,
         |decl AS (SELECT 'category=' || category AS part,
         |           CAST(COUNT(DISTINCT seq) AS BIGINT) AS data_files,
         |           CAST(COUNT(*) AS BIGINT) AS declared_rows
         |         FROM rows_ GROUP BY category),
         |lv AS (SELECT 'category=' || category AS part,
         |         CAST(COUNT(*) AS BIGINT) AS live_rows
         |       FROM rows_
         |       WHERE NOT (category = 'widget' AND id < 30 AND seq < 2)
         |         AND NOT (category IN ('widget','gizmo') AND id % 10 = 5 AND seq < 4)
         |         AND NOT (id % 200 >= 100 AND seq < 6)
         |         AND NOT (id BETWEEN 50 AND 52)
         |       GROUP BY category),
         |dels AS (SELECT * FROM (VALUES
         |    ('category=widget', CAST(4 AS BIGINT)),
         |    ('category=gizmo',  CAST(2 AS BIGINT)),
         |    ('category=gadget', CAST(1 AS BIGINT))) t(part, delete_files))
         |SELECT decl.part AS "partition", data_files,
         |       COALESCE(delete_files, 0) AS delete_files, declared_rows,
         |       COALESCE(live_rows, 0) AS live_rows,
         |       (declared_rows - COALESCE(live_rows, 0)) * 100 // declared_rows
         |         AS dead_pct
         |FROM decl LEFT JOIN dels ON decl.part = dels.part
         |LEFT JOIN lv ON decl.part = lv.part
         |ORDER BY "partition"""".stripMargin
  )
}
