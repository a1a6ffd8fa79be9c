package graft

import org.apache.spark.sql.functions._

import graft.meta.SnapshotLog
import graft.read.MorReader
import graft.scenarios.Scenarios
import graft.table.GraftTableGenerator

/** Deletion vectors (Iceberg v3): folding positional-delete files into
  * per-file bitmaps must be a pure physical rewrite — row-identical reads,
  * changelog-invisible, time-travel-transparent — while later deletes
  * union on top and a second fold re-absorbs everything. */
class DeleteVectorSpec extends SparkSpec {

  private def fresh(tag: String): GraftTableGenerator = {
    val wh = java.nio.file.Files.createTempDirectory(s"dv_$tag").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
      .append(Seq("widget"), graft.gen.Bundles.products(), 2, 50).commit()
      .append(Seq("gizmo"), graft.gen.Bundles.products(), 2, 50).commit()
    g // widget ids 0..99, gizmo 100..199
  }

  private def liveIds(g: GraftTableGenerator): Set[Int] =
    g.read.select("product_id").collect().map(_.getInt(0)).toSet

  test("fold is row-identical; one vector per partition; cardinality matches") {
    val g = fresh("fold")
    // waves across both partitions, word-boundary-crossing position bands
    g.positionalDelete(Seq("widget"), col("product_id") % 7 === 0).commit()
    g.positionalDelete(col("product_id") >= 60 && col("product_id") < 70).commit()
    g.positionalDelete(Seq("gizmo"), col("product_id") % 9 === 1).commit()
    val before = liveIds(g)
    val deadCount = 200 - before.size
    g.rewritePositionDeletesToDVs().commit()
    assert(liveIds(g) == before, "fold must not change the live set")
    val entries = SnapshotLog(g.tableDir.toString).load().mainOnly.deleteFiles
    assert(entries.nonEmpty && entries.forall(_.kind == "dv"),
      s"all tombstone files folded, got kinds ${entries.map(_.kind)}")
    assert(entries.groupBy(_.partition).forall(_._2.size == 1),
      "at most one vector per partition")
    val card = spark.read.parquet(entries.map(_.path): _*)
      .agg(sum("cardinality")).collect()(0).getLong(0)
    assert(card == deadCount, s"vector cardinality $card != dead $deadCount")
  }

  test("later deletes union on top; a second fold re-absorbs them") {
    val g = fresh("union")
    g.positionalDelete(Seq("widget"), col("product_id") < 10).commit()
    g.rewritePositionDeletesToDVs().commit()
    // new tombstones AND an eq delete after the fold both still apply
    g.positionalDelete(Seq("widget"),
      col("product_id") >= 20 && col("product_id") < 25).commit()
    g.equalityDelete(Seq("gizmo"), col("product_id") === 150,
      Seq("product_id")).commit()
    val expect = (0 until 200).toSet -- (0 until 10) -- (20 until 25) - 150
    assert(liveIds(g) == expect)
    g.rewritePositionDeletesToDVs().commit() // folds new pos + old dv
    assert(liveIds(g) == expect, "second fold must be a no-op logically")
    val entries = SnapshotLog(g.tableDir.toString).load().mainOnly.deleteFiles
    val (dv, other) = entries.partition(_.kind == "dv")
    assert(dv.count(_.partition == Map("category" -> "widget")) == 1,
      "widget's two generations merged into one vector")
    assert(other.forall(_.kind == "eq"), "eq deletes are untouched by the fold")
    // the merged vector's bitmap carries both generations
    val widgetDv = dv.filter(_.partition == Map("category" -> "widget"))
    val card = spark.read.parquet(widgetDv.map(_.path): _*)
      .agg(sum("cardinality")).collect()(0).getLong(0)
    assert(card == 15, s"merged widget vector cardinality $card != 15")
  }

  test("fold is changelog-invisible and time-travel-transparent") {
    val g = fresh("cdc")
    g.positionalDelete(Seq("widget"), col("product_id") < 5).commit() // snap 3
    val preFold = SnapshotLog(g.tableDir.toString).lastSnapshotId
    g.rewritePositionDeletesToDVs().commit() // snap 4, operation=replace
    val postFold = SnapshotLog(g.tableDir.toString).lastSnapshotId
    val dir = g.tableDir.toString
    assert(MorReader.changelogBetween(spark, dir, preFold, postFold).count() == 0,
      "a fold is a rewrite: no changelog events")
    // time travel to the pre-fold snapshot still plans the tombstone files
    val preState = SnapshotLog(dir).load().mainOnly.asOf(preFold)
    assert(preState.deleteFiles.forall(_.kind == "pos"),
      "historical state keeps the original tombstones")
    assert(MorReader.readAt(spark, dir, preFold)
      .select("product_id").collect().map(_.getInt(0)).toSet ==
      (5 until 200).toSet)
  }

  test("dv application is an explicit BroadcastHashJoin, threshold-independent") {
    val g = fresh("bhj")
    g.positionalDelete(Seq("widget"), col("product_id") < 10).commit()
    g.rewritePositionDeletesToDVs().commit()
    // size-based auto-broadcast OFF: only the explicit hint can save the
    // join — without it this silently degrades to a SortMergeJoin that
    // shuffles the entire fact scan on file_path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = g.read.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("_dv_fp")),
        s"dv application must broadcast the per-file bitmap side:\n$plan")
      assert(!plan.linesIterator.exists(l =>
        l.contains("SortMergeJoin") && l.contains("_dv_fp")),
        s"dv application must never sort-merge on file_path:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("vector application replaces the anti-join: no LeftAnti in the plan") {
    val g = fresh("plan")
    g.positionalDelete(Seq("widget"), col("product_id") < 10).commit()
    g.rewritePositionDeletesToDVs().commit()
    val plan = g.read.queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"),
      s"dv-only table must not anti-join tombstones:\n$plan")
    // delete-affected scopes still force fastCount's exact fallback
    val (n, metaOnly) = MorReader.fastCount(spark, g.tableDir.toString,
      Map("category" -> Set("widget")))
    assert(!metaOnly && n == 90L)
    val (z, zMeta) = MorReader.fastCount(spark, g.tableDir.toString,
      Map("category" -> Set("gizmo")))
    assert(zMeta && z == 100L, "untouched partition keeps the manifest path")
  }

  test("native vector writes: no tombstone file, merged generation chain") {
    val g = fresh("native")
    g.vectorDeletes(true)
    g.positionalDelete(Seq("widget"), col("product_id") < 10).commit()
    g.positionalDelete(Seq("widget"),
      col("product_id") >= 20 && col("product_id") < 25).commit()
    val entries = SnapshotLog(g.tableDir.toString).load().mainOnly.deleteFiles
    assert(entries.size == 1 && entries.head.kind == "dv",
      s"two native deletes must chain into ONE vector, got " +
        s"${entries.map(e => (e.kind, e.partition))}")
    val card = spark.read.parquet(entries.head.path)
      .agg(sum("cardinality")).collect()(0).getLong(0)
    assert(card == 15)
    assert(liveIds(g) == (0 until 200).toSet -- (0 until 10) -- (20 until 25))
    // time travel between the two deletes sees only the first generation
    val mid = SnapshotLog(g.tableDir.toString).load().mainOnly
      .snapshots.dropRight(1).last.id
    assert(MorReader.readAt(spark, g.tableDir.toString, mid)
      .count() == 190)
  }

  test("two native deletes in ONE transaction still leave one vector row set") {
    val g = fresh("txn")
    g.vectorDeletes(true)
    g.positionalDelete(Seq("widget"), col("product_id") < 5)
      .positionalDelete(Seq("widget"), col("product_id") === 7)
      .commit()
    val entries = SnapshotLog(g.tableDir.toString).load().mainOnly.deleteFiles
    assert(entries.size == 1 && entries.head.kind == "dv")
    val rows = spark.read.parquet(entries.head.path)
    assert(rows.select("file_path").distinct().count() == rows.count(),
      "one bitmap row per data file — staged generations merged")
    assert(liveIds(g) == (0 until 200).toSet -- (0 until 5) - 7)
  }

  test("native vectors and classic tombstones compose across commits") {
    val g = fresh("mixed")
    g.vectorDeletes(true)
    g.positionalDelete(Seq("widget"), col("product_id") < 5).commit()
    g.vectorDeletes(false)
    g.positionalDelete(Seq("widget"), col("product_id") === 30).commit()
    assert(liveIds(g) == (0 until 200).toSet -- (0 until 5) - 30)
    g.rewritePositionDeletesToDVs().commit() // fold absorbs the straggler
    val entries = SnapshotLog(g.tableDir.toString).load().mainOnly.deleteFiles
    assert(entries.forall(_.kind == "dv") &&
      entries.count(_.partition == Map("category" -> "widget")) == 1)
    assert(liveIds(g) == (0 until 200).toSet -- (0 until 5) - 30)
  }

  test("equality-delete conversion: row-identical, eq files gone, strict-seq preserved") {
    val g = fresh("eqconv")
    g.equalityDelete(Seq("widget"), col("product_id") % 5 === 0,
      Seq("product_id")).commit()
    // upsert re-adds 40..49 at a higher seq (40 and 45 come back to life)
    val incoming = graft.gen.Bundles.products()
      .frame(spark, 40, 10, Some("widget"), Scenarios.ProductsSchema)
    g.upsert(incoming, Seq("product_id")).commit()
    val before = liveIds(g)
    g.rewriteEqualityDeletes().commit()
    assert(liveIds(g) == before, "conversion must not change the live set")
    val entries = SnapshotLog(g.tableDir.toString).load().mainOnly.deleteFiles
    assert(entries.forall(_.kind == "dv"),
      s"all eq files converted, got kinds ${entries.map(_.kind)}")
    // the kill set was exact: 18 still-dead %5 rows + 10 upsert-replaced
    // old versions (40/45's old rows counted once each)
    val card = spark.read.parquet(entries.map(_.path): _*)
      .agg(sum("cardinality")).collect()(0).getLong(0)
    assert(card == 28, s"expected 28 converted positions, got $card")
    // a FUTURE eq delete still composes on top of the vectors
    g.equalityDelete(Seq("gizmo"), col("product_id") === 150,
      Seq("product_id")).commit()
    assert(liveIds(g) == before - 150)
  }

  test("conversion of a dropped-key eq delete (S11 shape) stays exact") {
    val g = fresh("eqdrop")
    g.equalityDelete(Seq("widget"), col("color") === "black",
      Seq("color")).commit()
    g.updateSchema(Nil, Seq("color")) // the eq KEY column is dropped
    val before = liveIds(g)
    g.rewriteEqualityDeletes().commit()
    assert(liveIds(g) == before,
      "field-id key resolution must survive the conversion")
    assert(SnapshotLog(g.tableDir.toString).load().mainOnly
      .deleteFiles.forall(_.kind == "dv"))
  }

  test("racing writers: native vector delete beats a stale fold — retry re-stages exactly") {
    val g = fresh("race")
    g.positionalDelete(Seq("widget"), col("product_id") < 5).commit()
    // maintenance writer attaches BEFORE the ingest writer's next commit
    val gMaint = new GraftTableGenerator(spark,
      g.tableDir.getParent.toString, "t").open()
    // ingest writer lands a native vector delete first
    g.vectorDeletes(true)
    g.positionalDelete(Seq("widget"),
      col("product_id") >= 20 && col("product_id") < 25).commit()
    // the stale maintenance fold must conflict, refresh, and re-stage
    // against the NEW state (vector generations merge, nothing lost)
    gMaint.commitWithRetry() { w => w.rewritePositionDeletesToDVs() }
    val entries = SnapshotLog(g.tableDir.toString).load().mainOnly.deleteFiles
    assert(entries.forall(_.kind == "dv"))
    assert(entries.count(_.partition == Map("category" -> "widget")) == 1,
      "post-race: exactly one vector for the partition")
    val rows = spark.read.parquet(entries.map(_.path): _*)
    assert(rows.select("file_path").distinct().count() == rows.count(),
      "per-file uniqueness holds through the retry")
    assert(liveIds(g) == (0 until 200).toSet -- (0 until 5) -- (20 until 25))
  }

  test("compaction drops the vector with the other delete files") {
    val g = fresh("compact")
    g.positionalDelete(Seq("widget"), col("product_id") < 10).commit()
    g.rewritePositionDeletesToDVs().commit()
    val before = liveIds(g)
    g.compact().commit()
    assert(liveIds(g) == before)
    assert(SnapshotLog(g.tableDir.toString).load().mainOnly.deleteFiles.isEmpty,
      "compaction materializes survivors; vectors are consumed")
  }
}
