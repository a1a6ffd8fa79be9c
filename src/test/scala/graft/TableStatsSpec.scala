package graft

import org.apache.spark.sql.functions._

import graft.meta.TableStats
import graft.scenarios.Scenarios
import graft.table.GraftTableGenerator

/** ANALYZE TABLE: NDV exactness at sparse cardinalities, MoR-merged
  * inputs (dead rows never counted), the staleness contract, and the
  * persisted round-trip. */
class TableStatsSpec extends SparkSpec {

  private def fresh(tag: String): GraftTableGenerator = {
    val wh = java.nio.file.Files.createTempDirectory(s"ts_$tag").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
      .append(Seq("widget"), graft.gen.Bundles.products(), 1, 100).commit()
    g
  }

  test("stats are computed over the MoR-merged live rows, sparse-exact") {
    val g = fresh("exact")
    g.equalityDelete(Seq("widget"), col("product_id") % 5 === 0,
      Seq("product_id")).commit()
    val s = g.analyze(Seq("product_id", "color", "category"))
    assert(s.rowCount == 80)
    val by = s.cols.toMap
    assert(by("product_id").ndv == 80 && by("product_id").min == Some("1") &&
      by("product_id").max == Some("99"))
    assert(by("color").ndv == 8, "colors black/green die with ids ≡ 0 (mod 5)")
    assert(by("category").ndv == 1)
    assert(s.cols.forall(_._2.nulls == 0))
  }

  test("stale flips when the head advances; re-analyze freshens") {
    val g = fresh("stale")
    g.analyze(Seq("product_id"))
    assert(!TableStats.frame(spark, g.tableDir.toString)
      .select("stale").head().getBoolean(0))
    g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit()
    assert(TableStats.frame(spark, g.tableDir.toString)
      .select("stale").head().getBoolean(0),
      "a commit past the stats snapshot marks them stale")
    val s2 = g.analyze(Seq("product_id"))
    assert(s2.rowCount == 110)
    assert(!TableStats.frame(spark, g.tableDir.toString)
      .select("stale").head().getBoolean(0))
  }

  test("fresh stats put a delete-bearing dim table on the broadcast path") {
    val g = fresh("bcast")
    g.equalityDelete(Seq("widget"), col("product_id") % 5 === 0,
      Seq("product_id")).commit() // composed MoR plan: scan + anti-join
    val fact = spark.range(0, 10000)
      .select((col("id") % 100).cast("int").as("product_id"),
        col("id").as("v"))
    def planOf(): String =
      fact.join(graft.read.MorReader.readHinted(spark, g.tableDir.toString,
          Seq("product_id", "color")), Seq("product_id"))
        .queryExecution.executedPlan.toString
    // size-based auto-broadcast off: only OUR stats hint can broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the MoR plan's INTERNAL metadata joins are always broadcast;
      // the FACT-dim join is the one keyed on product_id
      def factJoinBroadcast(): Boolean =
        planOf().contains("BroadcastHashJoin [product_id")
      assert(!factJoinBroadcast(),
        "no stats: readHinted must behave exactly like read")
      g.analyze(Seq("product_id"))
      assert(factJoinBroadcast(),
        "fresh small-count stats must broadcast the dim side")
      // stale stats (head advanced) must NOT hint — they could
      // under-estimate a since-grown table
      g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit()
      assert(!factJoinBroadcast(),
        "stale stats must not drive an unsafe broadcast")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("history expiry sweeps superseded stats generations, keeps the newest") {
    val g = fresh("expire")
    g.analyze(Seq("product_id"))
    g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit()
    val s2 = g.analyze(Seq("product_id"))
    g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit()
    g.expireSnapshots(1)
    val left = java.nio.file.Files.list(
      g.tableDir.resolve("metadata")).iterator()
    val stats = scala.jdk.CollectionConverters.IteratorHasAsScala(left)
      .asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("stats-") && n.endsWith(".json")).toSeq
    assert(stats == Seq(s"stats-${s2.snapshotId}.json"),
      s"only the newest stats generation survives expiry, got $stats")
    assert(TableStats.read(g.tableDir.toString).contains(s2))
  }

  test("persisted round-trip preserves every field; newest file wins") {
    val g = fresh("rt")
    val written = g.analyze(Seq("product_id", "name"))
    val loaded = TableStats.read(g.tableDir.toString)
    assert(loaded.contains(written))
    g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit()
    val w2 = g.analyze(Seq("product_id", "name"))
    assert(TableStats.read(g.tableDir.toString).contains(w2),
      "the newer stats file supersedes")
  }
}
