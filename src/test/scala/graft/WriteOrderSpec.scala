package graft

import org.apache.spark.sql.functions._

import graft.meta.SnapshotLog
import graft.read.MorReader
import graft.scenarios.Scenarios
import graft.table.GraftTableGenerator

/** Table write order (Iceberg write.sort-order): sorted ingest yields
  * non-overlapping per-file envelopes from the FIRST write, so range
  * reads prune without a compactSorted rewrite; open()ed writers inherit
  * the order; unsorted tables are unaffected. */
class WriteOrderSpec extends SparkSpec {

  private def envelopes(dir: String, fid: Int): Seq[(Long, Long)] =
    SnapshotLog(dir).load().mainOnly.dataFiles
      .map(_.metrics(fid)).map(m => (m.min.get.toLong, m.max.get.toLong))

  private def overlaps(es: Seq[(Long, Long)]): Int =
    es.combinations(2).count { case Seq((a1, a2), (b1, b2)) =>
      a1 <= b2 && b1 <= a2 }

  test("bulk append under a write order produces disjoint file envelopes") {
    val wh = java.nio.file.Files.createTempDirectory("wo_bulk").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.OrdersSchema, Nil)
    g.writeOrdered("order_id")
    // adversarial input: ids arrive SHUFFLED (hash-scrambled order)
    val shuffled = graft.gen.Bundles.ordersUnpartitioned()
      .frame(spark, 0, 400, None, Scenarios.OrdersSchema)
      .orderBy(xxhash64(col("order_id")))
    g.appendBulk(shuffled, 4).commit()
    val dir = g.tableDir.toString
    val fid = SnapshotLog(dir).load().mainOnly.schema.fieldId("order_id")
    val es = envelopes(dir, fid)
    assert(es.size == 4 && overlaps(es) == 0,
      s"range layout must give disjoint envelopes, got $es")
    // a band read now prunes: far fewer than all 4 files planned
    val before = MorReader.dataFilesPlanned.get()
    val n = MorReader.readRange(spark, dir,
      Map("order_id" -> MorReader.ColRange(Some("100"), Some("199")))).count()
    val planned = MorReader.dataFilesPlanned.get() - before
    assert(n == 100)
    assert(planned <= 2, s"pruning must skip disjoint files, planned $planned")
  }

  test("per-file appends sort within each file; order survives open()") {
    val wh = java.nio.file.Files.createTempDirectory("wo_file").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
    g.writeOrdered("weight")
    g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 50).commit()
    val dir = g.tableDir.toString
    // rows inside the file are physically sorted by weight
    val entry = SnapshotLog(dir).load().mainOnly.dataFiles.head
    val w = spark.read.parquet(entry.path).select("weight")
      .collect().map(_.getDouble(0)).toSeq
    assert(w == w.sorted, "file content must follow the declared order")
    // a second writer inherits the persisted order
    val g2 = new GraftTableGenerator(spark, wh, "t").open()
    g2.appendData(graft.gen.Bundles.products()
      .frame(spark, 50, 50, Some("widget"), Scenarios.ProductsSchema)).commit()
    val newest = SnapshotLog(dir).load().mainOnly.dataFiles.map(_.path).sorted.last
    val w2 = spark.read.parquet(newest).select("weight")
      .collect().map(_.getDouble(0)).toSeq
    assert(w2 == w2.sorted, "open()ed writers must honor the write order")
  }

  test("no declared order: appends unchanged (id order preserved)") {
    val wh = java.nio.file.Files.createTempDirectory("wo_none").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
      .append(Seq("widget"), graft.gen.Bundles.products(), 1, 50).commit()
    val entry = SnapshotLog(g.tableDir.toString).load().mainOnly.dataFiles.head
    val ids = spark.read.parquet(entry.path).select("product_id")
      .collect().map(_.getInt(0)).toSeq
    assert(ids == ids.sorted, "generation order (== id order) preserved")
  }
}
