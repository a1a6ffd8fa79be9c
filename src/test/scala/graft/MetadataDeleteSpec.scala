package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.SnapshotLog
import graft.read.MorReader
import graft.scenarios.Scenarios
import graft.table.GraftTableGenerator

/** deleteWhere: the metadata-delete split. Files fully inside the range
  * drop without a scan, overlapping files delete row-level, disjoint
  * files are untouched, null-bearing files never mis-drop, and the
  * lineage changelog witnesses metadata-dropped rows as delete events. */
class MetadataDeleteSpec extends SparkSpec {

  /** Sorted layout: 100 rows in 5 files of 20 contiguous product ids. */
  private def sortedTable(tag: String): GraftTableGenerator = {
    val wh = java.nio.file.Files.createTempDirectory(s"md_$tag").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
      .append(Seq("widget"), graft.gen.Bundles.products(), 1, 100).commit()
      .compactSorted("product_id", 20).commit()
    g
  }

  test("fully-covered files drop as pure metadata; overlap scans; disjoint untouched") {
    val g = sortedTable("tiers")
    g.deleteWhere("product_id", 20, 59).commit() // files [20,39] [40,59] whole
    val st1 = SnapshotLog(g.tableDir.toString).load().mainOnly
    assert(st1.dataFiles.size == 3, "two covered files dropped from the live set")
    assert(st1.deleteFiles.isEmpty, "no tombstone for a metadata drop")
    assert(g.read.count() == 60)
    g.deleteWhere("product_id", 90, 94).commit() // overlaps file [80,99] only
    val st2 = SnapshotLog(g.tableDir.toString).load().mainOnly
    assert(st2.dataFiles.size == 3, "partial overlap keeps the file")
    assert(st2.deleteFiles.size == 1 && st2.deleteFiles.head.kind == "pos",
      "exactly the one overlapping file pays a tombstone")
    val ids = g.read.select("product_id").collect().map(_.getInt(0)).toSet
    assert(ids == ((0 until 20) ++ (60 until 90) ++ (95 until 100)).toSet)
  }

  test("vector mode: the overlap tier writes a merged vector instead") {
    val g = sortedTable("dv")
    g.vectorDeletes(true)
    g.deleteWhere("product_id", 15, 44).commit() // drops [20,39]; overlaps 2 files
    val st = SnapshotLog(g.tableDir.toString).load().mainOnly
    assert(st.dataFiles.size == 4)
    assert(st.deleteFiles.nonEmpty && st.deleteFiles.forall(_.kind == "dv"))
    assert(g.read.count() == 70)
    val card = spark.read.parquet(st.deleteFiles.map(_.path): _*)
      .agg(sum("cardinality")).collect()(0).getLong(0)
    assert(card == 10, s"rows 15..19 and 40..44 vector-deleted, got $card")
  }

  test("a file with nulls in the column never metadata-drops") {
    val wh = java.nio.file.Files.createTempDirectory("md_nulls").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
    val rows = graft.gen.Bundles.products()
      .frame(spark, 0, 20, Some("widget"), Scenarios.ProductsSchema)
      .withColumn("weight",
        when(col("product_id") < 5, lit(null).cast(DoubleType))
          .otherwise(lit(1.0)))
    g.appendData(rows).commit()
    g.deleteWhere("weight", 0.0, 2.0).commit()
    val st = SnapshotLog(g.tableDir.toString).load().mainOnly
    assert(st.dataFiles.size == 1,
      "null rows can't match a range predicate — the file must survive")
    assert(st.deleteFiles.size == 1)
    val ids = g.read.select("product_id").collect().map(_.getInt(0)).toSet
    assert(ids == (0 until 5).toSet, "exactly the null-weight rows survive")
  }

  test("dropping a whole partition by value is a pure metadata edit") {
    val wh = java.nio.file.Files.createTempDirectory("md_part").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
      .append(Seq("widget"), graft.gen.Bundles.products(), 2, 50).commit()
      .append(Seq("gizmo"), graft.gen.Bundles.products(), 2, 50).commit()
    // identity partition column → every widget file's envelope is the
    // single value → full cover, zero tombstones, zero scans
    g.deleteWhere("category", "widget", "widget").commit()
    val st = SnapshotLog(g.tableDir.toString).load().mainOnly
    assert(st.deleteFiles.isEmpty, "partition drop must write no tombstone")
    assert(st.dataFiles.forall(_.partition == Map("category" -> "gizmo")))
    assert(g.read.count() == 100 &&
      g.read.where(col("category") === "widget").count() == 0)
  }

  test("lineage changelog witnesses metadata-dropped rows as deletes") {
    val g = sortedTable("cdc")
    val dir = g.tableDir.toString
    val from = SnapshotLog(dir).lastSnapshotId
    g.deleteWhere("product_id", 20, 59).commit()
    val to = SnapshotLog(dir).lastSnapshotId
    val ev = MorReader.changelogBetween(spark, dir, from, to, withLineage = true)
      .select("change_kind", "product_id").collect()
    assert(ev.forall(_.getString(0) == "delete"))
    assert(ev.map(_.getInt(1)).toSet == (20 until 60).toSet,
      "rows of metadata-dropped files are ordinary delete events — no " +
        "tombstone exists, the state diff witnesses them")
    // time travel to the pre-delete snapshot still reads all 100
    assert(MorReader.readAt(spark, dir, from).count() == 100)
  }
}
