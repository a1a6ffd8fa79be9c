package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.functions._

import graft.meta.SnapshotLog
import graft.read.{MorReader, ValueIndex}
import graft.scenarios.Scenarios
import graft.table.GraftTableGenerator

/** Mixed-version-history honesty: tables whose logs predate row lineage
  * (firstRowId absent, no nextRowId stamps) must keep CORRECT semantics —
  * compaction may not invent lineage over null row ids, the (path, pos)
  * changelog must still witness metadata-tier file drops, and the row-id
  * counter may never rewind past ids already assigned. */
class LegacyLineageSpec extends SparkSpec {

  private def fresh(tag: String): GraftTableGenerator = {
    val wh = Files.createTempDirectory(s"legacy_$tag").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
      .append(Seq("widget"), graft.gen.Bundles.products(), 2, 50).commit()
    g // product_id 0..99, file 1 holds 0..49, file 2 holds 50..99
  }

  /** Rewrite the log as a pre-lineage binary would have written it:
    * no firstRowId, no lineageInFile, no nextRowId stamps. */
  private def stripLineage(dir: String): Unit = {
    val log = SnapshotLog(dir)
    log.rewrite(log.load().snapshots.map(s => s.copy(
      dataFiles = s.dataFiles.map(_.copy(firstRowId = -1L, lineageInFile = false)),
      nextRowId = -1L)))
  }

  test("compaction over legacy files stays legacy — no lineage flag over null ids") {
    val g = fresh("compact")
    val dir = g.tableDir.toString
    stripLineage(dir)
    g.positionalDelete(Seq("widget"), col("product_id") < 5).commit()
    g.compact().commit()
    val entries = SnapshotLog(dir).load().mainOnly.dataFiles
    assert(entries.nonEmpty && entries.forall(f => !f.lineageInFile && f.firstRowId < 0),
      s"rewritten legacy group must stay legacy, got $entries")
    assert(MorReader.readLineage(spark, dir)
      .where(col("_row_id").isNotNull).count() == 0,
      "legacy rows must read null _row_id, never a fabricated one")
    // the changelog over a post-compaction delete must fall back to
    // (path, pos) and report EXACTLY the deleted rows — with lineageInFile
    // lying, every null-id row became a spurious delete event
    val pre = SnapshotLog(dir).lastSnapshotId
    g.positionalDelete(Seq("widget"),
      col("product_id") >= 10 && col("product_id") < 20).commit()
    val post = SnapshotLog(dir).lastSnapshotId
    val ch = MorReader.changelogBetween(spark, dir, pre, post)
      .groupBy("change_kind").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch.getOrElse("delete", 0L) == 10L && ch.getOrElse("insert", 0L) == 0L,
      s"expected exactly 10 delete events, got $ch")
  }

  test("mixed legacy+lineage compaction group writes without lineage") {
    val g = fresh("mixed")
    val dir = g.tableDir.toString
    stripLineage(dir)
    // this append assigns fresh row ids — the group is now MIXED
    g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit()
    g.compactSorted("name", 60).commit()
    val entries = SnapshotLog(dir).load().mainOnly.dataFiles
    assert(entries.forall(f => !f.lineageInFile),
      "any legacy source file in the group poisons materialized lineage")
    assert(MorReader.read(spark, dir).count() == 110)
  }

  test("legacy changelog witnesses metadata-tier file drops as deletes") {
    val g = fresh("metadel")
    val dir = g.tableDir.toString
    stripLineage(dir)
    val pre = SnapshotLog(dir).lastSnapshotId
    // file 1 (ids 0..49) is FULLY inside the range → metadata-tier drop
    g.deleteWhere("product_id", 0, 49).commit()
    val post = SnapshotLog(dir).lastSnapshotId
    assert(SnapshotLog(dir).load().mainOnly.snapshots.last
      .removedDataFiles.nonEmpty, "precondition: the delete dropped a file")
    val ch = MorReader.changelogBetween(spark, dir, pre, post)
    val byKind = ch.groupBy("change_kind").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.getOrElse("delete", 0L) == 50L,
      s"metadata file drop must emit its rows as delete events, got $byKind")
    assert(ch.where(col("change_kind") === "delete")
      .agg(max("product_id")).collect()(0).getInt(0) == 49)
  }

  test("row-id counter survives an unstamped delete-only last snapshot") {
    val g = fresh("ctr")
    val dir = g.tableDir.toString
    g.equalityDelete(Seq("widget"), col("product_id") < 3, Seq("product_id"))
      .commit() // snapshot 2: delete-only
    // simulate an old-binary writer: remove the nextRowId stamp
    val snapPath = Paths.get(dir, "metadata",
      s"snap-${SnapshotLog(dir).lastSnapshotId}.json")
    val m = new ObjectMapper()
    val node = m.readTree(Files.readString(snapPath)).asInstanceOf[ObjectNode]
    node.remove("nextRowId")
    Files.writeString(snapPath, m.writeValueAsString(node))
    // a second writer appends — its rows must take ids PAST the 100
    // already assigned, not restart at 0
    val g2 = new GraftTableGenerator(spark, g.tableDir.getParent.toString, "t")
      .open()
    val rows = spark.range(5).select(
      (col("id") + 1000).cast("int").as("product_id"),
      lit("n").as("name"), lit("widget").as("category"),
      lit("red").as("color"),
      lit(java.sql.Date.valueOf("2024-01-01")).as("created_date"),
      lit(1.0).as("weight"), lit(1).cast("int").as("quantity"))
    g2.appendBulk(rows.select(g2.liveSchema.names.map(col): _*), 1).commit()
    val lin = MorReader.readLineage(spark, dir)
      .select("product_id", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(lin.values.toSeq.distinct.size == lin.size, "row ids must be unique")
    val newIds = lin.filter(_._1 >= 1000).values
    assert(newIds.forall(_ >= 100L),
      s"new rows must continue past id 100, got ${newIds.toSeq.sorted}")
  }

  test("value index built on an empty table refreshes after the first append") {
    val wh = Files.createTempDirectory("legacy_vidx").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
    val dir = g.tableDir.toString
    val idx = s"$wh/idx"
    ValueIndex.build(spark, dir, "product_id", idx) // watermark 0
    g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 20).commit()
    ValueIndex.refresh(spark, dir, idx) // must accept the from==0 watermark
    val hit = ValueIndex.readValue(spark, dir, idx, "7")
    assert(hit.count() == 1 &&
      hit.select("product_id").collect()(0).getInt(0) == 7)
  }
}
