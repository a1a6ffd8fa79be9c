package graft

import org.apache.spark.sql.functions._

import graft.meta.SnapshotLog
import graft.read.MorReader
import graft.scenarios.Scenarios
import graft.table.GraftTableGenerator

/** Iceberg-v3 row lineage: `_row_id` is assigned once at commit from the
  * table's monotone counter, derived as firstRowId + position on plain
  * files, MATERIALIZED into rewritten files by every compaction flavor,
  * and never reused by later appends. `_last_updated_seq` rides along. */
class RowLineageSpec extends SparkSpec {

  private def fresh(tag: String): GraftTableGenerator = {
    val wh = java.nio.file.Files.createTempDirectory(s"rl_$tag").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
      .append(Seq("widget"), graft.gen.Bundles.products(), 2, 50).commit()
    g // ids 0..99 in write order → _row_id == product_id
  }

  private def lineageMap(g: GraftTableGenerator): Map[Int, (Long, Long)] =
    MorReader.readLineage(spark, g.tableDir.toString)
      .select("product_id", "_row_id", "_last_updated_seq").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("append assigns contiguous ids in write order") {
    val g = fresh("assign")
    val m = lineageMap(g)
    assert(m.size == 100)
    assert((0 until 100).forall(i => m(i)._1 == i.toLong),
      "row id must equal firstRowId + position (= product_id here)")
    val entries = SnapshotLog(g.tableDir.toString).load().mainOnly.dataFiles
    assert(entries.map(_.firstRowId).sorted == Seq(0L, 50L))
  }

  test("ids survive plain compaction; later appends never reuse them") {
    val g = fresh("stable")
    g.positionalDelete(Seq("widget"),
      col("product_id") >= 10 && col("product_id") < 20).commit()
    val before = lineageMap(g)
    g.compact().commit()
    val after = lineageMap(g)
    assert(after == before, "compaction must not move a single row id")
    val entries = SnapshotLog(g.tableDir.toString).load().mainOnly.dataFiles
    assert(entries.forall(_.lineageInFile),
      "rewritten files carry materialized lineage")
    // counter continues past the DEAD ids too — never reused
    g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit()
    val m2 = lineageMap(g)
    assert((100 until 110).forall(i => m2(i)._1 == i.toLong),
      s"fresh rows must take ids 100..109, got ${(100 until 110).map(m2(_)._1)}")
  }

  test("sorted compaction reorders rows but ids travel with them") {
    val g = fresh("sorted")
    g.equalityDelete(Seq("widget"), col("product_id") % 3 === 0,
      Seq("product_id")).commit()
    val before = lineageMap(g)
    g.compactSorted("name", 25).commit() // physical order now by name
    assert(lineageMap(g) == before)
  }

  test("deletion-vector fold leaves lineage untouched") {
    val g = fresh("dv")
    g.positionalDelete(Seq("widget"), col("product_id") < 5).commit()
    val before = lineageMap(g)
    g.rewritePositionDeletesToDVs().commit()
    assert(lineageMap(g) == before)
  }

  test("_last_updated_seq is the producing sequence, preserved by rewrite") {
    val g = fresh("seq")
    g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit() // seq 2
    val m = lineageMap(g)
    assert((0 until 100).forall(i => m(i)._2 == 1L))
    assert((100 until 110).forall(i => m(i)._2 == 2L))
    g.compact().commit()
    assert(lineageMap(g) == m, "rewrite must not touch last-updated seqs")
  }

  test("changelog across a rewrite: row-id keying sees post-compaction deletes") {
    val g = fresh("cdc")
    val dir = g.tableDir.toString
    val from = SnapshotLog(dir).lastSnapshotId
    g.compact().commit() // rewrite INSIDE the window — must emit nothing
    g.positionalDelete(Seq("widget"), col("product_id") < 5).commit()
    val to = SnapshotLog(dir).lastSnapshotId
    val ev = MorReader.changelogBetween(spark, dir, from, to, withLineage = true)
      .select("change_kind", "product_id", "_row_id").collect()
    assert(ev.forall(_.getString(0) == "delete"),
      s"a rewrite emits no inserts, got ${ev.map(_.getString(0)).toSeq}")
    assert(ev.map(_.getInt(1)).toSet == (0 until 5).toSet,
      "a delete AFTER the compaction references compacted files — row-id " +
        s"identity must still report it; got ${ev.map(_.getInt(1)).toSet}")
    assert(ev.map(_.getLong(2)).toSet == (0L until 5L).toSet,
      "delete events carry the rows' original stable ids")
  }

  test("upsert replaces the row id (delete + insert at a new seq)") {
    val g = fresh("upsert")
    val incoming = graft.gen.Bundles.products()
      .frame(spark, 40, 20, Some("widget"), Scenarios.ProductsSchema)
    g.upsert(incoming, Seq("product_id")).commit()
    val m = lineageMap(g)
    assert(m.size == 100)
    assert((0 until 40).forall(i => m(i)._1 == i.toLong), "untouched rows keep ids")
    assert((60 until 100).forall(i => m(i)._1 == i.toLong))
    assert((40 until 60).forall(i => m(i)._1 >= 100L),
      "re-inserted rows are NEW rows: fresh ids, old ids retired")
    assert(m.values.map(_._1).toSeq.distinct.size == 100, "ids stay unique")
  }
}
