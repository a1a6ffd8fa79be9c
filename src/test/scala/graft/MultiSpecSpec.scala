package graft

import org.apache.spark.sql.functions._

import graft.meta.SnapshotLog
import graft.read.MorReader
import graft.scenarios.Scenarios
import graft.table.GraftTableGenerator

/** Multi-transform partition specs — the standard `tenant × bucket(id)` /
  * `category × day(ts)` 100 TB layouts: appendData slices on the full
  * value TUPLE, partition maps carry every key, pruning composes per key,
  * and delete scoping / compaction operate per combined partition. */
class MultiSpecSpec extends SparkSpec {

  private def fresh(tag: String): GraftTableGenerator = {
    val wh = java.nio.file.Files.createTempDirectory(s"ms_$tag").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category", "bucket(2, product_id)"))
    val rows = graft.gen.Bundles.products()
      .frame(spark, 0, 100, Some("widget"), Scenarios.ProductsSchema)
      .withColumn("category",
        when(col("product_id") % 2 === 0, lit("widget")).otherwise(lit("gizmo")))
    g.appendData(rows).commit()
    g // 100 rows over category∈{widget,gizmo} × bucket∈{0,1}
  }

  test("appendData slices on the full tuple; maps carry every key") {
    val g = fresh("slice")
    val entries = SnapshotLog(g.tableDir.toString).load().mainOnly.dataFiles
    assert(entries.size == 4, s"2 categories × 2 buckets, got ${entries.size}")
    assert(entries.forall(e =>
      e.partition.keySet == Set("category", "product_id_bucket")))
    assert(entries.map(_.partition).distinct.size == 4)
    assert(g.read.count() == 100)
    // per-file row counts sum back (lineage assignment needs them real)
    assert(entries.map(_.recordCount).sum == 100)
  }

  test("partition pruning composes across the keys") {
    val g = fresh("prune")
    val before = MorReader.dataFilesPlanned.get()
    val n = MorReader.readWhere(spark, g.tableDir.toString,
      Map("category" -> Set("widget"), "product_id_bucket" -> Set("0"))).count()
    assert(MorReader.dataFilesPlanned.get() - before == 1,
      "both keys must prune: exactly 1 of 4 files planned")
    // cross-check the planned file against its physical content
    val bucketOf = SnapshotLog(g.tableDir.toString).load().mainOnly.dataFiles
      .filter(e => e.partition == Map("category" -> "widget",
        "product_id_bucket" -> "0"))
    assert(bucketOf.size == 1)
    assert(n == spark.read.parquet(bucketOf.head.path).count() && n > 0)
  }

  test("delete scoping and compaction per combined partition") {
    val g = fresh("del")
    g.equalityDelete(col("product_id") < 20, Seq("product_id")).commit()
    assert(g.read.count() == 80)
    // row lineage: unique ids before, SAME map after the multi-spec rewrite
    def lineage(): Map[Int, Long] =
      MorReader.readLineage(spark, g.tableDir.toString)
        .select("product_id", "_row_id").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val before = lineage()
    assert(before.values.toSeq.distinct.size == 80)
    g.compact().commit()
    assert(g.read.count() == 80)
    assert(lineage() == before, "ids must survive the multi-spec rewrite")
    val entries = SnapshotLog(g.tableDir.toString).load().mainOnly
    assert(entries.deleteFiles.isEmpty, "compaction consumed the deletes")
    assert(entries.dataFiles.forall(e =>
      e.partition.keySet == Set("category", "product_id_bucket")),
      "rewritten files keep the full partition tuple")
  }

  test("native vector deletes work per combined partition") {
    val g = fresh("dv")
    g.vectorDeletes(true)
    g.positionalDelete(col("product_id") >= 90).commit()
    assert(g.read.count() == 90)
    val dvs = SnapshotLog(g.tableDir.toString).load().mainOnly
      .deleteFiles.filter(_.kind == "dv")
    assert(dvs.nonEmpty && dvs.forall(_.kind == "dv"))
    assert(dvs.forall(e =>
      e.partition.keySet == Set("category", "product_id_bucket")))
  }
}
