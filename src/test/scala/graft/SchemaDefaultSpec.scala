package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.read.MorReader
import graft.scenarios.Scenarios
import graft.schema.GraftSchema
import graft.table.GraftTableGenerator

/** Iceberg-v3 initial defaults: adding a column with a default is a pure
  * metadata commit — pre-add rows read the default, post-add rows read
  * what was written (including real nulls), and the default participates
  * everywhere the field id resolves (delete predicates, eq-delete keys). */
class SchemaDefaultSpec extends SparkSpec {

  private def fresh(tag: String): GraftTableGenerator = {
    val wh = java.nio.file.Files.createTempDirectory(s"sd_$tag").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
      .append(Seq("widget"), graft.gen.Bundles.products(), 1, 50).commit()
    g // ids 0..49, no status column yet
  }

  private def withStatus(g: GraftTableGenerator, idStart: Long,
                         n: Int): org.apache.spark.sql.DataFrame = {
    val base = graft.gen.Bundles.products()
      .frame(spark, idStart, n, Some("widget"), Scenarios.ProductsSchema)
    base.withColumn("status",
      when(col("product_id") % 2 === 0, lit("fresh")).otherwise(lit(null)))
  }

  test("pre-add rows read the default; post-add rows keep written values and real nulls") {
    val g = fresh("basic")
    g.addColumn("status", StringType, Some("active"))
    g.appendData(withStatus(g, 50, 50)).commit() // ids 50..99
    val got = g.read.select("product_id", "status").collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert((0 until 50).forall(got(_) == Some("active")),
      "pre-add rows must read the initial default")
    assert((50 until 100).forall(i =>
      got(i) == (if (i % 2 == 0) Some("fresh") else None)),
      "post-add rows read what was written — a real null stays null")
  }

  test("default-less add still reads null (unchanged semantics)") {
    val g = fresh("nodefault")
    g.addColumn("status", StringType, None).commit() // metadata-only commit
    assert(g.read.where(col("status").isNull).count() == 50)
  }

  test("eq-delete keyed on the defaulted column kills pre-add rows") {
    val g = fresh("eqdel")
    g.addColumn("status", StringType, Some("active"))
    g.appendData(withStatus(g, 50, 10)).commit() // ids 50..59
    // writer-side predicate over the defaulted column: matches the 50
    // pre-add rows THROUGH the default (rawScan projects it), kills them
    g.equalityDelete(Seq("widget"), col("status") === "active",
      Seq("status")).commit()
    val live = g.read.select("product_id").collect().map(_.getInt(0)).toSet
    assert(live == (50 until 60).toSet,
      s"defaulted rows must die through the eq key, got ${live.size} live")
  }

  test("numeric default casts canonically; rename keeps it; json round-trips") {
    val g = fresh("num")
    g.addColumn("priority", IntegerType, Some("7"))
    g.renameColumn("priority", "prio")
    g.commit() // schema changes surface at the next snapshot
    val agg = g.read.agg(min("prio"), max("prio")).collect()(0)
    assert(agg.getInt(0) == 7 && agg.getInt(1) == 7)
    val rt = GraftSchema.fromJson(
      graft.meta.SnapshotLog(g.tableDir.toString).load().mainOnly.schema.toJson)
    assert(rt.fields.find(_.name == "prio").get.initialDefault == Some("7"),
      "default must survive the log round-trip and the rename")
  }

  test("defaulted column is scannable through time travel only after the add") {
    val g = fresh("tt")
    val pre = graft.meta.SnapshotLog(g.tableDir.toString).lastSnapshotId
    g.addColumn("status", StringType, Some("active"))
    g.appendData(withStatus(g, 50, 10)).commit()
    // pre-add snapshot: old schema, no status column at all
    val preCols = MorReader.readAt(spark, g.tableDir.toString, pre).columns
    assert(!preCols.contains("status"))
    // head: every pre-add row defaulted
    assert(g.read.where(col("status") === "active").count() == 50)
  }
}
