package graft

import org.apache.spark.sql.functions._

import graft.read.{MetaTables, MorReader}

/** compactDirty: the health-driven maintenance loop — only partitions at
  * or over the dead-row threshold get rewritten, counts survive, clean
  * partitions' files are untouched.
  */
class HealthCompactSpec extends SparkSpec {

  test("compactDirty rewrites the dirty partition and only it") {
    val wh = java.nio.file.Files.createTempDirectory("hc").toString
    val g = new graft.table.GraftTableGenerator(spark, wh, "health_tbl")
    g.create(graft.scenarios.Scenarios.ProductsSchema, Seq("category"),
        graft.scenarios.Scenarios.TinyRowGroupProps)
      .append(Seq("widget"), graft.gen.Bundles.products(), 1, 100).commit()
      .append(Seq("gizmo"), graft.gen.Bundles.products(), 1, 100).commit()
      // kill 60% of widget; gizmo stays clean
      .equalityDelete(Seq("widget"), col("product_id") % 10 < 6,
        Seq("product_id")).commit()
    val dir = g.tableDir.toString
    val beforeGizmoFiles = MetaTables.files(spark, dir)
      .where(col("partition") === "category=gizmo")
      .select("file_path").collect().map(_.getString(0)).toSet
    val beforeLive = MorReader.read(spark, dir).count()

    // threshold above 60 selects nothing, stages nothing
    assert(g.compactDirty(70) == Nil)

    val picked = g.compactDirty(50)
    g.commit()
    assert(picked == Seq("widget"))

    // counts identical, widget now a single data file with live rows only,
    // gizmo's physical files untouched
    assert(MorReader.read(spark, dir).count() == beforeLive)
    val widgetFiles = MetaTables.files(spark, dir)
      .where(col("partition") === "category=widget").collect()
    assert(widgetFiles.length == 1, widgetFiles.mkString("\n"))
    val afterGizmoFiles = MetaTables.files(spark, dir)
      .where(col("partition") === "category=gizmo")
      .select("file_path").collect().map(_.getString(0)).toSet
    assert(afterGizmoFiles == beforeGizmoFiles)
    // widget's delete files are consumed by the rewrite
    assert(MetaTables.deleteFiles(spark, dir)
      .where(col("partition") === "category=widget").count() == 0)
    // and the dirty partition is healthy now: a second pass selects nothing
    assert(g.compactDirty(50) == Nil)
  }
}
