package graft

import org.apache.spark.sql.functions._

import graft.read.MorReader
import graft.scenarios.Scenarios
import graft.table.GraftTableGenerator

/** Metadata-only COUNT(*): manifest-fold exactness on clean scopes,
  * seq-aware fallback under deletes, partition-scope independence, and
  * the documented Iceberg-parity divergence on lying metadata. */
class FastCountSpec extends SparkSpec {

  private def fresh(tag: String): GraftTableGenerator = {
    val wh = java.nio.file.Files.createTempDirectory(s"fc_$tag").toString
    val g = new GraftTableGenerator(spark, wh, "t")
    g.create(Scenarios.ProductsSchema, Seq("category"))
      .append(Seq("widget"), graft.gen.Bundles.products(), 2, 50).commit()
      .append(Seq("gizmo"), graft.gen.Bundles.products(), 2, 50).commit()
    g
  }

  test("clean table: metadata fold, equal to the scan") {
    val g = fresh("clean")
    val (n, metaOnly) = MorReader.fastCount(spark, g.tableDir.toString)
    assert(metaOnly, "clean table must take the manifest path")
    assert(n == 200L && n == g.read.count())
  }

  test("deletes force the fallback; clean partitions keep the manifest path") {
    val g = fresh("del")
    g.equalityDelete(Seq("gizmo"), col("product_id") % 5 === 0,
      Seq("product_id")).commit()
    val dir = g.tableDir.toString
    val (all, allMeta) = MorReader.fastCount(spark, dir)
    assert(!allMeta, "a delete in scope must fall back to the scan")
    assert(all == g.read.count())
    // widget is untouched: its scope stays metadata-only
    val (w, wMeta) = MorReader.fastCount(spark, dir,
      Map("category" -> Set("widget")))
    assert(wMeta && w == 100L)
    val (z, zMeta) = MorReader.fastCount(spark, dir,
      Map("category" -> Set("gizmo")))
    assert(!zMeta && z == 80L)
  }

  test("appends after the delete wave (higher seq) restore the manifest path only when sound") {
    val g = fresh("seq")
    g.positionalDelete(Seq("widget"), col("product_id") < 10).commit()
    g.append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit()
    // the old widget files are still delete-affected -> fallback, exact
    val (n, metaOnly) = MorReader.fastCount(spark, g.tableDir.toString,
      Map("category" -> Set("widget")))
    assert(!metaOnly && n == 100L) // 100 - 10 + 10
  }

  test("GLOBAL-scope deletes (upsert's table-root eq file) force the fallback") {
    val g = fresh("global")
    val incoming = graft.gen.Bundles.products()
      .frame(spark, 40, 20, Some("widget"), Scenarios.ProductsSchema)
    g.upsert(incoming, Seq("product_id")).commit()
    // the upsert's delete file has EMPTY partition scope — it touches every
    // partitioned file (scope-subset rule, not map equality; regression
    // for the bucketed-fuzz catch)
    val (n, metaOnly) = MorReader.fastCount(spark, g.tableDir.toString)
    assert(!metaOnly, "a global delete in scope must fall back to the scan")
    assert(n == 200L && n == g.read.count())
  }

  test("lying metadata: manifest path reproduces Iceberg's answer, scan stays truth") {
    val g = fresh("lie")
    g.appendEmptyFile("widget").commit() // declares 1 row, contains 0
    val dir = g.tableDir.toString
    val (n, metaOnly) = MorReader.fastCount(spark, dir)
    val scanned = g.read.count()
    assert(metaOnly, "no deletes — manifest path")
    assert(n == scanned + 1,
      s"the declared-count fold must trust the lie (got $n vs scan $scanned)")
  }
}
