package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftTableFunction
import graft.read.MorReader

/** The graft_table TVF: SQL results equal the Scala API on every arg
  * shape, filters through the TVF reach the underlying parquet scans, and
  * bad arguments fail at analysis, not at runtime.
  */
class SqlSurfaceSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir: String = {
    val wh = java.nio.file.Files.createTempDirectory("tvf").toString
    val g = new graft.table.GraftTableGenerator(spark, wh, "tvf_tbl")
    g.create(graft.scenarios.Scenarios.ProductsSchema, Seq("category"),
        graft.scenarios.Scenarios.TinyRowGroupProps)
      .append(Seq("widget"), graft.gen.Bundles.products(), 1, 100).commit()
      .equalityDelete(Seq("widget"), col("product_id") < 10, Seq("product_id")).commit()
      .append(Seq("gizmo"), graft.gen.Bundles.products(), 1, 50).commit()
    g.tag("t1")
    g.tableDir.toString
  }

  test("graft_table(path) equals MorReader.read") {
    GraftTableFunction.ensureRegistered(spark)
    val viaSql = spark.sql(s"SELECT COUNT(*) AS c FROM graft_table('$dir')")
      .collect()(0).getLong(0)
    val viaApi = MorReader.read(spark, dir).count()
    assert(viaSql == viaApi && viaSql > 0)
  }

  test("graft_table(path, snapshotId) time-travels") {
    GraftTableFunction.ensureRegistered(spark)
    // snapshot 2 = after the eq-delete, before the second append
    val viaSql = spark.sql(s"SELECT COUNT(*) AS c FROM graft_table('$dir', 2)")
      .collect()(0).getLong(0)
    assert(viaSql == MorReader.readAt(spark, dir, 2L).count())
    // snapshot 2 predates the second append — strictly fewer rows
    val full = spark.sql(s"SELECT COUNT(*) AS c FROM graft_table('$dir')")
      .collect()(0).getLong(0)
    assert(viaSql < full)
  }

  test("graft_table(path, ref) resolves tags") {
    GraftTableFunction.ensureRegistered(spark)
    val viaSql = spark.sql(s"SELECT COUNT(*) AS c FROM graft_table('$dir', 't1')")
      .collect()(0).getLong(0)
    assert(viaSql == MorReader.readRef(spark, dir, "t1").count())
  }

  test("filters written in SQL against the TVF push into the parquet scan") {
    GraftTableFunction.ensureRegistered(spark)
    val df = spark.sql(
      s"SELECT product_id FROM graft_table('$dir') WHERE product_id > 90")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(product_id), GreaterThan(product_id,90)")
      || p.contains("GreaterThan(product_id,90)"), p)
    assert(df.count() == MorReader.read(spark, dir)
      .where(col("product_id") > 90).count())
  }

  test("graft_table_changes(path, from, to) equals changelogBetween") {
    GraftTableFunction.ensureRegistered(spark)
    val viaSql = spark.sql(
      s"""SELECT change_kind, COUNT(*) AS cnt
         |FROM graft_table_changes('$dir', 1, 3)
         |GROUP BY change_kind ORDER BY change_kind""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaApi = MorReader.changelogBetween(spark, dir, 1L, 3L)
      .groupBy("change_kind").count().orderBy("change_kind")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("bad arguments fail at analysis with a clear message") {
    GraftTableFunction.ensureRegistered(spark)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table('$dir', 1.5)").collect()
    }
    assert(e.getMessage.contains("snapshot id or ref"), e.getMessage)
  }

  test("graft_table(path, branch) reads the branch HEAD lineage from SQL") {
    GraftTableFunction.ensureRegistered(spark)
    val wh = java.nio.file.Files.createTempDirectory("tvf_br").toString
    val g = new graft.table.GraftTableGenerator(spark, wh, "tvf_br_tbl")
    g.create(graft.scenarios.Scenarios.ProductsSchema, Seq("category"))
      .append(Seq("widget"), graft.gen.Bundles.products(), 1, 30).commit()
    g.createBranch("dev")
    g.writeTo("dev")
      .append(Seq("gizmo"), graft.gen.Bundles.products(), 1, 12).commit()
    g.writeTo("main")
    val d = g.tableDir.toString
    val main = spark.sql(s"SELECT COUNT(*) c FROM graft_table('$d')")
      .collect()(0).getLong(0)
    val branch = spark.sql(s"SELECT COUNT(*) c FROM graft_table('$d', 'dev')")
      .collect()(0).getLong(0)
    assert(main == 30L, s"main saw branch rows: $main")
    assert(branch == 42L, s"branch lineage wrong: $branch")
  }

  test("graft_table_at(path, tsMs) time-travels by wall clock from SQL") {
    GraftTableFunction.ensureRegistered(spark)
    val wh = java.nio.file.Files.createTempDirectory("tvf_at").toString
    var tick = 0L
    val g = new graft.table.GraftTableGenerator(spark, wh, "tvf_at_tbl",
      clock = () => { tick += 1000L; tick })
    g.create(graft.scenarios.Scenarios.ProductsSchema, Seq("category"))
      .append(Seq("widget"), graft.gen.Bundles.products(), 1, 10).commit()
      .append(Seq("widget"), graft.gen.Bundles.products(), 1, 5).commit()
    val d = g.tableDir.toString
    // commit stamps: snap1 @1000, snap2 @2000
    val early = spark.sql(s"SELECT COUNT(*) c FROM graft_table_at('$d', 1500)")
      .collect()(0).getLong(0)
    val late = spark.sql(s"SELECT COUNT(*) c FROM graft_table_at('$d', 2500)")
      .collect()(0).getLong(0)
    assert(early == 10L && late == 15L, s"early=$early late=$late")
    // before all history: analysis-time error, same contract as the API
    intercept[Exception](
      spark.sql(s"SELECT COUNT(*) c FROM graft_table_at('$d', 500)").collect())
  }
}
