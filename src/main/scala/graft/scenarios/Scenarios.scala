package graft.scenarios

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.gen.Bundles
import graft.schema.GraftSchema
import graft.table.GraftTableGenerator

/** The 12 dataset-construction scenarios — the reference's "query workload"
  * (reference `Main.java:118-473`), re-expressed over the Spark-native
  * engine. Same logical content, same file-layout intent; selectable by
  * name instead of by editing code (the reference toggles comments in
  * `run()`, `Main.java:118-134`).
  */
object Scenarios {

  // reference `Main.java:41-48`
  val OrdersSchema: GraftSchema = GraftSchema.of(
    "order_id" -> IntegerType, "order_year" -> IntegerType,
    "order_date" -> TimestampNTZType, "source_id" -> IntegerType,
    "product_name" -> StringType, "amount" -> DoubleType)

  // reference `Main.java:52-60`
  val ProductsSchema: GraftSchema = GraftSchema.of(
    "product_id" -> IntegerType, "name" -> StringType, "category" -> StringType,
    "color" -> StringType, "created_date" -> DateType, "weight" -> DoubleType,
    "quantity" -> IntegerType)

  // reference `Main.java:76-82`
  val WideMetricsNCols = 1000
  val WideMetricsSchema: GraftSchema = GraftSchema(
    graft.schema.GraftField(1, "id", IntegerType) +:
      (1 until WideMetricsNCols).map(i =>
        graft.schema.GraftField(i + 1, s"metric_${i - 1}", DoubleType)))

  // small-row-group layout used by S3-S5 (reference `Main.java:186-191`)
  val SmallRowGroupProps: Map[String, String] = Map(
    "parquet.block.size" -> (16 * 1024).toString,
    "parquet.page.size" -> (4 * 1024).toString,
    "parquet.dictionary.page.size" -> (4 * 1024).toString)

  // forced 100-row row groups for S10/S11 (reference `Main.java:363-368`:
  // parquet writers check row-group size every 100 records, so a 1-byte
  // target guarantees 100-row groups — same behavior in parquet-hadoop)
  val TinyRowGroupProps: Map[String, String] = Map("parquet.block.size" -> "1")

  private def gen(spark: SparkSession, warehouse: String, table: String) =
    new GraftTableGenerator(spark, warehouse, table)

  /** S1 (reference `Main.java:136-147`): 600 rows, 2 snapshots. */
  def createSmallOrders(spark: SparkSession, warehouse: String): GraftTableGenerator =
    gen(spark, warehouse, "orders")
      .create(OrdersSchema, Seq("order_year"))
      .append(Seq(2019, 2020), Bundles.orders(), 2, 100).commit()
      .append(Seq(2021), Bundles.orders(), 2, 100).commit()

  /** S2 (reference `Main.java:149-174`): interleaved appends + pos-deletes +
    * empty file with lying record count. Final live rows: 680
    * (800 appended − 40 − 60 − 20 across the three delete waves). */
  def createSmallOrdersWithDeletes(spark: SparkSession, warehouse: String): GraftTableGenerator =
    gen(spark, warehouse, "orders_with_deletes")
      .create(OrdersSchema, Seq("order_year"))
      .append(Seq(2019, 2020), Bundles.orders(), 2, 100).commit()
      .positionalDelete(Seq(2019, 2020), col("order_id") % 10 === 0).commit()
      .append(Seq(2020, 2021), Bundles.orders(), 2, 100).commit()
      .positionalDelete(Seq(2019, 2020), col("order_id") % 10 === 3).commit()
      .appendEmptyFile(2021).commit()
      .positionalDelete(Seq(2021), col("order_id") % 10 === 6).commit()

  /** S3 (reference `Main.java:176-206`): tiny row groups, 3 overlapping
    * pos-delete waves incl. a cross-partition band. */
  def createMultiRowGroupOrdersWithDeletes(spark: SparkSession,
                                           warehouse: String): GraftTableGenerator =
    gen(spark, warehouse, "multi_rowgroup_orders_with_deletes")
      .create(OrdersSchema, Seq("order_year"), SmallRowGroupProps)
      .append(Seq(2019, 2020, 2021), Bundles.orders(), 3, 1000).commit()
      .positionalDelete(Seq(2021), col("order_id") % 10 < 3).commit()
      .positionalDelete(Seq(2021),
        col("order_id") % 10 > 0 && col("order_id") % 100 === 5).commit()
      .positionalDelete(Seq(2020, 2021),
        col("order_id") % 3000 >= 700 && col("order_id") % 3000 < 1200).commit()

  /** S4 (reference `Main.java:208-226`): delete id<900 → whole row groups dead. */
  def createOrdersFullRowgroupDelete(spark: SparkSession, warehouse: String): GraftTableGenerator =
    gen(spark, warehouse, "orders_full_rowgroup_delete")
      .create(OrdersSchema, Seq("order_year"), SmallRowGroupProps)
      .append(Seq(2019, 2020, 2021), Bundles.orders(), 3, 1000).commit()
      .positionalDelete(Seq(2019), col("order_id") < 900).commit()

  /** S5 (reference `Main.java:228-249`): 256+-char table name. */
  def createOrdersWithLongPaths(spark: SparkSession, warehouse: String): GraftTableGenerator =
    gen(spark, warehouse,
      "orders_with_a_table_name_that_is_longer_than_two_hundred_and_fifty_six_characters" +
        "_so_that_i_can_reproduce_a_bug_due_to_very_very_very_very_very_very_very_very_" +
        "very_very_very_very_very_very_very_very_very_very_very_long_paths")
      .create(OrdersSchema, Seq("order_year"), SmallRowGroupProps)
      .append(Seq(2019, 2020, 2021), Bundles.orders(), 3, 1000).commit()
      .positionalDelete(Seq(2019), col("order_id") < 900).commit()

  /** S6 (reference `Main.java:251-267`): ~10^8 fake delete entries in one
    * delete file vs 200 real rows. NOTE the reference never calls the final
    * `commit()` — the transaction is abandoned, so the delete file exists on
    * disk but is NOT in table metadata; mirrored faithfully here.
    * `fakeFiles`/`fakeDeletes` default to the reference's 10000×10000;
    * tests pass smaller values. */
  def createSmallOrdersWithLargeDeleteFile(spark: SparkSession, warehouse: String,
                                           fakeFiles: Int = 10000,
                                           fakeDeletes: Int = 10000): GraftTableGenerator = {
    // constant dummy row (reference `Main.java:511-520`; its LocalDateTime.now()
    // is made deterministic — fake rows are never read back)
    val fakeRow = Seq(lit(0), lit(0),
      lit("2025-01-01 00:00:00").cast(TimestampNTZType), lit(0), lit(""), lit(0.0))
    gen(spark, warehouse, "orders_with_large_delete_file")
      .create(OrdersSchema, Seq("order_year"))
      .append(Seq(2021), Bundles.orders(), 2, 100).commit()
      .positionalDelete(Some(Seq(2021)), col("order_id") % 10 < 3,
        fakeFiles, fakeDeletes, fakeRow)
    // no commit — matches `Main.java:251-267`
  }

  /** S7 (reference `Main.java:269-291`): partition evolution
    * order_year → source_id mid-table. */
  def createSmallOrdersWithPartitionEvolution(spark: SparkSession,
                                              warehouse: String): GraftTableGenerator =
    gen(spark, warehouse, "orders_part_evol")
      .create(OrdersSchema, Seq("order_year"))
      .append(Seq(2019, 2020), Bundles.orders(), 2, 100).commit()
      .append(Seq(2021), Bundles.orders(), 2, 100).commit()
      .updateSpec(Seq("source_id"), Seq("order_year")).commit()
      .append(Seq(0, 1, 2, 3, 4), Bundles.ordersSourcePartition(), 1, 40).commit()

  /** S8 (reference `Main.java:293-309`): unpartitioned MoR; delete scope =
    * all files present at delete time. Final live rows: 340. */
  def createUnpartitionedOrdersWithDeletes(spark: SparkSession,
                                           warehouse: String): GraftTableGenerator =
    gen(spark, warehouse, "unpartitioned_orders_with_deletes")
      .create(OrdersSchema, Seq.empty)
      .append(Bundles.ordersUnpartitioned(), 2, 100).commit()
      .positionalDelete(col("order_id") % 10 === 0).commit()
      .append(Bundles.ordersUnpartitioned(), 2, 100).commit()
      .positionalDelete(col("order_id") % 10 === 3).commit()

  /** S9 (reference `Main.java:311-326`): 100 files × 100 rows, then 100
    * sequential delete commits. Final live rows: 9000. `deleteCommits`
    * shrinkable for tests. */
  def createLargeUnpartitionedOrdersWithDeletes(spark: SparkSession, warehouse: String,
                                                deleteCommits: Int = 100): GraftTableGenerator = {
    val g = gen(spark, warehouse, "large_unpartitioned_orders_with_deletes")
      .create(OrdersSchema, Seq.empty)
      .append(Bundles.ordersUnpartitioned(), 100, 100).commit()
    for (x <- 0 until deleteCommits)
      g.positionalDelete(col("order_id") % 1000 === x).commit()
    g
  }

  /** S10 — THE golden scenario (reference `Main.java:328-408`): step counts
    * 200→170→370→333→933→453→450 documented in its javadoc. */
  def createProductsWithEqDeletes(spark: SparkSession, warehouse: String): GraftTableGenerator =
    gen(spark, warehouse, "products_with_eq_deletes")
      .create(ProductsSchema, Seq("category"), TinyRowGroupProps)
      .append(Seq("widget"), Bundles.products(), 1, 200).commit()
      .equalityDelete(Seq("widget"), col("product_id") < 30, Seq("product_id")).commit()
      .append(Seq("gizmo"), Bundles.products(), 1, 200).commit()
      .equalityDelete(Seq("widget", "gizmo"), col("color") === "green", Seq("color")).commit()
      .append(Seq("widget", "gadget", "gizmo"), Bundles.products(), 1, 200).commit()
      .equalityDelete(Seq("widget", "gadget", "gizmo"),
        col("product_id") % 200 >= 100, Seq("product_id")).commit()
      .positionalDelete(Seq("widget"),
        col("product_id") >= 50 && col("product_id") < 53).commit()

  /** S11 (reference `Main.java:410-461`): eq-deletes + add/drop column
    * schema evolution between commits. */
  def createProductsWithEqDeletesSchemaChange(spark: SparkSession,
                                              warehouse: String): GraftTableGenerator =
    gen(spark, warehouse, "products_with_schema_change")
      .create(ProductsSchema.select("product_id", "name", "category"),
        Seq("category"), TinyRowGroupProps)
      .append(Seq("widget"), Bundles.products(), 1, 200).commit()
      .equalityDelete(Seq("widget"), col("product_id") < 30, Seq("product_id")).commit()
      .updateSchema(Seq("color" -> StringType), Seq("product_id"))
      .append(Seq("gizmo"), Bundles.products(), 1, 200).commit()

  /** S12 (reference `Main.java:463-473`): 1000 columns, 30 files × 1 row. */
  def createWideMetrics(spark: SparkSession, warehouse: String): GraftTableGenerator =
    gen(spark, warehouse, "wide_metrics")
      .create(WideMetricsSchema, Seq.empty)
      .append(Bundles.wideMetrics(WideMetricsNCols), 30, 1).commit()

  val all: Seq[(String, (SparkSession, String) => GraftTableGenerator)] = Seq(
    "createSmallOrders" -> (createSmallOrders(_, _)),
    "createSmallOrdersWithDeletes" -> (createSmallOrdersWithDeletes(_, _)),
    "createMultiRowGroupOrdersWithDeletes" -> (createMultiRowGroupOrdersWithDeletes(_, _)),
    "createOrdersFullRowgroupDelete" -> (createOrdersFullRowgroupDelete(_, _)),
    "createOrdersWithLongPaths" -> (createOrdersWithLongPaths(_, _)),
    "createSmallOrdersWithLargeDeleteFile" ->
      ((s: SparkSession, w: String) => createSmallOrdersWithLargeDeleteFile(s, w)),
    "createSmallOrdersWithPartitionEvolution" -> (createSmallOrdersWithPartitionEvolution(_, _)),
    "createUnpartitionedOrdersWithDeletes" -> (createUnpartitionedOrdersWithDeletes(_, _)),
    "createLargeUnpartitionedOrdersWithDeletes" ->
      ((s: SparkSession, w: String) => createLargeUnpartitionedOrdersWithDeletes(s, w)),
    "createProductsWithEqDeletes" -> (createProductsWithEqDeletes(_, _)),
    "createProductsWithEqDeletesSchemaChange" -> (createProductsWithEqDeletesSchemaChange(_, _)),
    "createWideMetrics" -> (createWideMetrics(_, _)))
}

/** CLI entry mirroring the reference's `main` (reference `Main.java:85-134`):
  * `--warehouse <path>` (default `$HOME/warehouse`), repeatable
  * `--conf k=v` applied to the session's Hadoop configuration — the S3A/GCS
  * credential plumbing of `Main.java:97-116` (connector jars themselves are
  * out of scope offline, but the conf reaches any filesystem that is on the
  * classpath), `--scenario <name>|all` (fixes the comment-toggling
  * anti-pattern of `run()`).
  */
object GenMain {

  /** `k=v` pairs from repeatable `--conf` flags (ref `Main.java:97-105`).
    * Value-aware linear walk (other flags' values are skipped), so a flag
    * value that happens to be the literal string "--conf" can't alias. */
  def parseConfs(args: Array[String]): Seq[(String, String)] = {
    var confs = Vector.empty[(String, String)]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--conf" if i + 1 < args.length =>
          val kv = args(i + 1)
          require(kv.contains("="), s"--conf expects k=v, got $kv")
          val Array(k, v) = kv.split("=", 2)
          confs :+= (k, v); i += 2
        case "--warehouse" | "--scenario" if i + 1 < args.length => i += 2
        case flag @ ("--conf" | "--warehouse" | "--scenario") =>
          // trailing valueless flag: fail fast, never silently ignore
          throw new IllegalArgumentException(s"$flag requires a value")
        case _ => i += 1
      }
    }
    confs
  }

  def main(args: Array[String]): Unit = {
    var warehouse = sys.env.getOrElse("HOME", "/tmp") + "/warehouse"
    var scenario = "all"
    val confs = parseConfs(args)
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--warehouse" if i + 1 < args.length => warehouse = args(i + 1); i += 2
        case "--scenario" if i + 1 < args.length => scenario = args(i + 1); i += 2
        case "--conf" if i + 1 < args.length => i += 2
        case flag @ ("--warehouse" | "--scenario" | "--conf") =>
          System.err.println(s"Missing value for $flag"); sys.exit(1)
        case other => System.err.println(s"Invalid option: $other"); sys.exit(1)
      }
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.sparkContext.hadoopConfiguration.set(k, v) }
    val selected =
      if (scenario == "all") Scenarios.all
      else Scenarios.all.filter(_._1 == scenario)
    require(selected.nonEmpty, s"unknown scenario $scenario")
    selected.foreach { case (n, f) =>
      println(s"Creating '$n'...")
      f(spark, warehouse)
    }
    spark.stop()
  }
}
