package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.GraftSchema
import ValueGen._

/** A record bundle = the expression-based analog of the reference's
  * `RecordGenerator<T>` (reference `RecordGenerator.java:3-5`): given a row-id
  * range and the live table schema, produce a DataFrame of generated rows.
  * Ids are globally monotonic across appends — the generator passes
  * `idStart` (reference `ValueGenerator.java:28-30` analog), which is what
  * makes the S10 golden counts work (later inserts get fresh ids).
  */
trait RecordBundle {
  def frame(spark: SparkSession, idStart: Long, n: Int,
            partitionValue: Option[Any], schema: GraftSchema): DataFrame
}

object Bundles {

  private def base(spark: SparkSession, idStart: Long, n: Int): DataFrame =
    spark.range(idStart, idStart + n).toDF("__id")

  private val id = col("__id")
  private val intId = col("__id").cast("int")

  // ---- orders (reference `Main.java:475-509`) --------------------------

  val ProductNames = Seq("Widget", "Gizmo", "Gadget") // `Main.java:50`

  /** Shared orders columns given an order_year column (`Main.java:475-484`). */
  private def ordersCols(yearCol: Column, sourceIdCol: Column, seed: Long): Seq[Column] = Seq(
    intId.as("order_id"),
    yearCol.cast("int").as("order_year"),
    timestampInYear(id, seed, "order_date", yearCol.cast("int")).as("order_date"),
    sourceIdCol.cast("int").as("source_id"),
    concat(select(id, seed, "product_name", ProductNames), lit(" "),
      intRange(id, seed, "product_num", 0, 100).cast("string")).as("product_name"),
    doubleRange(id, seed, "amount", 0, 100).as("amount"))

  /** Partitioned on order_year (`generateOrdersRecord`, `Main.java:475-484`). */
  def orders(seed: Long = DefaultSeed): RecordBundle =
    (spark, idStart, n, pv, _) => {
      val year = lit(pv.get.asInstanceOf[Int])
      base(spark, idStart, n).select(
        ordersCols(year, intRange(id, seed, "source_id", 0, 5), seed): _*)
    }

  /** Partitioned on source_id, random year (`Main.java:486-497`). */
  def ordersSourcePartition(seed: Long = DefaultSeed): RecordBundle =
    (spark, idStart, n, pv, _) => {
      val year = intRange(id, seed, "order_year", 2019, 2022)
      base(spark, idStart, n).select(
        ordersCols(year, lit(pv.get.asInstanceOf[Int]), seed): _*)
    }

  /** Unpartitioned, random year (`Main.java:499-509`). */
  def ordersUnpartitioned(seed: Long = DefaultSeed): RecordBundle =
    (spark, idStart, n, _, _) => {
      val year = intRange(id, seed, "order_year", 2019, 2022)
      base(spark, idStart, n).select(
        ordersCols(year, intRange(id, seed, "source_id", 0, 5), seed): _*)
    }

  // ---- products (reference `Main.java:522-588`) ------------------------

  val ProductNameTemplates = Seq( // `Main.java:62-66`
    "Core%s", "%sPress", "%sLab", "Ever%s", "%sScope",
    "%sKit", "%sTron", "%sView", "%sBuddy", "Home%s")
  val ProductSuffixes = Seq("", "", "Advanced", "1000", "2000", // `Main.java:68-69`
    "Deluxe", "Express", "Ultimate")
  val Colors = Seq("black", "white", "red", "orange", "yellow", // `Main.java:71-74`
    "green", "blue", "purple", "brown", "gray")

  /** Schema-adaptive products generator: columns assigned by live-schema
    * field name, surviving add/drop column (`createProductsRecordGenerator`,
    * `Main.java:543-588`). Deterministic-by-id columns observable in the
    * golden counts: color = COLORS[id % 10] (`Main.java:536`), created_date =
    * LocalDate(2022 - id/12, 12 - id%12, 1) (`Main.java:537`).
    */
  def products(seed: Long = DefaultSeed): RecordBundle =
    (spark, idStart, n, pv, schema) => {
      val category = pv.get.asInstanceOf[String]
      val template = select(id, seed, "name_template", ProductNameTemplates)
      val baseName = call_function("format_string", template, lit(category.capitalize))
      val suffix = select(id, seed, "name_suffix", ProductSuffixes)
      val name = when(suffix === "", baseName)
        .otherwise(concat(baseName, lit(" "), suffix))
      val byName: Map[String, Column] = Map(
        "product_id" -> intId,
        "name" -> name,
        "category" -> lit(category),
        "color" -> element_at(array(Colors.map(lit): _*),
          (pmod(id, lit(10L)) + 1).cast("int")),
        // NB `/` is double division on Columns; Java's id/12 is integer div
        "created_date" -> make_date(lit(2022) - floor(intId / 12).cast("int"),
          lit(12) - pmod(intId, lit(12)), lit(1)),
        "weight" -> doubleRange(id, seed, "weight", 0.1, 50.0),
        "quantity" -> intRange(id, seed, "quantity", 0, 10000))
      base(spark, idStart, n).select(
        schema.names.map(f => byName(f).as(f)): _*)
    }

  // ---- wide metrics (reference `Main.java:596-603`, schema `:76-82`) ---

  def wideMetrics(nCols: Int = 1000, seed: Long = DefaultSeed): RecordBundle =
    (spark, idStart, n, _, _) => {
      val metrics = (0 until nCols - 1).map(i =>
        doubleRange(id, seed, s"metric_$i", 0, 100).as(s"metric_$i"))
      base(spark, idStart, n).select(intId.as("id") +: metrics: _*)
    }
}
