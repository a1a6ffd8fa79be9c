package graft

import org.apache.spark.sql.functions._

import graft.gen.{Bundles, ValueGen}

class ValueGenSpec extends SparkSpec {

  private def ids(n: Int) = spark.range(n).toDF("__id")

  test("same seed ⇒ identical columns across evaluations (retry safety)") {
    val a = ids(1000).select(ValueGen.intRange(col("__id"), 42, "t", 0, 5).as("v"))
      .collect().map(_.getInt(0)).toSeq
    val b = ids(1000).select(ValueGen.intRange(col("__id"), 42, "t", 0, 5).as("v"))
      .collect().map(_.getInt(0)).toSeq
    assert(a == b)
  }

  test("different seeds / tags decorrelate") {
    val base = ids(100).select(ValueGen.intRange(col("__id"), 42, "t", 0, 1000).as("v"))
      .collect().map(_.getInt(0)).toSeq
    val otherSeed = ids(100).select(ValueGen.intRange(col("__id"), 43, "t", 0, 1000).as("v"))
      .collect().map(_.getInt(0)).toSeq
    val otherTag = ids(100).select(ValueGen.intRange(col("__id"), 42, "u", 0, 1000).as("v"))
      .collect().map(_.getInt(0)).toSeq
    assert(base != otherSeed && base != otherTag)
  }

  test("intRange/doubleRange bounds") {
    val r = ids(5000).select(
      ValueGen.intRange(col("__id"), 42, "i", 2019, 2022).as("i"),
      ValueGen.doubleRange(col("__id"), 42, "d", 0.1, 50.0).as("d"))
      .agg(min(col("i")), max(col("i")), min(col("d")), max(col("d"))).head()
    assert(r.getInt(0) >= 2019 && r.getInt(1) <= 2021)
    assert(r.getDouble(2) >= 0.1 && r.getDouble(3) < 50.0)
    // all three years hit
    val years = ids(5000)
      .select(ValueGen.intRange(col("__id"), 42, "i", 2019, 2022).as("i"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(years == Set(2019, 2020, 2021))
  }

  test("no-arg timestamp() quirk: year ∈ [1, currentYear − 10] (ValueGenerator.java:36-38)") {
    val ts = ids(20000).select(
      ValueGen.timestampAnyYear(col("__id"), 42, "ts", currentYear = 2026).as("ts"))
    val r = ts.agg(min(year(col("ts"))).as("min_y"), max(year(col("ts"))).as("max_y"),
      max(hour(col("ts"))).as("max_hour")).head()
    assert(r.getInt(0) >= 1 && r.getInt(1) <= 2016, r.toString)
    assert(r.getInt(0) < 100 && r.getInt(1) > 1950) // both tails actually reached
    assert(r.getInt(2) <= 22) // inherits the hour quirk
  }

  test("timestamp quirks preserved: Feb ≤ 28, hour ∈ [0,22] (ValueGenerator.java:53-54,64)") {
    val ts = ids(20000).select(
      ValueGen.timestampInYear(col("__id"), 42, "ts", lit(2020)).as("ts"))
    val r = ts.agg(
      max(when(month(col("ts")) === 2, dayofmonth(col("ts")))).as("max_feb_day"),
      max(hour(col("ts"))).as("max_hour"),
      min(month(col("ts"))).as("min_m"), max(month(col("ts"))).as("max_m"),
      countDistinct(year(col("ts"))).as("n_years")).head()
    assert(r.getInt(0) <= 28)
    assert(r.getInt(1) == 22) // nextInt(23) quirk: hour 23 never occurs
    assert(r.getInt(2) == 1 && r.getInt(3) == 12)
    assert(r.getLong(4) == 1L)
  }

  test("select() draws every choice") {
    val got = ids(1000)
      .select(ValueGen.select(col("__id"), 42, "s", Bundles.ProductNames).as("v"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(got == Bundles.ProductNames.toSet)
  }

  test("products bundle: color/created_date deterministic by id (Main.java:536-537)") {
    val df = Bundles.products().frame(spark, 0, 24, Some("widget"),
      graft.scenarios.Scenarios.ProductsSchema)
    // cast to string: date rendering independent of JVM default timezone
    val rows = df.select(col("product_id"), col("color"),
      col("created_date").cast("string")).collect()
    rows.foreach { r =>
      val id = r.getInt(0)
      assert(r.getString(1) == Bundles.Colors(id % 10))
      val d = java.time.LocalDate.parse(r.getString(2))
      assert(d.getYear == 2022 - id / 12 && d.getMonthValue == 12 - id % 12 &&
        d.getDayOfMonth == 1)
    }
  }

  test("orders bundle: product_name shape 'Name N'") {
    val df = Bundles.orders().frame(spark, 0, 100, Some(2020),
      graft.scenarios.Scenarios.OrdersSchema)
    val ok = df.where(col("product_name").rlike("^(Widget|Gizmo|Gadget) \\d{1,2}$"))
    assert(ok.count() == 100)
  }
}
