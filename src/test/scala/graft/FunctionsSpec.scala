package graft

import org.apache.spark.sql.functions._

/** Equivalence proofs for the native Catalyst expressions: numerically
  * identical to the built-in md5-hex chains they replace (which is what
  * keeps the DuckDB oracle contract intact). */
class FunctionsSpec extends SparkSpec {

  test("md5prefix64 == conv(substr(md5(x),1,15),16,10) on arbitrary strings") {
    val df = spark.range(2000).select(
      concat(lit("probe-"), col("id").cast("string")).as("s"))
    val mismatches = df.select(
      expr("md5prefix64(cast(s as binary))").as("fast"),
      expr("cast(conv(substr(md5(cast(s as binary)), 1, 15), 16, 10) as bigint)")
        .as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("md5lanes4 == the four ('0x'||substr(md5,1+8j,8)) hex slices") {
    val df = spark.range(2000).select(
      concat(lit("lane-"), col("id").cast("string")).as("s"))
    val slices = (0 until 4).map(j =>
      s"cast(conv(substr(md5(cast(s as binary)), ${1 + 8 * j}, 8), 16, 10) as bigint)")
      .mkString("array(", ", ", ")")
    val mismatches = df.select(
      expr("md5lanes4(cast(s as binary))").as("fast"),
      expr(slices).as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("md5prefix64 survives whole-stage codegen (no interpreted fallback)") {
    // force evaluation through a codegen'd projection over a real scan
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr("md5prefix64(cast(text as binary))").as("h"))
    assert(df.agg(countDistinct(col("h"))).head().getLong(0) > 400)
    // the expression must not be CodegenFallback
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.functions.Md5Prefix64]))
  }
}
