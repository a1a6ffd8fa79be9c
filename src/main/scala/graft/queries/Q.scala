package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the declared query inventory (SURVEY.md §2.8/§2.9).
  *
  * Oracle-compat rules (see FIXTURES.md "Oracle-harness notes"):
  *   - Money/double sums go through [[cents]]: per-row `round(x*100)` is
  *     deterministic IEEE arithmetic in both Spark and DuckDB, and the
  *     subsequent BIGINT sum is exact — immune to float summation order.
  *   - Every query imposes a total ORDER BY.
  *   - DuckDB `SUM(BIGINT)` returns HUGEINT → oracle SQL always wraps
  *     aggregates in `CAST(... AS BIGINT)` to match Spark's LongType.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact integer cents from a 2-decimal double (deterministic per row). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
}
