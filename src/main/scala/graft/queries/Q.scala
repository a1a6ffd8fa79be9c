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

  /** Adaptive `events` reader. The driver has shipped `events.ts` under two
    * physical parquet encodings across data drops: TIMESTAMP(NANOS) — which
    * Spark 4 only loads as a long under `nanosAsLong` — and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which loads as
    * TIMESTAMP_NTZ. The engine must not bind to one physical encoding of an
    * input it doesn't control, so branch on the LOADED type and normalize
    * both to the same derived columns:
    *   - `_us`: long microseconds since epoch (nanos truncated, exactly as
    *     DuckDB's `CAST(ts AS TIMESTAMP)` truncates), and
    *   - `_ts`: session-TZ TIMESTAMP at micro precision (sessions here are
    *     UTC, so the NTZ→LTZ cast is wall-clock identity).
    * Every oracle's `CAST(ts AS TIMESTAMP)` agrees with `_ts` under either
    * encoding. `nanosAsLong` stays set so the long branch re-engages if the
    * data reverts to NANOS.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = tbl(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("_us", expr("ts div 1000"))
          .withColumn("_ts", expr("timestamp_micros(_us)"))
      case org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.TimestampType =>
        df.withColumn("_ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("_us", unix_micros(col("_ts")))
      case other =>
        throw new IllegalStateException(
          s"events.ts loaded as unsupported type $other")
    }
  }

  /** Exact integer cents from a 2-decimal double (deterministic per row). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
}
