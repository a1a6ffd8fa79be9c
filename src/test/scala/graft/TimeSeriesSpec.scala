package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ops

/** Semantic gates for the time-series operators: resample/forward-fill on
  * a hand-built grid and the event-time RANGE window's tie handling.
  */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  test("resampleFfill: dense grid, max-per-bucket, gaps carry the last value") {
    val obs = Seq(
      ("a", 10L, 5L), ("a", 10L, 7L),          // bucket tie → max 7
      ("a", 13L, 2L),                           // gap 11, 12 ← fill 7
      ("b", 3L, 9L)).toDF("k", "b", "v")
    val got = Ops.resampleFfill(obs, "k", "b", "v")
      .orderBy("k", "b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("a", 10L, 7L), ("a", 11L, 7L), ("a", 12L, 7L), ("a", 13L, 2L),
      ("b", 3L, 9L)))
  }

  test("resampleFfill: adjacent buckets, multi-bucket gap, negative buckets") {
    // pins the closed-form array fill (r12): adjacent observations emit
    // exactly one grid row each, a 2-wide gap repeats the prior value
    // twice, and the grid math holds for negative bucket indices
    val obs = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 5L, 5L),   // adjacent + gap 3,4
      ("b", -2L, 8L), ("b", 0L, 9L)).toDF("k", "b", "v")
    val got = Ops.resampleFfill(obs, "k", "b", "v")
      .orderBy("k", "b").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 2L), ("a", 4L, 2L), ("a", 5L, 5L),
      ("b", -2L, 8L), ("b", -1L, 8L), ("b", 0L, 9L)))
  }

  test("event-time RANGE window includes every tie row in the frame") {
    // two rows at the same timestamp: each row's frame contains BOTH
    // (RANGE frames are value-based) — the property the oracle relies on
    val ev = Seq((1L, 100L, 10L), (2L, 100L, 20L), (3L, 5000000000L, 1L))
      .toDF("id", "us", "c")
    val w = Window.orderBy("us").rangeBetween(-3600L * 1000000L, 0L)
    val got = ev.select(col("id"), sum("c").over(w).as("s"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 30L), (2L, 30L), (3L, 1L)))
  }
}
