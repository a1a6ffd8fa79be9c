package graft

import org.apache.spark.sql.functions._

import graft.plans.RangeJoinApi

/** The custom point-in-interval join operator: semantics on a hand-built
  * grid (nesting, overlap, boundaries, key isolation), the one-sweep
  * contract in the physical plan, and full equivalence to the composed
  * bucketed range join on real data.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("range: start <= t < end, all matching intervals, per key") {
    val ivs = Seq( // (key, id, start, end) — overlapping AND nested
      (1L, 100L, 10L, 30L),
      (1L, 101L, 20L, 40L),  // overlaps 100
      (1L, 102L, 22L, 25L),  // nested inside both
      (1L, 103L, 90L, 95L),  // isolated late window
      (2L, 200L, 0L, 100L)   // other key
    ).toDF("i_key", "iv_id", "ws", "we")
    val pts = Seq( // (key, point id, t)
      (1L, 1L, 5L),   // before all -> none
      (1L, 2L, 10L),  // start boundary inclusive -> 100
      (1L, 3L, 23L),  // inside all three -> 100,101,102
      (1L, 4L, 25L),  // end boundary of 102 exclusive -> 100,101
      (1L, 5L, 30L),  // end of 100 exclusive -> 101
      (1L, 6L, 50L),  // gap -> none
      (1L, 7L, 92L),  // late window after eviction of all others -> 103
      (2L, 8L, 50L),  // other key -> 200
      (3L, 9L, 50L)   // keyless -> none
    ).toDF("p_key", "pt_id", "t")
    val got = RangeJoinApi.rangeJoin(pts, ivs, "p_key", "i_key", "t", "ws", "we")
      .select("pt_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (2L, 100L), (3L, 100L), (3L, 101L), (3L, 102L),
      (4L, 100L), (4L, 101L), (5L, 101L), (7L, 103L), (8L, 200L)))
  }

  test("range: plan is RangeJoinExec — clustered exchanges, no nested loop") {
    val p1 = Seq((1L, 1L)).toDF("k", "t")
    val i1 = Seq((1L, 0L, 2L)).toDF("ik", "ws", "we")
    val df = RangeJoinApi.rangeJoin(p1, i1, "k", "ik", "t", "ws", "we")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RangeJoin "), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2, p)
    assert(p.linesIterator.count(_.contains("Sort [")) == 2, p)
  }

  test("range: equivalent to Ops.bucketedRangeJoin on sf0.001 events") {
    val native = SparkEntry.queries("join_range_native")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val bucketed = SparkEntry.queries("join_range_bucketed")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == bucketed,
      s"native=${native.toSeq.sorted} bucketed=${bucketed.toSeq.sorted}")
  }

  test("range: builder rejects non-long bounds and colliding names") {
    val p1 = Seq((1L, 1L)).toDF("k", "t")
    val bad = Seq((1L, "x", "y")).toDF("ik", "ws", "we")
    intercept[IllegalArgumentException](
      RangeJoinApi.rangeJoin(p1, bad, "k", "ik", "t", "ws", "we"))
    val clash = Seq((1L, 0L, 2L)).toDF("k", "ws", "we")
    intercept[IllegalArgumentException](
      RangeJoinApi.rangeJoin(p1, clash, "k", "k", "t", "ws", "we"))
  }
}
