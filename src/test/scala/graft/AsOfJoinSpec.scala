package graft

import org.apache.spark.sql.functions._

import graft.plans.AsOfJoinApi

/** The custom as-of join operator: semantics on a hand-built grid, the
  * one-pass merge contract in the physical plan, and equivalence to the
  * composed join+groupBy+max formulation on real data.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  test("asof: latest right row at or before each left time, per key") {
    val quotes = Seq( // (key, time, px)
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 15L, "x")).toDF("q_key", "q_us", "px")
    val trades = Seq( // (key, time)
      (1L, 5L),   // before any quote -> null
      (1L, 20L),  // exact tie -> 'b' (<= is inclusive)
      (1L, 25L),  // between -> 'b'
      (1L, 99L),  // after all -> 'c'
      (2L, 15L),  // other key isolated -> 'x'
      (3L, 50L)   // key with no quotes -> null
    ).toDF("t_key", "t_us")
    val got = AsOfJoinApi.asofJoin(trades, quotes, "t_key", "q_key", "t_us", "q_us")
      .orderBy("t_key", "t_us")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(4)) null else r.getString(4))).toSeq
    assert(got == Seq(
      (1L, 5L, null), (1L, 20L, "b"), (1L, 25L, "b"), (1L, 99L, "c"),
      (2L, 15L, "x"), (3L, 50L, null)))
  }

  test("asof: plan is AsOfJoinExec — no SortMergeJoin, no pair blow-up aggregate") {
    val l = Seq((1L, 1L)).toDF("k", "t")
    val r = Seq((1L, 1L)).toDF("rk", "rt")
    val df = AsOfJoinApi.asofJoin(l, r, "k", "rk", "t", "rt")
    val p = df.queryExecution.executedPlan.toString
    // the exec node prints by nodeName ("AsOfJoin"); EnsureRequirements
    // must have inserted the key exchange + (key, time) sort on BOTH sides
    assert(p.contains("AsOfJoin "), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"), p)
    assert(p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning")) == 2, p)
    assert(p.linesIterator.count(_.contains("Sort [")) == 2, p)
  }

  test("asof: equivalent to the composed join+groupBy+max on sf0.001 events") {
    val ev = graft.queries.Q.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("_us").as("p_us"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("_us").as("c_us"))
    val native = AsOfJoinApi.asofJoin(purchases, clicks,
        "user_id", "c_user", "p_us", "c_us")
      .select(col("event_id"), col("c_us"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val composed = purchases.join(clicks,
        col("user_id") === col("c_user") && col("c_us") <= col("p_us"), "left")
      .groupBy("event_id").agg(max("c_us").as("last_c"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("funnel3_asof: stage counts are monotone and stage-1 matches a recompute") {
    val r = graft.queries.BreadthQueries.queries("funnel3_asof")(
      spark, "/root/testdata/sf0.001").collect()(0)
    val (s0, s1, s2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s0 >= s1 && s1 >= s2 && s0 > 0, (s0, s1, s2))
    // stage-1 count recomputed via a plain aggregate formulation
    val ev = graft.queries.Q.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"), col("_us"))
    val s = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("_us").as("s_us"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("_us").as("c_us"))
    val expectS1 = s.join(c, col("user_id") === col("cu") &&
        col("c_us") >= col("s_us"), "left")
      .groupBy("user_id").agg(min("c_us").as("fc"))
      .agg(count(col("fc"))).collect()(0).getLong(0)
    assert(s1 == expectS1)
  }

  test("asof: rejects non-long times and colliding names") {
    val l = Seq((1L, 1L)).toDF("k", "t")
    intercept[IllegalArgumentException] {
      AsOfJoinApi.asofJoin(l, Seq((1L, "x")).toDF("rk", "rt"), "k", "rk", "t", "rt")
    }
    intercept[IllegalArgumentException] {
      AsOfJoinApi.asofJoin(l, Seq((1L, 1L)).toDF("k", "rt"), "k", "k", "t", "rt")
    }
  }
}
