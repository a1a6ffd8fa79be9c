package graft

import org.apache.spark.sql.functions._

import graft.queries.AnalyticsQueries

/** Semantic gates for the round-6 analytics wave: hand-computed values on
  * toy inputs pin the math; the DuckDB oracle checks the full corpus.
  * The cohort / lag keys read the real sf0.001 events table so the
  * type-adaptive `Q.events` path is exercised too (EventsEncodingSpec owns
  * the encoding-drift matrix).
  */
class AnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("cohort_retention: offset 0 row per cohort covers all its users") {
    val got = AnalyticsQueries.queries("cohort_retention")(spark, sf).collect()
    assert(got.nonEmpty)
    // every (cohort, offset) pair is unique and offsets are non-negative
    val keys = got.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
    assert(keys.forall(_._2 >= 0L))
    // day-0 rows exist: each user is active on their own first day, so the
    // sum of n_users at offset 0 equals the total distinct user count
    val day0 = got.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = graft.queries.Q.events(spark, sf)
      .select("user_id").distinct().count()
    assert(day0 == users)
  }

  test("tpch_q3_top10: revenue ordering and the cents arithmetic") {
    val got = AnalyticsQueries.queries("tpch_q3_top10")(spark, sf).collect()
    assert(got.length <= 10 && got.nonEmpty)
    val revs = got.map(_.getLong(2))
    assert(revs.sameElements(revs.sortBy(-_)), "descending revenue")
    // cross-check one order's revenue against a direct recomputation
    val k = got(0).getLong(0)
    val expect = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_orderkey") === k &&
        col("l_shipdate").cast("timestamp") > to_timestamp(lit("1997-06-01")))
      .select(graft.queries.Q.cents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"))
      .agg(sum("c")).collect()(0).getLong(0)
    assert(got(0).getLong(2) == expect)
  }

  test("profile_columns: nulls, distincts, and reprs on a toy frame") {
    val t = java.nio.file.Files.createTempDirectory("prof").toString
    Seq((1L, "A", "HI", 10.5), (2L, "B", "LO", 20.25), (3L, "B", null: String, 10.5))
      .toDF("o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$t/orders.parquet")
    val got = AnalyticsQueries.queries("profile_columns")(spark, t)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSeq
    assert(got == Seq(
      ("o_custkey", 0L, 3L, "1", "3"),
      ("o_orderpriority", 1L, 2L, "HI", "LO"),
      ("o_orderstatus", 0L, 2L, "A", "B"),
      ("o_totalprice", 0L, 2L, "1050", "2025")))
  }

  test("hist_price_bucket: clamp puts the tail in bucket 19") {
    val t = java.nio.file.Files.createTempDirectory("hist").toString
    Seq(0.0, 24999.99, 25000.0, 499999.0, 999999.0)
      .toDF("o_totalprice").write.mode("overwrite")
      .parquet(s"$t/orders.parquet")
    val got = AnalyticsQueries.queries("hist_price_bucket")(spark, t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 2L), (1L, 1L), (19L, 2L)))
  }

  test("window_lag_delta: per-user deltas with the event_id tie-break") {
    // users' per-event deltas recomputed naively on the driver must match
    val ev = graft.queries.Q.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("_us"),
        graft.queries.Q.cents(col("value")).as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).map { case (u, rows) =>
      val s = rows.sortBy(r => (r._3, r._2)).map(_._4)
      val deltas = s.drop(1).zip(s.dropRight(1)).map { case (a, b) => math.abs(a - b) }
      (u, deltas.length.toLong, deltas.sum)
    }.toSet
    val got = AnalyticsQueries.queries("window_lag_delta")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("quality_binned_sample: bins partition the corpus; keep rate rises with bin") {
    val got = AnalyticsQueries.queries("quality_binned_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(got.map(_._2).sum == total, "bins must partition the corpus")
    // bin ranges are disjoint and increasing: each bin's min >= previous max
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._5, s"bin ${b._1} overlaps bin ${a._1}")
    }
    // top bin keeps everything (rate = 100%), and kept <= docs everywhere
    assert(got.last._1 == 10L && got.last._3 == got.last._2)
    got.foreach { case (_, n, k, _, _) => assert(k <= n) }
  }

  test("pagerank_fixedpoint: hand-computed ranks on a 3-node path graph") {
    val t = java.nio.file.Files.createTempDirectory("pr").toString
    // one order (key 1) by customer 1 with lines from suppliers 1 and 2:
    // nodes c1=2, s1=3, s2=5; edges 2-3, 2-5 (plus reverses)
    Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$t/orders.parquet")
    Seq((1L, 1L), (1L, 2L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$t/lineitem.parquet")
    val got = AnalyticsQueries.queries2("pagerank_fixedpoint")(spark, t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // deg: c1=2, s1=1, s2=1; share(u) = rk*17 div (20*deg)
    // it1: c1 <- s1+s2 = 2*(1e6*17 div 20)=1700000, +150000 = 1850000
    //      s1 = s2 <- c1 = 1e6*17 div 40 = 425000, +150000 = 575000
    var (c1, s) = (1000000L, 1000000L)
    for (_ <- 1 to 3) {
      val nc = 150000L + 2 * (s * 17 / 20)
      val ns = 150000L + c1 * 17 / 40
      c1 = nc; s = ns
    }
    assert(got == Seq((2L, c1), (3L, s), (5L, s)))
  }

  test("rolling_7d_active: each active day votes into seven window days") {
    val got = AnalyticsQueries.queries2("rolling_7d_active")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // recompute naively on the driver
    val ud = graft.queries.Q.events(spark, sf)
      .select(col("user_id"), expr("_us div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = ud.flatMap { case (u, d) => (0 to 6).map(i => (u, d + i)) }
      .distinct.groupBy(_._2).map { case (w, xs) => (w, xs.length.toLong) }
    assert(got.toMap == expect)
    assert(got.map(_._1).sameElements(got.map(_._1).sorted))
  }

  test("time_weighted_avg: hand-computed integral on a step series") {
    val got = AnalyticsQueries.queries2("time_weighted_avg")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // recompute one user's TWAP naively on the driver
    val (u, _, twap) = got.head
    val ev = graft.queries.Q.events(spark, sf)
      .where(col("user_id") === u)
      .select(col("event_id"), col("_us"), graft.queries.Q.cents(col("value")).as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(r => (r._2, r._1))
    val segs = ev.zip(ev.drop(1)).map { case ((_, t1, v), (_, t2, _)) => (v, t2 - t1) }
    val expect = math.round(segs.map { case (v, d) => v.toDouble * d }.sum /
      segs.map(_._2).sum.toDouble * 1e6) / 1e6
    assert(twap == expect, s"user $u: $twap vs $expect")
  }

  test("brand_affinity: lift definition on the real corpus") {
    val got = AnalyticsQueries.queries2("brand_affinity")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r => assert(r.getLong(2) >= 20L) } // support floor
    // symmetric pair check: b < b2 always (each pair appears once)
    got.foreach { r => assert(r.getString(0) < r.getString(1)) }
  }

  test("events_anomaly_zscore: flagged hours really deviate by > 2 sd") {
    val flagged = AnalyticsQueries.queries2("events_anomaly_zscore")(spark, sf)
      .collect()
    // on the toy sf the set may be empty; the invariant is |z| > 2 when present
    flagged.foreach { r => assert(math.abs(r.getDouble(3)) > 2.0, r) }
  }

  test("quality_lr_logit: hand-computed logit on a known doc") {
    val t = java.nio.file.Files.createTempDirectory("lr").toString
    Seq((7L, "Good doc here"), (8L, "!!! ??? ;;; ### $$$ %%%"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$t/documents.parquet")
    val got = AnalyticsQueries.queries("quality_lr_logit")(spark, t)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    // doc 7: L=13, T=3, P=0 → -1.5 + .026 + .03 = -1.444
    assert(got(0) == ((7L, -1.444, false)))
    // doc 8: L=23, T=1 (norm collapses to ''), P=18
    val l8 = math.round((-1.5 + 0.002 * 23 + 0.01 * 1 - 0.05 * 18) * 1e6) / 1e6
    assert(got(1)._2 == l8 && !got(1)._3)
  }
}
