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
