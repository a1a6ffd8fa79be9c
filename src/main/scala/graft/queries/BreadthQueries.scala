package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** Relational-breadth inventory: the operator families a user of a general
  * engine expects beyond the reference's own surface (SURVEY.md §2.8's
  * "no reference implementation" list) — partitioned-layout pruning,
  * rollup/cube, set ops, ranking windows, running windows, JSON
  * extraction, as-of joins. Each is oracle-checked.
  */
object BreadthQueries {

  /** Hive-partitioned copy of lineitem (by l_returnflag), written once per
    * (jvm, sfDir) — the partitioned-SINK op; reads against it exercise
    * Catalyst's partition-directory pruning (`PartitionFilters`, the
    * `Expressions.in` analog on physical layout). */
  private val partitionedDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def partitionedLineitem(s: SparkSession, d: String): String =
    partitionedDirs.computeIfAbsent(d, _ => {
      val out = Files.createTempDirectory("graft-part-li").toString
      tbl(s, d, "lineitem").write.partitionBy("l_returnflag")
        .mode("overwrite").parquet(out)
      out
    })

  val queries: Map[String, QueryFn] = Map(
    "partition_prune" -> ((s, d) => {
      s.read.parquet(partitionedLineitem(s, d))
        .where(col("l_returnflag") === "R")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("l_quantity"))).as("qty_cents"))
        .orderBy("l_linestatus")
    }),

    "rollup_agg" -> ((s, d) => {
      tbl(s, d, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("o_totalprice"))).as("price_cents"))
        .select(coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("cnt"), col("price_cents"))
        .orderBy("prio", "status")
    }),

    "cube_agg" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("cnt"))
        .orderBy("rf", "ls")
    }),

    "set_ops" -> ((s, d) => {
      val orders = tbl(s, d, "orders")
      val any = orders.select(col("o_custkey")).distinct()
      val frequent = orders.groupBy("o_custkey").count()
        .where(col("count") >= 3).select(col("o_custkey"))
      val all = tbl(s, d, "customer").select(col("c_custkey").as("o_custkey"))
      any.intersect(frequent).agg(count(lit(1)).as("n_frequent_buyers"))
        .crossJoin(any.except(frequent).agg(count(lit(1)).as("n_casual_buyers")))
        .crossJoin(all.except(any).agg(count(lit(1)).as("n_never_bought")))
    }),

    "window_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), col("c_custkey"))
      tbl(s, d, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"),
          row_number().over(w).as("rn"), rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .where(col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    }),

    // skew-safe exact top-k per group: lineitem has only 3 return flags,
    // so the one-window formulation pushes a third of the table through
    // each of 3 tasks; Ops.topKPerGroup pre-ranks per input partition
    "window_topk_group" -> ((s, d) => {
      graft.operators.Ops.topKPerGroup(tbl(s, d, "lineitem"),
          Seq("l_returnflag"),
          Seq(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber")), 3)
        .select(col("l_returnflag"), col("rk"), col("l_orderkey"),
          col("l_linenumber"), cents(col("l_extendedprice")).as("price_cents"))
        .orderBy("l_returnflag", "rk")
    }),

    "window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, d, "orders")
        .where(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("running_n"),
          sum(cents(col("o_totalprice"))).over(w).as("running_cents"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // pivot: status counts spread across priority columns (fixed pivot
    // values keep the schema static and oracle-stable)
    // event-time rolling aggregate: per-entity RANGE window over micros —
    // frame membership is value-based so tie rows land identically in
    // both engines; cents keep the frame sums exact. The per-user
    // partition is the scale shape (parallelism = #users, frames are
    // time-bounded so state is bounded by rate × window)
    "window_time_range" -> ((s, d) => {
      val ev = Q.events(s, d).select(col("event_id"), col("user_id"),
        cents(col("value")).as("vc"), col("_us"))
      val w = Window.partitionBy("user_id").orderBy("_us")
        .rangeBetween(-3600L * 1000000L, 0L)
      ev.select(col("event_id"), col("user_id"),
          sum("vc").over(w).as("roll_cents"))
        .orderBy("event_id")
    }),

    // hourly resample + forward fill per user: bucket to hours (max value
    // per bucket — commutative, so bucket ties are order-free), explode
    // each user's [first, last] hour grid, forward-fill gaps with the
    // running last non-null. The grid never has a leading null (the first
    // grid hour contains an event by construction)
    "events_resample" -> ((s, d) => {
      val ev = Q.events(s, d).select(col("user_id"),
        expr("_us div 3600000000").as("h"), cents(col("value")).as("vc"))
      graft.operators.Ops.resampleFfill(ev, "user_id", "h", "vc")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_hours"), sum("fv").as("filled_cents"))
        .orderBy("user_id")
    }),

    // click→purchase funnel: first click per user, earliest purchase
    // within 6h of it — two partial-aggregated passes and one hash join
    // on the user key, never a per-user window over raw events
    "funnel_conversion" -> ((s, d) => {
      val ev = Q.events(s, d).select(col("user_id"), col("event_type"), col("_us"))
      val fc = ev.where(col("event_type") === "click")
        .groupBy("user_id").agg(min("_us").as("c_us"))
      val conv = ev.where(col("event_type") === "purchase")
        .join(fc, "user_id")
        .where(col("_us") >= col("c_us") &&
          col("_us") <= col("c_us") + lit(21600L * 1000000L))
        .groupBy("user_id").agg(min(col("_us") - col("c_us")).as("delay_us"))
      fc.join(conv, Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_click_users"),
          count(col("delay_us")).as("n_converted"),
          coalesce(sum("delay_us"), lit(0L)).as("delay_us_sum"))
    }),

    // wide→long melt through the native UNPIVOT (Expand) operator — the
    // inverse of pivot_agg; per-row cents conversion keeps the double
    // sums exact cross-engine
    "unpivot_melt" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
        .groupBy("l_returnflag", "measure")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("value_cents"))
        .orderBy("l_returnflag", "measure")
    }),

    // statistical co-moments per group: corr/covar/stddev run as partial
    // aggregates (Chan et al. merge formulas) — one shuffle of constant-
    // width state per group, the 100 TB shape; rounded so accumulation-
    // order ulps can't flip the DuckDB compare
    "stat_agg" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"))
        .orderBy("l_returnflag")
    }),

    // skew-proof exact per-key distinct: shuffle on (key, value) first so
    // a hot key's values spread across the cluster, then count surviving
    // pairs (graft.operators.Ops.twoStageDistinct; plan-gated)
    "agg_skew_distinct" -> ((s, d) => {
      graft.operators.Ops.twoStageDistinct(
          tbl(s, d, "lineitem"), "l_returnflag", "l_partkey")
        .withColumnRenamed("n_distinct", "n_parts")
        .orderBy("l_returnflag")
    }),

    "pivot_agg" -> ((s, d) => {
      tbl(s, d, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
          coalesce(col("2-HIGH"), lit(0L)).as("high"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("medium"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("notspec"),
          coalesce(col("5-LOW"), lit(0L)).as("low"))
        .orderBy("o_orderstatus")
    }),

    // exact interpolated percentiles (both engines: linear interpolation)
    "percentile_agg" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .groupBy("l_returnflag")
        // single aggregation buffer for all three percentiles
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("p50"),
          round(element_at(col("ps"), 2), 4).as("p90"),
          round(element_at(col("ps"), 3), 4).as("p99"))
        .orderBy("l_returnflag")
    }),

    // GK-sketch percentiles (Spark's approx_percentile): the 100 TB path —
    // the exact `percentile` above buffers every distinct value per group,
    // this keeps a bounded sketch. Sketch values are engine-specific, so
    // the ORACLE IS A TOLERANCE CONTRACT: the row carries the exact
    // percentiles (DuckDB recomputes those) plus within-2%-of-exact flags
    // for the sketch values (accuracy=1000 ⇒ rank error ≤0.1% ⇒ value
    // error ≤~0.4% on this data — 2% is 5× margin; DuckDB asserts `true`).
    // A sketch drifting past tolerance turns the flag false → hash
    // mismatch → red row, exactly like any other wrong answer.
    "sketch_approx_percentile" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)")
          .as("ap"),
          expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ep"))
        .select(col("l_returnflag"),
          round(element_at(col("ep"), 1), 4).as("p50"),
          round(element_at(col("ep"), 2), 4).as("p90"),
          round(element_at(col("ep"), 3), 4).as("p99"),
          (abs(element_at(col("ap"), 1) - element_at(col("ep"), 1)) <=
            element_at(col("ep"), 1) * 0.02).as("p50_in_tol"),
          (abs(element_at(col("ap"), 2) - element_at(col("ep"), 2)) <=
            element_at(col("ep"), 2) * 0.02).as("p90_in_tol"),
          (abs(element_at(col("ap"), 3) - element_at(col("ep"), 3)) <=
            element_at(col("ep"), 3) * 0.02).as("p99_in_tol"))
        .orderBy("l_returnflag")
    }),

    "json_extract" -> ((s, d) => {
      ExtQueries.eventsWithTs(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("k").as("k_sum"),
          max("k").as("k_max"))
        .orderBy("event_type")
    }),

    // explicit GROUPING SETS (beyond rollup/cube) through the SQL surface
    "grouping_sets_agg" -> ((s, d) => {
      tbl(s, d, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |       coalesce(o_orderpriority, 'ALL') AS prio,
          |       count(1) AS cnt
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, prio""".stripMargin)
    }),

    // string-function family (shared-semantics subset: no initcap in DuckDB)
    "str_funcs" -> ((s, d) => {
      tbl(s, d, "part")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"),
          sum(length(replace(col("p_type"), lit(" "), lit("")))).as("type_chars"),
          min(upper(substring(col("p_name"), 1, 8))).as("first_name"),
          max(levenshtein(col("p_brand"), col("p_type"))).as("max_lev"))
        .orderBy("p_brand")
    }),

    // date/time extraction + truncation family
    "date_funcs" -> ((s, d) => {
      tbl(s, d, "orders")
        .select(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"))
        .groupBy("y", "m")
        .agg(count(lit(1)).as("cnt"), min("dom").as("first_day"),
          max("dom").as("last_day"))
        .orderBy("y", "m")
    }),

    // HLL++ sketches: approximate distinct counts at 2% target relative
    // standard deviation — the sketch path for cardinalities where exact
    // countDistinct's shuffle is the bottleneck. Estimates are
    // engine-specific, so the ORACLE IS A TOLERANCE CONTRACT: exact
    // cardinalities (DuckDB recomputes) + within-5%-of-exact flags for the
    // sketch (2.5σ margin; DuckDB asserts `true`).
    // exact sides as pre-deduplicated counts (distinct → count) rather
    // than countDistinct in the same agg: two narrow dedup shuffles with
    // map-side partial dedup beat one 3× Expand of the full scan
    "sketch_approx_distinct" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      val approx = li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("_ap"),
          approx_count_distinct(col("l_suppkey"), 0.02).as("_as"))
      val exParts = li.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("exact_parts"))
      val exSupps = li.select("l_returnflag", "l_suppkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("exact_supps"))
      approx.join(exParts, Seq("l_returnflag")).join(exSupps, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_supps"),
          (abs(col("_ap") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("parts_in_tol"),
          (abs(col("_as") - col("exact_supps")) <=
            col("exact_supps") * 0.05).as("supps_in_tol"))
        .orderBy("l_returnflag")
    }),

    // range join: events matched to the 90-minute "incident windows" of
    // their own event type (windows start at hours divisible by 3). Runs
    // through Ops.bucketedRangeJoin — hash equi-join on (type, time
    // bucket) + residual, never the nested-loop a raw theta join plans.
    "join_range_bucketed" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      val e = ExtQueries.eventsWithTs(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          col("_us").as("us"))
      val iv = e.where(hour(expr("timestamp_micros(us)")) % 3 === 0)
        .select(col("event_type"), expr(s"(us div $hourUs) * $hourUs").as("ws"))
        .distinct()
        .withColumn("we", col("ws") + lit(90L * 60000000L))
      graft.operators.Ops.bucketedRangeJoin(e, iv, Seq("event_type"),
          "us", "ws", "we", bucketWidth = 2L * hourUs)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hits"), sum(cents(col("value"))).as("value_cents"))
        .orderBy("event_type")
    }),

    // the SAME range-join contract through the NATIVE whole-operator
    // extension (plans/RangeJoinPlan.scala: custom LogicalPlan + Strategy
    // + one-sweep SparkPlan with an active-interval buffer): identical
    // result and oracle as join_range_bucketed, no bucket replication, no
    // residual filter — EnsureRequirements clusters both sides on the
    // type key and the per-partition sweep is O(points + intervals +
    // matches)
    "join_range_native" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      val e = ExtQueries.eventsWithTs(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          col("_us").as("us"))
      val iv = e.where(hour(expr("timestamp_micros(us)")) % 3 === 0)
        .select(col("event_type").as("iv_type"),
          expr(s"(us div $hourUs) * $hourUs").as("ws"))
        .distinct()
        .withColumn("we", col("ws") + lit(90L * 60000000L))
      graft.plans.RangeJoinApi.rangeJoin(e, iv,
          "event_type", "iv_type", "us", "ws", "we")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hits"), sum(cents(col("value"))).as("value_cents"))
        .orderBy("event_type")
    }),

    // as-of join: each purchase matched to the user's most recent click at
    // or before it (equi-join on user + range residual + max-reduce; exact
    // and order-free, so tie semantics match the oracle's NOT EXISTS-free
    // max() formulation)
    "asof_join" -> ((s, d) => {
      val ev = ExtQueries.eventsWithTs(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("_ts").as("p_ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("_ts").as("c_ts"))
      purchases.join(clicks,
          col("user_id") === col("c_user") && col("c_ts") <= col("p_ts"), "left")
        .groupBy("event_id", "user_id", "p_ts")
        .agg(max(col("c_ts")).as("last_click"))
        .agg(count(lit(1)).as("n_purchases"),
          count(col("last_click")).as("n_with_prior_click"),
          sum(unix_micros(col("p_ts")) - unix_micros(col("last_click"))).as("gap_us_sum"))
    }),

    // the same point-in-time lookup through the NATIVE as-of operator
    // (custom LogicalPlan + Strategy + one-pass merging SparkPlan,
    // `plans/AsOfJoinPlan.scala`): one output row per purchase with no
    // candidate-pair materialization — the composed formulation above
    // joins every qualifying click first and max-reduces after; this one
    // never does. Same oracle as asof_join, so the driver hash-checks the
    // custom operator's result directly against DuckDB.
    "asof_join_native" -> ((s, d) => {
      val ev = ExtQueries.eventsWithTs(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("_us").as("p_us"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("_us").as("c_us"))
      graft.plans.AsOfJoinApi.asofJoin(purchases, clicks,
          "user_id", "c_user", "p_us", "c_us")
        .agg(count(lit(1)).as("n_purchases"),
          count(col("c_us")).as("n_with_prior_click"),
          sum(col("p_us") - col("c_us")).as("gap_us_sum"))
    }),

    // bounded-staleness as-of (pandas merge_asof tolerance / kdb wj): the
    // native operator finds the latest prior click, then a row-local
    // predicate voids matches staler than 2 h. Tolerance composes OUTSIDE
    // the merge because the latest-prior row either satisfies the bound
    // or no row does — so the operator itself never needs a tolerance
    // parameter.
    "asof_join_tolerance" -> ((s, d) => {
      val ev = ExtQueries.eventsWithTs(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("_us").as("p_us"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("_us").as("c_us"))
      val tolUs = 7200L * 1000000L
      graft.plans.AsOfJoinApi.asofJoin(purchases, clicks,
          "user_id", "c_user", "p_us", "c_us")
        .select(col("p_us"),
          when(col("p_us") - col("c_us") <= tolUs, col("c_us")).as("m_us"))
        .agg(count(lit(1)).as("n_purchases"),
          count(col("m_us")).as("n_fresh_match"),
          sum(col("p_us") - col("m_us")).as("gap_us_sum"))
    }),

    // 3-stage funnel (signup → first click after it → first purchase
    // after that) as TWO chained native as-of joins: "earliest at-or-
    // after" is "latest at-or-before" on NEGATED times, so the same
    // one-pass merge operator answers forward-looking sequence queries —
    // no window over raw events, no candidate-pair join at any stage.
    // Rows whose click stage missed carry a null time into stage two and
    // come back null-extended (the operator's null contract), exactly the
    // funnel semantics.
    "funnel3_asof" -> ((s, d) => {
      val ev = ExtQueries.eventsWithTs(s, d)
        .select(col("user_id"), col("event_type"), col("_us"))
      val signups = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min("_us").as("s_us"))
        .select(col("user_id"), (-col("s_us")).as("ns"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), (-col("_us")).as("nc"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), (-col("_us")).as("np"))
      val stage1 = graft.plans.AsOfJoinApi.asofJoin(
        signups, clicks, "user_id", "c_user", "ns", "nc")
        .select(col("user_id"), col("ns"), col("nc"))
      val stage2 = graft.plans.AsOfJoinApi.asofJoin(
        stage1, purchases, "user_id", "p_user", "nc", "np")
      stage2.agg(count(lit(1)).as("n_signup_users"),
        count(col("nc")).as("n_reached_click"),
        count(col("np")).as("n_reached_purchase"),
        sum(col("ns") - col("np")).as("funnel_us_sum"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "partition_prune" ->
      """SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "rollup_agg" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS prio,
        |       coalesce(o_orderstatus, 'ALL') AS status,
        |       CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY prio, status""".stripMargin,

    "cube_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "set_ops" ->
      """WITH any_b AS (SELECT DISTINCT o_custkey FROM orders),
        |freq AS (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM (SELECT * FROM any_b INTERSECT SELECT * FROM freq)) AS BIGINT)
        |    AS n_frequent_buyers,
        |  CAST((SELECT COUNT(*) FROM (SELECT * FROM any_b EXCEPT SELECT * FROM freq)) AS BIGINT)
        |    AS n_casual_buyers,
        |  CAST((SELECT COUNT(*) FROM (SELECT c_custkey FROM customer
        |        EXCEPT SELECT o_custkey FROM any_b)) AS BIGINT) AS n_never_bought""".stripMargin,

    "window_rank" ->
      """SELECT c_mktsegment, c_custkey,
        |       CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_cents,
        |       CAST(rn AS INTEGER) AS rn, CAST(rnk AS INTEGER) AS rnk,
        |       CAST(drnk AS INTEGER) AS drnk
        |FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,

    "window_topk_group" ->
      """SELECT l_returnflag, CAST(rk AS INTEGER) AS rk, l_orderkey,
        |       l_linenumber, CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_cents
        |FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        |  FROM lineitem)
        |WHERE rk <= 3 ORDER BY l_returnflag, rk""".stripMargin,

    "window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS running_n,
        |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER w AS BIGINT)
        |         AS running_cents
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "grouping_sets_agg" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS prio,
        |       CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, prio""".stripMargin,

    "str_funcs" ->
      """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(length(replace(p_type, ' ', ''))) AS BIGINT) AS type_chars,
        |       MIN(upper(substr(p_name, 1, 8))) AS first_name,
        |       CAST(MAX(levenshtein(p_brand, p_type)) AS INTEGER) AS max_lev
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "date_funcs" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
        |       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
        |       CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(MIN(EXTRACT(day FROM o_orderdate)) AS INTEGER) AS first_day,
        |       CAST(MAX(EXTRACT(day FROM o_orderdate)) AS INTEGER) AS last_day
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,

    "window_time_range" ->
      """SELECT event_id, user_id,
        |       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
        |         PARTITION BY user_id
        |         ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |       AS BIGINT) AS roll_cents
        |FROM events ORDER BY event_id""".stripMargin,

    "events_resample" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |         CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events),
        |hv AS (SELECT user_id, h, MAX(vc) AS hv FROM ev GROUP BY user_id, h),
        |rng AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM ev GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM rng),
        |ff AS (SELECT g.user_id, g.h,
        |         last_value(hv.hv IGNORE NULLS) OVER (
        |           PARTITION BY g.user_id ORDER BY g.h
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
        |       FROM grid g LEFT JOIN hv
        |         ON g.user_id = hv.user_id AND g.h = hv.h)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |       CAST(SUM(fv) AS BIGINT) AS filled_cents
        |FROM ff GROUP BY user_id ORDER BY user_id""".stripMargin,

    "funnel_conversion" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |fc AS (SELECT user_id, MIN(us) AS c_us FROM ev
        |       WHERE event_type = 'click' GROUP BY user_id),
        |conv AS (SELECT p.user_id, MIN(p.us - fc.c_us) AS delay_us
        |         FROM ev p JOIN fc USING (user_id)
        |         WHERE p.event_type = 'purchase'
        |           AND p.us >= fc.c_us AND p.us <= fc.c_us + 21600000000
        |         GROUP BY p.user_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_click_users,
        |       CAST(COUNT(conv.delay_us) AS BIGINT) AS n_converted,
        |       CAST(COALESCE(SUM(conv.delay_us), 0) AS BIGINT) AS delay_us_sum
        |FROM fc LEFT JOIN conv USING (user_id)""".stripMargin,

    "unpivot_melt" ->
      """SELECT l_returnflag, measure, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM (
        |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
        |GROUP BY l_returnflag, measure
        |ORDER BY l_returnflag, measure""".stripMargin,

    "stat_agg" ->
      """SELECT l_returnflag,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |       round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
        |       round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |       round(AVG(l_quantity), 6) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_skew_distinct" ->
      """SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "pivot_agg" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS notspec,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "percentile_agg" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // tolerance contract: exact percentiles recomputed here; the in_tol
    // flags assert the Spark sketch landed within 2% of them
    "sketch_approx_percentile" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        |       true AS p50_in_tol, true AS p90_in_tol, true AS p99_in_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // tolerance contract: exact cardinalities recomputed here; the in_tol
    // flags assert the HLL++ estimate landed within 5%
    "sketch_approx_distinct" ->
      """SELECT l_returnflag,
        |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
        |       true AS parts_in_tol, true AS supps_in_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "json_extract" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "join_range_bucketed" ->
      """WITH e AS (SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS t
        |           FROM events),
        |iv AS (SELECT DISTINCT event_type, date_trunc('hour', t) AS ws
        |       FROM e WHERE EXTRACT(hour FROM t) % 3 = 0)
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_hits,
        |       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM e JOIN iv ON e.event_type = iv.event_type
        |              AND e.t >= iv.ws AND e.t < iv.ws + INTERVAL 90 MINUTE
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // identical contract to join_range_bucketed — the operator differs,
    // the answer must not
    "join_range_native" ->
      """WITH e AS (SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS t
        |           FROM events),
        |iv AS (SELECT DISTINCT event_type, date_trunc('hour', t) AS ws
        |       FROM e WHERE EXTRACT(hour FROM t) % 3 = 0)
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_hits,
        |       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM e JOIN iv ON e.event_type = iv.event_type
        |              AND e.t >= iv.ws AND e.t < iv.ws + INTERVAL 90 MINUTE
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "asof_join" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS c_ts
        |      FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.event_id, p.p_ts,
        |         (SELECT MAX(c.c_ts) FROM c
        |          WHERE c.user_id = p.user_id AND c.c_ts <= p.p_ts) AS last_click
        |  FROM p)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(COUNT(last_click) AS BIGINT) AS n_with_prior_click,
        |       CAST(SUM(epoch_us(p_ts) - epoch_us(last_click)) AS BIGINT) AS gap_us_sum
        |FROM m""".stripMargin,

    "asof_join_native" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_us
        |      FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.event_id, p.p_us,
        |         (SELECT MAX(c.c_us) FROM c
        |          WHERE c.user_id = p.user_id AND c.c_us <= p.p_us) AS last_c
        |  FROM p)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(COUNT(last_c) AS BIGINT) AS n_with_prior_click,
        |       CAST(SUM(p_us - last_c) AS BIGINT) AS gap_us_sum
        |FROM m""".stripMargin,

    "asof_join_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_us
        |      FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.event_id, p.p_us,
        |         (SELECT MAX(c.c_us) FROM c
        |          WHERE c.user_id = p.user_id AND c.c_us <= p.p_us) AS last_c
        |  FROM p),
        |t AS (SELECT p_us,
        |        CASE WHEN p_us - last_c <= 7200000000 THEN last_c END AS m_us
        |      FROM m)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(COUNT(m_us) AS BIGINT) AS n_fresh_match,
        |       CAST(SUM(p_us - m_us) AS BIGINT) AS gap_us_sum
        |FROM t""".stripMargin,

    "funnel3_asof" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |s AS (SELECT user_id, MIN(us) AS s_us FROM ev
        |      WHERE event_type = 'signup' GROUP BY user_id),
        |m1 AS (SELECT s.user_id, s.s_us,
        |         (SELECT MIN(c.us) FROM ev c
        |          WHERE c.event_type = 'click' AND c.user_id = s.user_id
        |            AND c.us >= s.s_us) AS c_us
        |       FROM s),
        |m2 AS (SELECT m1.user_id, m1.s_us, m1.c_us,
        |         (SELECT MIN(p.us) FROM ev p
        |          WHERE p.event_type = 'purchase' AND p.user_id = m1.user_id
        |            AND m1.c_us IS NOT NULL AND p.us >= m1.c_us) AS p_us
        |       FROM m1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_signup_users,
        |       CAST(COUNT(c_us) AS BIGINT) AS n_reached_click,
        |       CAST(COUNT(p_us) AS BIGINT) AS n_reached_purchase,
        |       CAST(SUM(p_us - s_us) AS BIGINT) AS funnel_us_sum
        |FROM m2""".stripMargin
  )
}
