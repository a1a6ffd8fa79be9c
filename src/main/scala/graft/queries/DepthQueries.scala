package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._
import graft.ext.TextOps

/** Round-7 wave A: time-series repair (calendar-spine gap fill, exact
  * integer EWMA), graph analytics (degree-oriented triangle counting),
  * data-quality expectations (the Deequ-shaped validation report), a
  * distributed pareto frontier, and corpus entropy — each with the scale
  * shape a 1000-executor cluster needs and a DuckDB oracle row-for-row.
  */
object DepthQueries {

  private def docs(s: SparkSession, d: String) = tbl(s, d, "documents")

  val queries: Map[String, QueryFn] = Map(

    // calendar-spine gap fill with last-observation-carried-forward, in
    // closed form. The "last reading per (user, hour)" is a lexicographic
    // max_by — one partially-aggregated exchange of (user, hour) partials
    // instead of a row_number window that shuffles and sorts EVERY event
    // row (guide §2.3 "aggregate before you shuffle"). The LOCF spine sums
    // then fall out of each user's sorted (hour, value) observation array
    // without materializing the dense grid: every observation covers the
    // hours up to the next observation, so its LOCF contribution is
    // value × gap-width, and n_hours/n_gaps are span arithmetic. Two
    // partial-agg exchanges, zero window sorts, zero joins — per-user
    // state stays span-bounded exactly like the exploded spine was.
    "gap_fill_locf" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      val ev = Q.events(s, d).select(col("user_id"), col("event_id"),
        col("_us"), expr(s"_us div $hourUs").as("h"), cents(col("value")).as("vc"))
      // max(struct) = row of the lexicographically-largest (_us, event_id):
      // identical survivor to ORDER BY _us DESC, event_id DESC LIMIT 1
      val hourly = ev.groupBy("user_id", "h")
        .agg(max(struct(col("_us"), col("event_id"), col("vc")))
          .getField("vc").as("vc"))
      hourly.groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("h"), col("vc")))).as("obs"))
        .select(col("user_id"),
          expr("element_at(obs, size(obs)).h - element_at(obs, 1).h + 1L")
            .as("n_hours"),
          expr("element_at(obs, size(obs)).h - element_at(obs, 1).h + 1L" +
            " - size(obs)").as("n_gaps"),
          // Σ value·(next_h − h); the last observation covers exactly its
          // own hour (it is the span's max). zip_with pads the shifted
          // array with null, so coalesce closes the final interval.
          expr("""aggregate(
              zip_with(obs, slice(obs, 2, greatest(size(obs) - 1, 0)),
                (o, nx) -> o.vc * (coalesce(nx.h, o.h + 1L) - o.h)),
              0L, (acc, x) -> acc + x)""").as("locf_cents_sum"))
        .orderBy("user_id")
    }),

    // OHLC downsampling (the market-data resample shape): per (type, hour)
    // bar with open/close picked by rank inside micro-partitions of a few
    // rows and high/low/volume as plain aggregates — deterministic because
    // the event order is total ((_us, event_id) tie-break) and prices are
    // integer cents
    "events_ohlc" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      val ev = Q.events(s, d).select(col("event_type"),
        expr(s"_us div $hourUs").as("h"), col("_us"), col("event_id"),
        cents(col("value")).as("vc"))
      val wAsc = Window.partitionBy("event_type", "h")
        .orderBy(col("_us").asc, col("event_id").asc)
      val wDesc = Window.partitionBy("event_type", "h")
        .orderBy(col("_us").desc, col("event_id").desc)
      ev.withColumn("rn_o", row_number().over(wAsc))
        .withColumn("rn_c", row_number().over(wDesc))
        .groupBy("event_type", "h")
        .agg(sum(when(col("rn_o") === 1, col("vc"))).as("open_c"),
          max("vc").as("high_c"), min("vc").as("low_c"),
          sum(when(col("rn_c") === 1, col("vc"))).as("close_c"),
          count(lit(1)).as("volume"))
        .orderBy("event_type", "h")
    }),

    // event-sequence trigram mining (the user-journey pattern primitive):
    // per-user consecutive event-type triples via two leads over the
    // total (time, id) order, then one partial-aggregated count on the
    // trigram key — top 25 journeys corpus-wide via TakeOrdered
    "event_trigrams" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("_us", "event_id")
      Q.events(s, d).select(col("user_id"), col("event_id"), col("_us"),
          col("event_type"))
        .select(col("event_type").as("e1"),
          lead("event_type", 1).over(w).as("e2"),
          lead("event_type", 2).over(w).as("e3"))
        .where(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("e1"), col("e2"), col("e3"))
        .limit(25)
    }),

    // exponentially weighted moving average over each user's last 24
    // readings, EXACT in integers: weight 2^(24-rn) for recency rank rn
    // makes numerator and denominator order-free long sums (cents ≤ 2^17
    // × weight ≤ 2^23 × 24 terms — 2^46 headroom); the one division runs
    // on identical operands in both engines. The rank window is per-user.
    "ewma_user" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("_us").desc, col("event_id").desc)
      Q.events(s, d)
        .select(col("user_id"), col("event_id"), col("_us"),
          cents(col("value")).as("vc"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 24)
        .select(col("user_id"), col("vc"),
          expr("shiftleft(1L, 24 - rn)").as("wt"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_readings"),
          sum(col("vc") * col("wt")).as("num"), sum("wt").as("den"))
        .select(col("user_id"), col("n_readings"), col("num"), col("den"),
          round(col("num").cast("double") / col("den").cast("double") / 100.0, 6)
            .as("ewma"))
        .orderBy("user_id")
    }),

    // triangle counting over the supplier co-occurrence graph (suppliers
    // sharing ≥5 orders), with DEGREE ORIENTATION — each undirected edge
    // points from its lower-(degree, id) endpoint, so every triangle is
    // generated exactly once from its lowest-degree pivot and wedge
    // generation is Σ out-deg² with out-deg ≤ O(√m), not Σ deg². The
    // closing-edge check is a semi-join against the canonical edge set —
    // hash joins end to end, nothing quadratic in nodes. The count and
    // node-key checksum are orientation-invariant, so the oracle replays
    // the plain a<b<c 3-way join.
    "graph_triangles" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
      // the thresholded edge set feeds THREE consumers (degrees,
      // orientation, the closing-edge probe): one materialization, not
      // three replays of the pair explode
      val e = li.select(col("ok"), col("sk").as("s1"))
        .join(li.select(col("ok").as("ok2"), col("sk").as("s2")),
          col("ok") === col("ok2") && col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("nco"))
        .where(col("nco") >= 5).select("s1", "s2")
        .localCheckpoint()
      val deg = e.select(col("s1").as("n")).unionAll(e.select(col("s2").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val or = e
        .join(deg.select(col("n").as("n1"), col("dg").as("dg1")), col("s1") === col("n1"))
        .join(deg.select(col("n").as("n2"), col("dg").as("dg2")), col("s2") === col("n2"))
        .select(
          when(col("dg1") < col("dg2") ||
               (col("dg1") === col("dg2") && col("s1") < col("s2")),
            struct(col("s1").as("src"), col("s2").as("dst")))
            .otherwise(struct(col("s2").as("src"), col("s1").as("dst"))).as("o"))
        .select(col("o.src").as("src"), col("o.dst").as("dst"))
        .localCheckpoint() // both sides of the wedge self-join
      val wedges = or
        .join(or.select(col("src").as("src2"), col("dst").as("dst2")),
          col("src") === col("src2") && col("dst") < col("dst2"))
        .select(col("src").as("p"),
          col("dst").as("x"), col("dst2").as("y"))
      wedges.join(e, col("x") === col("s1") && col("y") === col("s2"), "left_semi")
        .agg(count(lit(1)).as("n_triangles"),
          coalesce(sum(col("p") + col("x") + col("y")), lit(0L)).as("node_key_sum"))
    }),

    // data-quality expectations report (the Deequ/Great-Expectations
    // shape): one row per rule with checked/violation counts. Uniqueness
    // and enum/range rules are map-side aggregates; referential integrity
    // is a hash anti-join on the key — every rule partition-parallel,
    // nothing driver-side. The report is what a 100 TB ingest gate reads.
    "dq_expectations" -> ((s, d) => {
      val ord = tbl(s, d, "orders")
      val li = tbl(s, d, "lineitem")
      val cust = tbl(s, d, "customer")
      def rule(name: String, checked: DataFrame, viol: DataFrame): DataFrame =
        checked.crossJoin(viol).select(lit(name).as("rule"),
          col("n_checked"), col("n_violations"))
      val nOrd = ord.agg(count(lit(1)).as("n_checked"))
      val nLi = li.agg(count(lit(1)).as("n_checked"))
      val r1 = rule("lineitem.discount_range", nLi,
        li.agg(count(when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1))
          .as("n_violations")))
      val r2 = rule("lineitem.fk_orders", nLi,
        li.join(ord.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_violations")))
      val r3 = rule("lineitem.quantity_range", nLi,
        li.agg(count(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1))
          .as("n_violations")))
      val r4 = rule("orders.fk_customer", nOrd,
        ord.join(cust.select("c_custkey"),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_violations")))
      val r5 = rule("orders.orderdate_not_null", nOrd,
        ord.agg(count(when(col("o_orderdate").isNull, 1)).as("n_violations")))
      val r6 = rule("orders.pk_unique", nOrd,
        ord.select("o_orderkey").groupBy("o_orderkey")
          .agg(count(lit(1)).as("c")).where(col("c") > 1)
          .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_violations")))
      val r7 = rule("orders.status_enum", nOrd,
        ord.agg(count(when(!col("o_orderstatus").isin("O", "F", "P"), 1))
          .as("n_violations")))
      val r8 = rule("orders.totalprice_positive", nOrd,
        ord.agg(count(when(col("o_totalprice") <= 0.0, 1)).as("n_violations")))
      Seq(r1, r2, r3, r4, r5, r6, r7, r8).reduce(_ unionAll _).orderBy("rule")
    }),

    // pareto frontier of parts (maximize size, minimize price): fully
    // declarative two-level skyline. The per-price max collapses the
    // data-scale table to the price DOMAIN; the strict-prefix running max
    // over prices then runs bucketed (in-bucket window partitioned by
    // bucket + broadcast bucket-prefix offsets — the bucketedRunningTotal
    // decomposition, nothing single-partition at data scale). A part is
    // on the frontier iff it meets its price's max size and strictly
    // beats every cheaper price's max.
    "pareto_frontier" -> ((s, d) => {
      val p = tbl(s, d, "part").select(col("p_partkey"), col("p_size"),
        cents(col("p_retailprice")).as("price_cents"))
      val per = p.groupBy("price_cents").agg(max("p_size").as("m_eq"))
        .withColumn("bk", expr("price_cents div 500"))
      val wIn = Window.partitionBy("bk").orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
      val inb = per.withColumn("m_in", max("m_eq").over(wIn))
      val wBk = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
      val off = per.groupBy("bk").agg(max("m_eq").as("bmax"))
        .select(col("bk").as("obk"), max("bmax").over(wBk).as("m_prev"))
      val aug = inb.join(broadcast(off), col("bk") === col("obk"), "left")
        .select(col("price_cents").as("apc"), col("m_eq"),
          greatest(coalesce(col("m_in"), lit(-1)),
            coalesce(col("m_prev"), lit(-1))).as("m_lt"))
      p.join(aug, col("price_cents") === col("apc"))
        .where(col("p_size") === col("m_eq") && col("p_size") > col("m_lt"))
        .select("p_partkey", "p_size", "price_cents")
        .orderBy("p_partkey")
    }),

    // the full TPC-H Q1 aggregate battery (pricing summary report): one
    // map-side-combined shuffle on the 6-group key, with every money
    // product rounded to integer cents PER ROW before summation (the
    // disc_price/charge chains are identical IEEE multiply sequences in
    // both engines) and the averages derived from those exact sums — the
    // flagship "wide scan, narrow aggregate" shape whose filter must reach
    // the parquet scan
    "tpch_q1_full" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty"),
          cents(col("l_extendedprice")).as("base_c"),
          expr("cast(round(l_extendedprice * (1 - l_discount) * 100, 0) as long)")
            .as("disc_c"),
          expr("cast(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0) as long)")
            .as("charge_c"),
          expr("cast(round(l_discount * 10000, 0) as long)").as("disc_bp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("qty").as("sum_qty"),
          sum("base_c").as("sum_base_cents"),
          sum("disc_c").as("sum_disc_price_cents"),
          sum("charge_c").as("sum_charge_cents"),
          count(lit(1)).as("count_order"),
          round(sum("qty").cast("double") / count(lit(1)), 6).as("avg_qty"),
          round(sum("base_c").cast("double") / count(lit(1)), 6).as("avg_price_cents"),
          round(sum("disc_bp").cast("double") / count(lit(1)), 6).as("avg_disc_bp"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q5 (local-supplier revenue by nation): the join-graph
    // flagship — fact-fact join on the order key, dims resolved through
    // an explicitly broadcast nation⋈region subtree, the date slice
    // pushed to the orders scan, and the same-nation residual applied
    // post-join. The shape AQE + broadcast planning must keep shuffle-free
    // on every dimension edge.
    "tpch_q5" -> ((s, d) => {
      val asiaNations = tbl(s, d, "nation")
        .join(tbl(s, d, "region").where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val ord = tbl(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
               col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      tbl(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          expr("cast(round(l_extendedprice * (1 - l_discount) * 100, 0) as long)")
            .as("disc_c"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(tbl(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(tbl(s, d, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum("disc_c").as("revenue_cents"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    }),

    // TPC-H Q7 (volume shipping): the two-hop fact chain (lineitem →
    // orders → customer) with the supplier and BOTH nation dims filtered
    // BEFORE their broadcasts (dim-side pushdown — only the two probed
    // nations ever ship), year extracted from the pushed shipdate slice,
    // and the asymmetric pair condition applied as a residual. Nation
    // pairs parameterized to the generator's populated lanes.
    "tpch_q7" -> ((s, d) => {
      val n1 = tbl(s, d, "nation")
        .where(col("n_name").isin("NATION_20", "NATION_18"))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = tbl(s, d, "nation")
        .where(col("n_name").isin("NATION_11", "NATION_19"))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      tbl(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          expr("cast(round(l_extendedprice * (1 - l_discount) * 100, 0) as long)")
            .as("volume_c"))
        .join(broadcast(tbl(s, d, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(tbl(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(tbl(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .where((col("supp_nation") === "NATION_20" && col("cust_nation") === "NATION_11") ||
               (col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum("volume_c").as("revenue_cents"), count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q18 (large-volume customers): the grouped-HAVING semi-join —
    // the per-order quantity aggregate reduces the fact table to a tiny
    // qualifying set that BROADCASTS back onto orders (no fact-fact
    // shuffle), then the customer dim resolves names. Total order on
    // (total, date, key) keeps the LIMIT deterministic.
    "tpch_q18" -> ((s, d) => {
      val big = tbl(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .where(col("sum_qty") > 250)
      tbl(s, d, "orders")
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .join(tbl(s, d, "customer").select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), cents(col("o_totalprice")).as("total_cents"),
          col("sum_qty"))
        .orderBy(col("total_cents").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q6 (forecasting revenue): the pure pushdown showcase — every
    // predicate reaches the parquet scan (shipdate slice, discount band,
    // quantity cap), one partial-final aggregate, zero joins, zero shuffles
    // beyond the final single-row combine
    "tpch_q6" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
               col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
               col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice") * col("l_discount")))
            .as("revenue_cents"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q4 shape (order priority checking): EXISTS → LEFT SEMI join
    // with a mixed equi + non-equi condition (shipped after the order
    // date, the commit/receipt adaptation for this schema); semi build
    // never duplicates orders whatever the lineitem fan-out
    "tpch_q4" -> ((s, d) => {
      val ord = tbl(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
               col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      val li = tbl(s, d, "lineitem").select("l_orderkey", "l_shipdate")
      ord.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q8 shape (national market share): 5-way star with the region
    // filter pushed into the customer dim BEFORE broadcast and a CASE
    // numerator; the share division is left to the consumer (numerator +
    // denominator cents are exact integers — no FP hazard in the oracle)
    "tpch_q8" -> ((s, d) => {
      val asiaCust = tbl(s, d, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(tbl(s, d, "nation")
          .join(tbl(s, d, "region").where(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val econParts = tbl(s, d, "part").where(col("p_type") === "ECONOMY")
        .select("p_partkey")
      tbl(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("vol_c"))
        .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
        .join(tbl(s, d, "orders")
            .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                   col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select(col("o_orderkey"), col("o_custkey"),
              year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(tbl(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(tbl(s, d, "nation")
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("o_year")
        .agg(sum(when(col("n_name") === "NATION_20", col("vol_c"))
            .otherwise(0L)).as("nation_cents"),
          sum(col("vol_c")).as("total_cents"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 shape (product-type profit): part-name substring filter
    // broadcast into the fact, supplier nation × ship year rollup
    "tpch_q9" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("o_year"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("amount_c"))
        .join(broadcast(tbl(s, d, "part")
            .where(col("p_name").contains("widget")).select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(tbl(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(tbl(s, d, "nation")
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(sum("amount_c").as("profit_cents"),
          count(lit(1)).as("n_items"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q10 (returned item reporting): quarter of orders × returned
    // lines, customer/nation dims broadcast, top 20 by revenue with a
    // total order (revenue, custkey) so the LIMIT is deterministic
    "tpch_q10" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .where(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev_c"))
        .join(tbl(s, d, "orders")
            .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                   col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
            .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(tbl(s, d, "customer")
            .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
              cents(col("c_acctbal")).as("acctbal_cents"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(tbl(s, d, "nation")
            .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("acctbal_cents"),
          col("n_name"))
        .agg(sum("rev_c").as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q13 (customer distribution): LEFT OUTER fact join with the
    // filter on the JOIN (not the customer), then a two-level aggregate —
    // orders-per-customer, customers-per-count
    "tpch_q13" -> ((s, d) => {
      val ord = tbl(s, d, "orders")
        .where(col("o_orderpriority") =!= "5-LOW")
        .select("o_custkey")
      tbl(s, d, "customer").select("c_custkey")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q14 (promotion effect): CASE numerator over the part-type
    // dim join; promo and total cents returned as exact integers
    "tpch_q14" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
               col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_partkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev_c"))
        .join(broadcast(tbl(s, d, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", col("rev_c")).otherwise(0L))
            .as("promo_cents"),
          sum(col("rev_c")).as("total_cents"))
    }),

    // TPC-H Q17 (small-quantity-order revenue): the correlated AVG
    // subquery decorrelated into a per-part aggregate joined back; the
    // 20%-of-average threshold is evaluated in EXACT integer arithmetic
    // (5·qty·cnt < Σqty — quantities are integral, products stay exact)
    "tpch_q17" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          cents(col("l_extendedprice")).as("price_c"))
      val partAvg = li.groupBy(col("l_partkey").as("ap_key"))
        .agg(sum("qty").as("qty_sum"), count(lit(1)).as("qty_cnt"))
      li.join(broadcast(tbl(s, d, "part")
            .where(col("p_brand") === "Brand#11" && col("p_type") === "SMALL")
            .select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(partAvg, col("l_partkey") === col("ap_key"))
        .where(col("qty") * 5 * col("qty_cnt") < col("qty_sum"))
        .agg(sum("price_c").as("total_cents"), count(lit(1)).as("n_items"))
    }),

    // TPC-H Q22 (global sales opportunity): global-average scalar
    // (integer cents; folded in as a broadcast one-row aggregate) +
    // NOT EXISTS anti join to orders, grouped by nation code
    "tpch_q22" -> ((s, d) => {
      val cust = tbl(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("cntrycode"),
          cents(col("c_acctbal")).as("bal_c"))
        .where(col("cntrycode").isin(1L, 3L, 5L, 7L, 9L, 11L, 13L))
      val avgBal = cust.where(col("bal_c") > 0)
        .agg((sum("bal_c") / count(lit(1))).as("avg_c"))
      cust.crossJoin(broadcast(avgBal))
        .where(col("bal_c") > col("avg_c"))
        // every generated customer HAS orders — anti-join the selective
        // urgent subset so the NOT EXISTS leg keeps real survivors
        .join(tbl(s, d, "orders")
            .where(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"), sum("bal_c").as("totacctbal_cents"))
        .orderBy("cntrycode")
    }),

    // TPC-H Q12 shape (shipping mode priority): fact join + conditional
    // priority counts, grouped on the line status lane
    "tpch_q12" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linestatus")
        .join(tbl(s, d, "orders").select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(sum(when(col("o_orderpriority") === "1-URGENT" ||
              col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
              col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // TPC-H Q2 shape (minimum-cost supplier): this schema has no partsupp,
    // so the supply relation derives from observed trade — per (part,
    // supplier) the minimum unit price ever charged (identical-operand
    // single division, exact under the cents rounding). The correlated
    // MIN-cost subquery decorrelates into a per-part aggregate joined back
    // on equality; region-filtered suppliers broadcast (dim-side pushdown
    // BEFORE the fact shuffle — at 100 TB the supply aggregate shuffles
    // once on (part, supp) and the min-join reuses the partkey exchange).
    "tpch_q2" -> ((s, d) => {
      val asiaSupp = tbl(s, d, "supplier")
        .join(broadcast(tbl(s, d, "nation")
            .join(tbl(s, d, "region").where(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          cents(col("s_acctbal")).as("acctbal_cents"))
      val supply = tbl(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          cents(col("l_extendedprice") / col("l_quantity")).as("unit_c"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(min("unit_c").as("cost_c"))
        .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
      val minCost = supply.groupBy(col("l_partkey").as("mc_key"))
        .agg(min("cost_c").as("min_cost_c"))
      supply
        .join(minCost, col("l_partkey") === col("mc_key") &&
          col("cost_c") === col("min_cost_c"))
        .join(broadcast(tbl(s, d, "part")
            .where(col("p_size").between(10, 30) && col("p_type") === "LARGE")
            .select("p_partkey", "p_name")),
          col("l_partkey") === col("p_partkey"))
        .select(col("acctbal_cents"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("cost_c"))
        .orderBy(col("acctbal_cents").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q11 shape (important stock): supply value per part among one
    // region's suppliers, kept when it exceeds 0.8% of the region total.
    // The global threshold folds in as a broadcast ONE-ROW aggregate
    // (never a fact-fact shuffle) and the comparison stays in exact
    // integers (value·125 > total — no fraction materialized).
    "tpch_q11" -> ((s, d) => {
      val asiaSupp = tbl(s, d, "supplier")
        .join(broadcast(tbl(s, d, "nation")
            .join(tbl(s, d, "region").where(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val vals = tbl(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          cents(col("l_extendedprice")).as("v_c"))
        .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"),
          "left_semi")
        .groupBy("l_partkey")
        .agg(sum("v_c").as("value_cents"))
      vals.crossJoin(broadcast(vals.agg(sum("value_cents").as("total_c"))))
        .where(col("value_cents") * 125 > col("total_c"))
        .select("l_partkey", "value_cents")
        .orderBy(col("value_cents").desc, col("l_partkey"))
    }),

    // TPC-H Q15 (top supplier): quarterly revenue per supplier, keep the
    // argmax row(s). The max is a one-row broadcast folded back by
    // equality — the classic "view + scalar subquery" without a second
    // scan of the fact (revenue aggregates once, reused for both sides).
    "tpch_q15" -> ((s, d) => {
      val rev = tbl(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("total_rev_cents"))
      rev.crossJoin(broadcast(rev.agg(max("total_rev_cents").as("max_rev"))))
        .where(col("total_rev_cents") === col("max_rev"))
        .join(broadcast(tbl(s, d, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_cents")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 shape (parts/supplier relationship): distinct observed
    // (part, supplier) pairs stand in for partsupp; suppliers below the
    // account-balance floor are the "complaints" exclusion, applied as an
    // ANTI join of a broadcast dim before the distinct-count shuffle.
    "tpch_q16" -> ((s, d) => {
      tbl(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(tbl(s, d, "supplier")
            .where(col("s_acctbal") < 1000).select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(tbl(s, d, "part")
            .where(col("p_brand") =!= "Brand#11" && col("p_type") =!= "PROMO" &&
              col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
            .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q19 (discounted revenue): the OR-of-conjuncts pushdown case.
    // The part-side disjunction (brand, size band) prunes the broadcast
    // dim BEFORE the join; the per-branch quantity band applies as the
    // join residual — the fact scan still sees the pushed quantity
    // envelope (l_quantity <= 30) so no branch widens the scan.
    "tpch_q19" -> ((s, d) => {
      val parts = tbl(s, d, "part")
        .where((col("p_brand") === "Brand#12" && col("p_size").between(1, 5)) ||
               (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)) ||
               (col("p_brand") === "Brand#7") && col("p_size").between(1, 15))
        .select("p_partkey", "p_brand")
      tbl(s, d, "lineitem")
        .where(col("l_quantity") >= 1 && col("l_quantity") <= 30)
        .select(col("l_partkey"), col("l_quantity"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev_c"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey") &&
          ((col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11)) ||
           (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20)) ||
           (col("p_brand") === "Brand#7" && col("l_quantity").between(20, 30))))
        .agg(sum("rev_c").as("revenue_cents"), count(lit(1)).as("n_items"))
    }),

    // TPC-H Q20 shape (potential part promotion): suppliers holding
    // capacity well above one year's demand for name-matched parts. The
    // availability stand-in is all-time supplied quantity per (part,
    // supp); "excess" = available > 7× the 1996 shipment. Both aggregates
    // share the (part, supp) exchange; the supplier list resolves via one
    // SEMI join (never duplicating suppliers across qualifying parts).
    "tpch_q20" -> ((s, d) => {
      val widgetKeys = tbl(s, d, "part")
        .where(col("p_name").contains("widget")).select("p_partkey")
      val li = tbl(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty"), col("l_shipdate"))
        .join(broadcast(widgetKeys), col("l_partkey") === col("p_partkey"),
          "left_semi")
      val pairAgg = li.groupBy("l_partkey", "l_suppkey")
        .agg(sum("qty").as("avail_qty"),
          sum(when(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                   col("l_shipdate") < lit("1997-01-01").cast("timestamp"),
            col("qty")).otherwise(0L)).as("qty96"))
        .where(col("qty96") > 0 && col("avail_qty") > col("qty96") * 7)
      tbl(s, d, "supplier")
        .join(pairAgg.select("l_suppkey").distinct(),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), cents(col("s_acctbal")).as("acctbal_cents"))
        .orderBy("s_name")
    }),

    // TPC-H Q21 (suppliers who kept orders waiting): the multi anti/semi
    // self-join stressor. "Late" adapts to shipped >60 days after the
    // order date (no receipt/commit columns here). The late set computes
    // ONCE and serves both the probe side and the NOT-EXISTS side; the
    // EXISTS side is the raw (order, supp) projection — both resolve as
    // broadcast-able semi/anti joins keyed on the order, so the fact
    // never self-shuffles twice at scale.
    "tpch_q21" -> ((s, d) => {
      val ordersF = tbl(s, d, "orders").where(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val lateLi = tbl(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ordersF, col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
      val allLi = tbl(s, d, "lineitem")
        .select(col("l_orderkey").as("a_ok"), col("l_suppkey").as("a_sk"))
      val lateOther = lateLi
        .select(col("l_orderkey").as("x_ok"), col("l_suppkey").as("x_sk"))
      val asiaSupp = tbl(s, d, "supplier")
        .join(broadcast(tbl(s, d, "nation")
            .join(tbl(s, d, "region").where(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      lateLi
        .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
        .join(allLi, col("a_ok") === col("l_orderkey") &&
          col("a_sk") =!= col("l_suppkey"), "left_semi")
        .join(lateOther, col("x_ok") === col("l_orderkey") &&
          col("x_sk") =!= col("l_suppkey"), "left_anti")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // per-group weighted reservoir (A-Res per language, k=5): the same
    // deterministic ln(u)/w ranking as sample_weighted, but ranked inside
    // each group through Ops.topKPerGroup's two-level decomposition — no
    // single task ever sorts a whole language's scores (the global key's
    // TakeOrdered can't group; the naive per-group window dies on skewed
    // groups at 100 TB)
    "sample_reservoir_group" -> ((s, d) => {
      val u = (TextOps.hash60(col("doc_id").cast("string")) + 1).cast("double") /
        lit(1152921504606846976.0) // 2^60
      val w = greatest(col("n_chars"), lit(1)).cast("double")
      val scored = docs(s, d).select(col("lang"), col("doc_id"),
        col("n_chars"), round(log(u) / w, 12).as("skey"))
      graft.operators.Ops.topKPerGroup(scored, Seq("lang"),
          Seq(col("skey").desc, col("doc_id").asc), 5)
        .orderBy("lang", "rk")
    }),

    // bloom-prefiltered fact⋈dim join: the dim's key set compresses to a
    // one-literal bloom the fact side probes with codegen'd bit tests
    // BEFORE its join shuffle (Ops.bloomPrefilterJoin) — no false
    // negatives, so the answer is row-identical to the plain join the
    // oracle runs; at 100 TB the prefilter is the difference between
    // shuffling the whole fact table and the matching slice
    "join_bloom_prefilter" -> ((s, d) => {
      val dim = tbl(s, d, "part")
        .where(cents(col("p_retailprice")) % 97 === 0)
        .select(col("p_partkey"), col("p_brand"))
      graft.operators.Ops.bloomPrefilterJoin(
          tbl(s, d, "lineitem").select("l_partkey", "l_extendedprice"),
          dim, "l_partkey", "p_partkey")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"),
          sum(cents(col("l_extendedprice"))).as("revenue_cents"))
        .orderBy("p_brand")
    }),

    // Johnson-Lindenstrauss random projection 64 → 16 dims (the
    // dimensionality-reduction primitive in front of ANN indexes): a ±1
    // projection matrix derived from the shared md5-based hash, elements
    // in exact 1e6 fixed point, so every projected coordinate is an
    // order-free integer sum the oracle recomputes bit-for-bit. One
    // explode + one partial-aggregated shuffle on (vec, out-dim); the
    // matrix is a FORMULA, not data — nothing broadcast, nothing trained.
    // (r12 note: a shuffle-free rewrite — literal sign array + row-local
    // zip_with sums — measured SLOWER (0.76 → 1.08 s min-of-5): Spark's
    // higher-order array functions are interpreted, not codegen'd, so at
    // this fan-out the codegen'd explode+hash-agg path wins. Kept.)
    "embed_random_project" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")))
        .toDF("vec_id", "i", "v")
        .select(col("vec_id"), col("i"),
          round(col("v").cast("double") * 1000000, 0).cast("long").as("vi"))
      val proj = e
        .select(col("vec_id"), col("i"), col("vi"),
          explode(sequence(lit(0), lit(15))).as("j"))
        .withColumn("sgn",
          when(pmod(TextOps.hash60((col("j") * 64 + col("i")).cast("string")),
            lit(2)) === 0, 1L).otherwise(-1L))
        .groupBy("vec_id", "j").agg(sum(col("sgn") * col("vi")).as("p"))
      proj.groupBy("vec_id")
        .agg(sum(abs(col("p"))).as("l1_norm"),
          sum(when(col("j") === 0, col("p"))).as("p0"),
          sum(when(col("j") === 1, col("p"))).as("p1"),
          sum(when(col("j") === 2, col("p"))).as("p2"),
          sum(when(col("j") === 3, col("p"))).as("p3"))
        .orderBy("vec_id")
    }),

    // Shannon entropy of the token distribution per source — the corpus
    // diversity monitor run after every mix change. Counts are exact
    // integer shuffles on the (source, term) key; the -Σ p·ln p fold uses
    // H = ln(N) - Σ c·ln(c) / N with each c·ln(c) term integer-ized at
    // micro-nat precision BEFORE the sum, so aggregation order can never
    // move the result (the bm25 double-rounding discipline).
    "entropy_by_source" -> ((s, d) => {
      val toks = docs(s, d)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("term"))
        .where(col("term") =!= "")
      toks.groupBy("source", "term").agg(count(lit(1)).as("cnt"))
        .groupBy("source")
        .agg(sum("cnt").as("n_tokens"), count(lit(1)).as("vocab"),
          sum(expr("cast(round(round(cnt * ln(cnt), 6) * 1000000, 0) as long)"))
            .as("s_micro"))
        .select(col("source"), col("n_tokens"), col("vocab"),
          round(expr("ln(n_tokens) - (cast(s_micro as double) / 1000000.0) / n_tokens"), 6)
            .as("entropy_nats"))
        .orderBy("source")
    })
  )

  // ---- DuckDB oracles ----------------------------------------------------

  private val normSql =
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"

  val oracleSql: Map[String, String] = Map(

    "gap_fill_locf" ->
      """WITH ev AS (SELECT user_id, event_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |              epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |              CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events),
        |hourly AS (SELECT user_id, h, vc FROM ev
        |           QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, h
        |                     ORDER BY us DESC, event_id DESC) = 1),
        |spine AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h
        |          FROM (SELECT user_id, MIN(h) h0, MAX(h) h1
        |                FROM hourly GROUP BY user_id)),
        |filled AS (SELECT s.user_id, s.h, hv.vc,
        |             LAST_VALUE(hv.vc IGNORE NULLS) OVER (
        |               PARTITION BY s.user_id ORDER BY s.h
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
        |           FROM spine s LEFT JOIN hourly hv
        |             ON s.user_id = hv.user_id AND s.h = hv.h)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |       CAST(COUNT(*) FILTER (vc IS NULL) AS BIGINT) AS n_gaps,
        |       CAST(SUM(fv) AS BIGINT) AS locf_cents_sum
        |FROM filled GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_ohlc" ->
      """WITH ev AS (SELECT event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
        |              CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events),
        |r AS (SELECT event_type, h, vc,
        |        ROW_NUMBER() OVER (PARTITION BY event_type, h
        |                           ORDER BY us ASC, event_id ASC) AS rn_o,
        |        ROW_NUMBER() OVER (PARTITION BY event_type, h
        |                           ORDER BY us DESC, event_id DESC) AS rn_c
        |      FROM ev)
        |SELECT event_type, h,
        |       CAST(SUM(CASE WHEN rn_o = 1 THEN vc END) AS BIGINT) AS open_c,
        |       CAST(MAX(vc) AS BIGINT) AS high_c,
        |       CAST(MIN(vc) AS BIGINT) AS low_c,
        |       CAST(SUM(CASE WHEN rn_c = 1 THEN vc END) AS BIGINT) AS close_c,
        |       CAST(COUNT(*) AS BIGINT) AS volume
        |FROM r GROUP BY event_type, h ORDER BY event_type, h""".stripMargin,

    "event_trigrams" ->
      """WITH s AS (SELECT user_id, event_type AS e1,
        |             LEAD(event_type, 1) OVER w AS e2,
        |             LEAD(event_type, 2) OVER w AS e3
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id
        |                        ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
        |                                 event_id))
        |SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY cnt DESC, e1, e2, e3 LIMIT 25""".stripMargin,

    "ewma_user" ->
      """WITH ev AS (SELECT user_id, event_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |              CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events),
        |r AS (SELECT user_id, vc,
        |        ROW_NUMBER() OVER (PARTITION BY user_id
        |                           ORDER BY us DESC, event_id DESC) AS rn
        |      FROM ev QUALIFY rn <= 24)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_readings,
        |       CAST(SUM(vc * (1::BIGINT << (24 - rn))) AS BIGINT) AS num,
        |       CAST(SUM(1::BIGINT << (24 - rn)) AS BIGINT) AS den,
        |       round(CAST(SUM(vc * (1::BIGINT << (24 - rn))) AS DOUBLE)
        |             / CAST(SUM(1::BIGINT << (24 - rn)) AS DOUBLE) / 100.0, 6)
        |         AS ewma
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    "graph_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
        |            FROM lineitem),
        |e AS (SELECT a.s AS s1, b.s AS s2
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.s < b.s
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |tri AS (SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
        |        FROM e e1 JOIN e e2 ON e1.s2 = e2.s1
        |        JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
        |       CAST(COALESCE(SUM(a + b + c), 0) AS BIGINT) AS node_key_sum
        |FROM tri""".stripMargin,

    "dq_expectations" ->
      """SELECT * FROM (
        |  SELECT 'lineitem.discount_range' AS rule,
        |         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_checked,
        |         CAST((SELECT COUNT(*) FROM lineitem
        |               WHERE l_discount < 0.0 OR l_discount > 0.1) AS BIGINT)
        |           AS n_violations
        |  UNION ALL
        |  SELECT 'lineitem.fk_orders',
        |         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
        |         CAST((SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |               (SELECT 1 FROM orders o
        |                WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem.quantity_range',
        |         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
        |         CAST((SELECT COUNT(*) FROM lineitem
        |               WHERE l_quantity < 1.0 OR l_quantity > 50.0) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders.fk_customer',
        |         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
        |         CAST((SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |               (SELECT 1 FROM customer c
        |                WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders.orderdate_not_null',
        |         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
        |         CAST((SELECT COUNT(*) FROM orders
        |               WHERE o_orderdate IS NULL) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders.pk_unique',
        |         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
        |         CAST((SELECT COALESCE(SUM(c - 1), 0) FROM
        |               (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey
        |                HAVING COUNT(*) > 1)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders.status_enum',
        |         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
        |         CAST((SELECT COUNT(*) FROM orders
        |               WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders.totalprice_positive',
        |         CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
        |         CAST((SELECT COUNT(*) FROM orders
        |               WHERE o_totalprice <= 0.0) AS BIGINT))
        |ORDER BY rule""".stripMargin,

    "pareto_frontier" ->
      """WITH p AS (SELECT p_partkey, p_size,
        |             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
        |           FROM part)
        |SELECT p_partkey, p_size, price_cents FROM p a
        |WHERE NOT EXISTS (SELECT 1 FROM p q
        |  WHERE (q.price_cents < a.price_cents AND q.p_size >= a.p_size)
        |     OR (q.price_cents <= a.price_cents AND q.p_size > a.p_size))
        |ORDER BY p_partkey""".stripMargin,

    "tpch_q1_full" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_base_cents,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
        |                AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0)
        |                AS BIGINT)) AS BIGINT) AS sum_charge_cents,
        |  CAST(COUNT(*) AS BIGINT) AS count_order,
        |  round(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_qty,
        |  round(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        |        / COUNT(*), 6) AS avg_price_cents,
        |  round(CAST(SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT)) AS DOUBLE)
        |        / COUNT(*), 6) AS avg_disc_bp
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
        |                AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin,

    "tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
        |                AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |         l_extendedprice, l_discount
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
        |      OR (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
        |  CAST(sq AS BIGINT) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sq
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(CAST(l_quantity AS BIGINT)) > 250) b
        |  ON o_orderkey = b.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_cents DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin,

    "tpch_q6" ->
      """SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100, 0)
        |                    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.02 AND l_discount <= 0.06
        |  AND l_quantity < 24""".stripMargin,

    "tpch_q4" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_20'
        |                THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
        |                          AS BIGINT) ELSE 0 END) AS BIGINT) AS nation_cents,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
        |                AS BIGINT)) AS BIGINT) AS total_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM customer
        |              JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |              JOIN region ON n1.n_regionkey = r_regionkey
        |              WHERE c_custkey = o_custkey AND r_name = 'ASIA')
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
        |                AS BIGINT)) AS BIGINT) AS profit_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents,
        |  n_name,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
        |                AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,

    "tpch_q13" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(COUNT(o_custkey) AS BIGINT) AS c_count
        |      FROM customer
        |      LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |        AND o_orderpriority <> '5-LOW'
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "tpch_q14" ->
      """SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |                THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
        |                          AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
        |                AS BIGINT)) AS BIGINT) AS total_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "tpch_q17" ->
      """SELECT
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |  AND p_brand = 'Brand#11' AND p_type = 'SMALL'
        |JOIN (SELECT l_partkey AS ap_key,
        |             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
        |             CAST(COUNT(*) AS BIGINT) AS qty_cnt
        |      FROM lineitem GROUP BY l_partkey) a ON l_partkey = ap_key
        |WHERE CAST(l_quantity AS BIGINT) * 5 * qty_cnt < qty_sum""".stripMargin,

    "tpch_q22" ->
      """WITH cust AS (
        |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS cntrycode,
        |         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_c
        |  FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        |SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
        |       CAST(SUM(bal_c) AS BIGINT) AS totacctbal_cents
        |FROM cust
        |WHERE bal_c > (SELECT SUM(bal_c) * 1.0 / COUNT(*) FROM cust WHERE bal_c > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,

    "tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "tpch_q2" ->
      """WITH supply AS (
        |  SELECT l_partkey, l_suppkey,
        |         MIN(CAST(ROUND(l_extendedprice / l_quantity * 100, 0) AS BIGINT))
        |           AS cost_c
        |  FROM lineitem GROUP BY 1, 2),
        |asia AS (
        |  SELECT s_suppkey, s_name, n_name,
        |         CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'),
        |sup AS (SELECT * FROM supply JOIN asia ON l_suppkey = s_suppkey)
        |SELECT acctbal_cents, s_name, n_name, p_partkey, p_name, cost_c
        |FROM sup
        |JOIN (SELECT l_partkey AS mk, MIN(cost_c) AS mc FROM sup GROUP BY 1) m
        |  ON l_partkey = mk AND cost_c = mc
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size BETWEEN 10 AND 30 AND p_type = 'LARGE'
        |ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "tpch_q11" ->
      """WITH vals AS (
        |  SELECT l_partkey,
        |         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
        |              AS BIGINT) AS value_cents
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
        |  GROUP BY 1)
        |SELECT l_partkey, value_cents FROM vals
        |WHERE value_cents * 125 > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM vals)
        |ORDER BY value_cents DESC, l_partkey""".stripMargin,

    "tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
        |                  AS BIGINT)) AS BIGINT) AS total_rev_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_cents = (SELECT MAX(total_rev_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 1000)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "tpch_q19" ->
      """SELECT
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
        |                AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "tpch_q20" ->
      """WITH widget AS (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'),
        |pair AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS avail_qty,
        |         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
        |                        AND l_shipdate < TIMESTAMP '1997-01-01'
        |                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
        |              AS BIGINT) AS qty96
        |  FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM widget)
        |  GROUP BY 1, 2)
        |SELECT s_name, CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
        |FROM supplier
        |WHERE s_suppkey IN (SELECT l_suppkey FROM pair
        |                    WHERE qty96 > 0 AND avail_qty > qty96 * 7)
        |ORDER BY s_name""".stripMargin,

    "tpch_q21" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "sample_reservoir_group" ->
      """SELECT lang, doc_id, n_chars,
        |  round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
        |           / 1152921504606846976.0)
        |        / CAST(GREATEST(n_chars, 1) AS DOUBLE), 12) AS skey,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |         ORDER BY round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
        |                          / 1152921504606846976.0)
        |                       / CAST(GREATEST(n_chars, 1) AS DOUBLE), 12) DESC,
        |                  doc_id) AS INTEGER) AS rk
        |FROM documents
        |QUALIFY rk <= 5 ORDER BY lang, rk""".stripMargin,

    // the plain join — the prefilter must be invisible in the answer
    "join_bloom_prefilter" ->
      """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE CAST(ROUND(p_retailprice * 100) AS BIGINT) % 97 = 0
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "embed_random_project" ->
      """WITH e AS (SELECT vec_id, i - 1 AS i,
        |             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000)
        |                  AS BIGINT) AS vi
        |           FROM embeddings, range(1, 65) t(i)),
        |p AS (SELECT vec_id, j,
        |        CAST(SUM(CASE WHEN (('0x' || substr(md5(CAST(j * 64 + i AS VARCHAR)), 1, 15))::BIGINT % 2) = 0
        |                      THEN vi ELSE -vi END) AS BIGINT) AS p
        |      FROM e, range(0, 16) u(j) GROUP BY vec_id, j)
        |SELECT vec_id, CAST(SUM(ABS(p)) AS BIGINT) AS l1_norm,
        |       CAST(SUM(p) FILTER (j = 0) AS BIGINT) AS p0,
        |       CAST(SUM(p) FILTER (j = 1) AS BIGINT) AS p1,
        |       CAST(SUM(p) FILTER (j = 2) AS BIGINT) AS p2,
        |       CAST(SUM(p) FILTER (j = 3) AS BIGINT) AS p3
        |FROM p GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "entropy_by_source" ->
      s"""WITH tok AS (SELECT source,
         |               unnest(string_split($normSql, ' ')) AS term
         |             FROM documents),
         |tc AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
         |       FROM tok WHERE term <> '' GROUP BY source, term),
         |agg AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         |          CAST(COUNT(*) AS BIGINT) AS vocab,
         |          CAST(SUM(CAST(ROUND(ROUND(cnt * ln(cnt), 6) * 1000000, 0)
         |                    AS BIGINT)) AS BIGINT) AS s_micro
         |        FROM tc GROUP BY source)
         |SELECT source, n_tokens, vocab,
         |       round(ln(n_tokens)
         |             - (CAST(s_micro AS DOUBLE) / 1000000.0) / n_tokens, 6)
         |         AS entropy_nats
         |FROM agg ORDER BY source""".stripMargin
  )

  /** The adapted TPC-H board — every `tpch_q*` key here plus Q3, which
    * lives in AnalyticsQueries (22 queries total). */
  val tpchBoard: Seq[String] =
    (queries.keys.filter(_.startsWith("tpch_q")).toSeq :+ "tpch_q3_top10").sorted

  private def boardQuery(k: String): QueryFn =
    queries.getOrElse(k, AnalyticsQueries.queries(k))
  private def boardOracle(k: String): String =
    oracleSql.getOrElse(k, AnalyticsQueries.oracleSql(k))

  /** `tpch_all`: the WHOLE board executed in ONE session, reduced to
    * per-query row counts. A per-key run can never catch
    * rule-ordering/codegen-cache interactions between queries; this key
    * plans and runs all 22 in one shared session (PlanSpec's tpch_all gate
    * then re-asserts every plan invariant in that same polluted session).
    * The oracle composes the 22 per-key DuckDB oracles the same way.
    *
    * The 22 counts are independent jobs, so they are submitted from a
    * small thread pool (optimization guide §2.6 "overlap independent
    * jobs"): while one query drains its straggler tail the next query's
    * tasks back-fill the freed cores. FIFO scheduling keeps earlier
    * queries prioritized; each count is deterministic, so the result row
    * set is identical to the sequential formulation. */
  val tpchAll: Map[String, QueryFn] = Map(
    "tpch_all" -> ((s, d) => {
      import s.implicits._
      import scala.concurrent.{Await, ExecutionContext, Future}
      // pool width scales with the session's cores (capped: driver-side
      // submission concurrency stops paying past ~12 in-flight jobs —
      // measured 8→12 = 3.7→3.0 s at local[32], 16 = no further gain);
      // at low core counts FIFO back-fill needs fewer jobs in flight
      val width = math.max(4, math.min(12, s.sparkContext.defaultParallelism))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(width)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val rows =
        try Await.result(
          Future.sequence(tpchBoard.map { k =>
            Future {
              // job descriptions are thread-local — label each board member
              s.sparkContext.setJobDescription(s"tpch_all: $k")
              (k, boardQuery(k)(s, d).count())
            }
          }), scala.concurrent.duration.Duration.Inf)
        finally pool.shutdown()
      rows.toDF("q", "n").orderBy("q")
    }))

  val tpchAllOracle: Map[String, String] = Map(
    "tpch_all" -> tpchBoard.map(k =>
      s"SELECT '$k' AS q, CAST((SELECT COUNT(*) FROM (\n${boardOracle(k)}\n) AS t) AS BIGINT) AS n")
      .mkString("", "\nUNION ALL\n", "\nORDER BY q"))
}
