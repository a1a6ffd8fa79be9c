package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._
import graft.ext.TextOps

/** Round-6 analytics wave: the product-analytics / warehouse-reporting
  * shapes a consumer of these tables runs daily — cohort retention, the
  * classic 3-table revenue join, column profiling, histograms, per-entity
  * lag deltas — plus a linear-model document scorer (the shape of every
  * fasttext-style quality filter applied at corpus scale).
  *
  * Determinism rules follow Q: money through [[Q.cents]], doubles only in
  * closed-form arithmetic both engines evaluate identically (products and
  * left-associated sums of exactly-representable operands), every output
  * totally ordered.
  */
object AnalyticsQueries {

  private def docs(s: SparkSession, d: String) = tbl(s, d, "documents")

  /** One column's profile row: null count, exact distinct count, min/max
    * rendered through a caller-chosen canonical repr. A single-column
    * pruned scan with a two-stage distinct aggregate — no Expand, no
    * full-width read; at 100 TB each column profiles as its own narrow
    * partial-aggregated pass. */
  private def profileCol(df: DataFrame, c: String,
                         repr: Column => Column): DataFrame =
    df.select(col(c)).agg(
      lit(c).as("col_name"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct(col(c)).as("n_distinct"),
      repr(min(col(c))).as("min_repr"),
      repr(max(col(c))).as("max_repr"))
      .select("col_name", "n_null", "n_distinct", "min_repr", "max_repr")

  val queries: Map[String, QueryFn] = Map(

    // cohort retention: users bucketed by first-seen day, distinct active
    // users per (cohort, day offset). Shapes: one groupBy(user) for the
    // cohort anchor, one (user, day) distinct — both partial-aggregated
    // shuffles on the user key — then a user-key hash join and a tiny
    // final aggregate. No per-user window over raw events.
    "cohort_retention" -> ((s, d) => {
      val ev = Q.events(s, d)
        .select(col("user_id"), expr("_us div 86400000000").as("day"))
      val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      val active = ev.distinct()
      active.join(first, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "offset_days")
    }),

    // the TPC-H Q3 shape: segment-filtered customers (broadcast — the dim
    // is orders-of-magnitude smaller than the facts) into orders, then a
    // key-shuffle join to lineitem, revenue per order, top 10. The filter
    // on both fact scans reaches parquet (PushedFilters), and the
    // broadcast keeps the orders-side join shuffle-free.
    "tpch_q3_top10" -> ((s, d) => {
      val cutoff = to_timestamp(lit("1997-06-01"))
      val cust = tbl(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = tbl(s, d, "orders")
        .where(col("o_orderdate").cast("timestamp") < cutoff)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
      val li = tbl(s, d, "lineitem")
        .where(col("l_shipdate").cast("timestamp") > cutoff)
        .select(col("l_orderkey"),
          cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("rev_cents"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_date")
        .agg(sum("rev_cents").as("revenue_cents"))
        .orderBy(desc("revenue_cents"), col("l_orderkey"))
        .limit(10)
    }),

    // per-column data profile over orders: nulls, exact distincts, min/max
    // under a canonical repr (doubles render as cents so no engine's
    // double→string formatter is in the compare). Four single-column
    // pruned scans unioned — each a narrow two-stage aggregate.
    "profile_columns" -> ((s, d) => {
      val o = tbl(s, d, "orders")
      val asStr = (c: Column) => c.cast("string")
      val asCents = (c: Column) => cents(c).cast("string")
      profileCol(o, "o_orderstatus", asStr)
        .unionByName(profileCol(o, "o_orderpriority", asStr))
        .unionByName(profileCol(o, "o_custkey", asStr))
        .unionByName(profileCol(o, "o_totalprice", asCents))
        .orderBy("col_name")
    }),

    // fixed-width histogram of order value: bucket = clamp(floor(x/w)) —
    // a map-only projection plus one partial-aggregated groupBy on a
    // 20-value key. The no-shuffle-but-one shape histogramming always has.
    "hist_price_bucket" -> ((s, d) => {
      tbl(s, d, "orders")
        .select(least(floor(col("o_totalprice") / 25000).cast("long"), lit(19L))
            .as("bucket"),
          cents(col("o_totalprice")).as("pc"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), sum("pc").as("price_cents"))
        .orderBy("bucket")
    }),

    // per-entity consecutive-event deltas: lag over (user, time) with an
    // event_id tie-break (ts collisions exist in the data — the tie-break
    // is what makes the lag deterministic), aggregated straight back down
    // to one row per user. Parallelism = #users; each frame is a single
    // sequential pass.
    "window_lag_delta" -> ((s, d) => {
      val ev = Q.events(s, d).select(col("user_id"), col("event_id"),
        col("_us"), cents(col("value")).as("vc"))
      val w = Window.partitionBy("user_id").orderBy("_us", "event_id")
      ev.select(col("user_id"),
          (col("vc") - lag("vc", 1).over(w)).as("delta"))
        .groupBy("user_id")
        .agg(count(col("delta")).as("n_deltas"),
          sum(abs(col("delta"))).as("abs_delta_cents"))
        .orderBy("user_id")
    }),

    // linear quality model over closed-form text features — the
    // fasttext-style corpus filter as a map-only scorer: no shuffle, no
    // UDF, whole-stage-codegen end to end. The logit (not the sigmoid) is
    // the output: it is pure IEEE add/multiply of exactly-representable
    // operands, so both engines agree bit-for-bit before the final round;
    // sigmoid is monotone so thresholding the logit IS thresholding the
    // probability.
    "quality_lr_logit" -> ((s, d) => {
      docs(s, d)
        .select(col("doc_id"), lrLogit.as("logit"), (lrLogit > 0).as("keep"))
        .orderBy("doc_id")
    }),

    // quantile-binned quality sampling — the curriculum / quality-weighted
    // subsampling pass of a curation pipeline, in its scale-true two-pass
    // form: pass 1 reduces the corpus to nine decile cut points (one tiny
    // row), pass 2 re-scans once, assigns each doc its bin by counting
    // cuts below its score (broadcast cuts, a higher-order filter — no
    // window, no global sort), and keeps a deterministic hash-share of
    // each bin that grows with quality (bin b keeps 10·b %).
    "quality_binned_sample" -> ((s, d) => {
      val scored = docs(s, d).select(col("doc_id"), lrLogit.as("logit"))
      val cuts = scored
        .agg(expr("percentile(logit, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
          .as("cs"))
        .select(expr("transform(cs, c -> round(c, 6))").as("cuts"))
      scored.crossJoin(broadcast(cuts))
        .select(col("doc_id"), col("logit"),
          (expr("size(filter(cuts, c -> logit > c))") + 1).cast("long").as("bin"))
        .withColumn("keep",
          (pmod(TextOps.hash60(col("doc_id").cast("string")), lit(100L))
            < col("bin") * 10L).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_kept"),
          min("logit").as("min_logit"), max("logit").as("max_logit"))
        .orderBy("bin")
    })
  )

  /** Iterative-graph and sliding-window keys, appended to the map above. */
  val queries2: Map[String, QueryFn] = Map(

    // fixed-point PageRank over the customer–supplier interaction graph —
    // the deterministic formulation of distributed iterative rank: ranks
    // live in integer micro-units and each edge's contribution is a
    // single integer floor-division (0.85 = 17/20), so every per-node sum
    // is exact integer arithmetic — identical under ANY aggregation
    // order, which is what makes an iterative distributed algorithm
    // oracle-checkable at all. Three unrolled iterations; each is one
    // edge⋈rank join + one partial-aggregated shuffle on the destination
    // key. Edges and degrees are computed once and reused.
    "pagerank_fixedpoint" -> ((s, d) => {
      val pairs = tbl(s, d, "orders").select("o_orderkey", "o_custkey")
        .join(tbl(s, d, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      // the iterative-graph lineage discipline (same as the dedup
      // clustering loop): materialize the static edge set once so the
      // expensive derivation join doesn't re-execute under every
      // iteration's subtree. Both orientations come from ONE explode over
      // the pair set — the union-of-two-subtrees formulation computed the
      // join+distinct twice inside this checkpoint job (guide §1.2)
      val edges = pairs.select(explode(array(
          struct(col("a"), col("b")),
          struct(col("b").as("a"), col("a").as("b")))).as("_e"))
        .select(col("_e.a").as("a"), col("_e.b").as("b"))
        .localCheckpoint()
      // degrees are node-scale and STATIC — materialize once instead of
      // re-aggregating the edge set inside every round's broadcast build
      val deg = edges.groupBy("a").agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      // rank and degree tables are node-scale (dim-scale for a bipartite
      // star-schema graph) — broadcast them so the edge set is never
      // shuffled; only the per-destination share aggregate exchanges.
      // For a graph whose node set outgrows broadcast, drop the hints and
      // the same plan degrades to co-partitioned hash joins.
      // The rank table CARRIES deg, so each round probes the edge set
      // through ONE broadcast join instead of two; deg re-attaches after
      // the aggregate at NODE scale (the removed join probed at edge
      // scale — guide §2.3/§2.4). The final round skips the re-attach and
      // the checkpoint: its output feeds exactly one consumer (the top-k
      // action), so materializing it would be a pure extra pass.
      var r = deg.select(col("a").as("node"), lit(1000000L).as("rk"),
        col("deg"))
      for (i <- 1 to 3) {
        // node-scale checkpoint per round: without it, iteration k's
        // broadcast subtree replays iterations 1..k-1 (1+2+3 passes over
        // the edge set instead of 3)
        val nxt = edges
          .join(broadcast(r), edges("a") === r("node"))
          .select(col("b").as("node"),
            expr("rk * 17 div (20 * deg)").as("share"))
          .groupBy("node")
          .agg((lit(150000L) + sum("share")).as("rk"))
        r = if (i < 3)
          nxt.join(broadcast(deg.select(col("a").as("node"), col("deg"))),
            Seq("node")).localCheckpoint()
        else nxt
      }
      r.orderBy(desc("rk"), col("node")).limit(20)
        .select(col("node"), col("rk").as("rank_fp"))
    }),

    // embedding drift monitor — the data-quality gate before an embedding
    // batch joins the corpus: per-label centroid vs the global centroid,
    // as a cosine. Determinism is engineered end-to-end in integers:
    // elements scale to exact 1e6-fixed-point longs (order-free integer
    // sums), per-dim means round back to longs from identical inputs, and
    // the final dot/norms are overflow-safe integer sums — the only
    // float steps are one division and one sqrt over identical operands.
    "embed_drift" -> ((s, d) => {
      val e = tbl(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .toDF("label", "dim", "v")
        .select(col("label"), col("dim"),
          round(col("v").cast("double") * 1000000, 0).cast("long").as("vi"))
      // ONE partial-aggregated pass over the exploded elements feeds both
      // centroids: the global per-dim mean re-aggregates the (label, dim)
      // sums/counts exactly (Σ over labels of per-label sums) through a
      // window over the TINY aggregate (|labels|·64 rows) — the naive
      // formulation's second full explode + exchange and the dim join are
      // both gone (guide §1.2); integer sums, bit-identical results
      val wd = Window.partitionBy("dim")
      val dots = e.groupBy("label", "dim")
        .agg(sum("vi").as("_s"), count(lit(1)).as("_n"))
        .select(col("label"),
          round(col("_s").cast("double") / col("_n"), 0).cast("long").as("ml"),
          round(sum("_s").over(wd).cast("double") / sum("_n").over(wd), 0)
            .cast("long").as("mg"))
        .groupBy("label")
        .agg(sum(col("ml") * col("mg")).as("dot"),
          sum(col("ml") * col("ml")).as("n1"),
          sum(col("mg") * col("mg")).as("n2"))
      val nvecs = tbl(s, d, "embeddings")
        .groupBy("label").agg(count(lit(1)).as("n_vecs"))
      dots.join(nvecs, "label")
        .select(col("label"), col("n_vecs"),
          round(col("dot") /
            sqrt(col("n1").cast("double") * col("n2").cast("double")), 6)
            .as("drift_cos"))
        .orderBy("label")
    }),

    // ingest schema-drift profile: which keys actually arrive in the
    // semi-structured props payload, per event type — one explode of the
    // parsed key list + a partial-aggregated count. New/vanished keys
    // between batches are the drift signal.
    "json_keys_profile" -> ((s, d) => {
      tbl(s, d, "events")
        .select(col("event_type"),
          explode(expr("json_object_keys(props)")).as("k"))
        .groupBy("event_type", "k").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type", "k")
    }),

    // hourly-volume anomaly detection: per event type, hours whose count
    // z-score exceeds 2. The stats are sums of integer counts (exact in
    // doubles far below 2^53), so mean/stddev/z are deterministic
    // cross-engine; one narrow aggregate + a broadcast-joined stats row
    // per type — the monitoring shape that runs after every ingest.
    "events_anomaly_zscore" -> ((s, d) => {
      val hourly = Q.events(s, d)
        .select(col("event_type"), expr("_us div 3600000000").as("h"))
        .groupBy("event_type", "h").agg(count(lit(1)).as("cnt"))
      val stats = hourly.groupBy(col("event_type").as("t"))
        .agg(avg("cnt").as("mu"), stddev_samp(col("cnt")).as("sd"))
      hourly.join(broadcast(stats), col("event_type") === col("t"))
        .select(col("event_type"), col("h"), col("cnt"),
          round((col("cnt") - col("mu")) / col("sd"), 6).as("z"))
        .where(abs(col("z")) > 2.0)
        .orderBy("event_type", "h")
    }),

    // market-basket affinity: brand pairs co-occurring within an order,
    // with lift. The pair explode is bounded by lines-per-order (single
    // digits), so the self-join on the order key never goes quadratic in
    // the table — the classic affinity-analysis shape. Lift rounds at 6
    // from exact integer counts.
    "brand_affinity" -> ((s, d) => {
      // per-order brand SETS in ONE shuffle: the groupBy both dedupes
      // (order, brand) and feeds all three consumers (order count,
      // singles, pairs); pair generation is a per-order double explode —
      // k brands per order (single digits) → k² transient rows inside the
      // task, never a row-level self-join shuffle. Brand-keyed sides are
      // |brands|-sized → broadcast; the corpus size folds in as a
      // broadcast one-row aggregate instead of a driver-side count() job.
      val byOrder = tbl(s, d, "lineitem")
        .join(tbl(s, d, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
        .groupBy("ok").agg(collect_set(col("b")).as("bs"))
        .localCheckpoint()
      val nOrders = byOrder.agg(count(lit(1)).as("n_orders"))
      val single = byOrder.select(explode(col("bs")).as("b"))
        .groupBy("b").agg(count(lit(1)).as("nb"))
      val pairs = byOrder
        .select(explode(col("bs")).as("b"), col("bs"))
        .select(col("b"), explode(col("bs")).as("b2"))
        .where(col("b") < col("b2"))
        .groupBy("b", "b2").agg(count(lit(1)).as("nab"))
      pairs
        .join(broadcast(single), "b")
        .join(broadcast(single.select(col("b").as("b2j"), col("nb").as("nb2"))),
          col("b2") === col("b2j"))
        .where(col("nab") >= 20)
        .crossJoin(broadcast(nOrders))
        .select(col("b"), col("b2"), col("nab"),
          round((col("nab").cast("double") * col("n_orders")) /
            (col("nb").cast("double") * col("nb2")), 6).as("lift"))
        .orderBy("b", "b2")
    }),

    // time-weighted average value per user (TWAP): each reading holds
    // until the next one, so the integral is Σ value·duration over lead
    // gaps. Numerator and denominator are exact integer sums (cents ×
    // micros fits long with 400× headroom); the single division happens
    // on identical operands in both engines. Per-user frames — the
    // parallelism story of every per-entity window here.
    "time_weighted_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("_us", "event_id")
      val seg = Q.events(s, d)
        .select(col("user_id"), col("event_id"), col("_us"),
          cents(col("value")).as("vc"))
        .select(col("user_id"), col("vc"),
          (lead("_us", 1).over(w) - col("_us")).as("dur"))
        .where(col("dur").isNotNull)
      seg.groupBy("user_id")
        .agg(count(lit(1)).as("n_segments"),
          sum(col("vc") * col("dur")).as("num"), sum("dur").as("den"))
        .select(col("user_id"), col("n_segments"),
          round(col("num").cast("double") / col("den").cast("double"), 6)
            .as("twap_cents"))
        .orderBy("user_id")
    }),

    // the distribution-window family (quartile, percent_rank, cume_dist)
    // per segment — deterministic because the order is total (balance
    // cents desc, key asc) and the statistics are exact rationals of
    // integer ranks; folded to one row per (segment, quartile)
    "window_ntile_family" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), col("c_custkey"))
      tbl(s, d, "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).as("q"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .groupBy("c_mktsegment", "q")
        .agg(count(lit(1)).as("n"), sum("c_custkey").as("key_sum"),
          min("pr").as("pr_min"), max("cd").as("cd_max"))
        .orderBy("c_mktsegment", "q")
    }),

    // trailing-7-day active users per day: each (user, active-day) pair
    // casts its vote into the next seven window days (a bounded explode),
    // then one distinct + one count — the standard scale formulation of
    // sliding-window COUNT DISTINCT (never a per-day set union, never a
    // window over raw events).
    "rolling_7d_active" -> ((s, d) => {
      val ud = Q.events(s, d)
        .select(col("user_id"), expr("_us div 86400000000").as("day"))
        .distinct()
      ud.select(col("user_id"),
          explode(expr("sequence(day, day + 6)")).as("wday"))
        .distinct()
        .groupBy("wday").agg(count(lit(1)).as("active_7d"))
        .orderBy("wday")
    })
  )

  /** Closed-form linear quality score (rounded logit) shared by the two
    * quality keys — see `quality_lr_logit` for the determinism argument. */
  private def lrLogit: Column = {
    val t = col("text")
    val L = length(t).cast("double")
    val T = size(TextOps.tokens(t)).cast("double")
    val P = length(regexp_replace(t, "[A-Za-z0-9\\s]+", "")).cast("double")
    round(lit(-1.5) + lit(0.002) * L + lit(0.01) * T - lit(0.05) * P, 6)
  }

  private val normSql =
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"

  val oracleSql: Map[String, String] = Map(

    "cohort_retention" ->
      """WITH ev AS (SELECT user_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |            FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, day FROM ev)
        |SELECT cohort_day, day - cohort_day AS offset_days,
        |       CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY cohort_day, offset_days
        |ORDER BY cohort_day, offset_days""".stripMargin,

    "tpch_q3_top10" ->
      """SELECT l.l_orderkey,
        |       strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
        |       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100)
        |                AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l.l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l.l_orderkey, o_date
        |ORDER BY revenue_cents DESC, l.l_orderkey
        |LIMIT 10""".stripMargin,

    "profile_columns" ->
      """SELECT * FROM (
        |  SELECT 'o_orderstatus' AS col_name,
        |         CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |         CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
        |         MIN(o_orderstatus) AS min_repr, MAX(o_orderstatus) AS max_repr
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority',
        |         CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
        |         MIN(o_orderpriority), MAX(o_orderpriority)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey',
        |         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
        |         CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice',
        |         CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
        |         CAST(CAST(ROUND(MIN(o_totalprice) * 100) AS BIGINT) AS VARCHAR),
        |         CAST(CAST(ROUND(MAX(o_totalprice) * 100) AS BIGINT) AS VARCHAR)
        |  FROM orders)
        |ORDER BY col_name""".stripMargin,

    "hist_price_bucket" ->
      """SELECT LEAST(CAST(FLOOR(o_totalprice / 25000) AS BIGINT), 19) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "window_lag_delta" ->
      """WITH ev AS (SELECT user_id, event_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |              CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events),
        |dl AS (SELECT user_id,
        |         vc - LAG(vc, 1) OVER (PARTITION BY user_id
        |                               ORDER BY us, event_id) AS delta
        |       FROM ev)
        |SELECT user_id, CAST(COUNT(delta) AS BIGINT) AS n_deltas,
        |       CAST(SUM(ABS(delta)) AS BIGINT) AS abs_delta_cents
        |FROM dl GROUP BY user_id ORDER BY user_id""".stripMargin,

    "pagerank_fixedpoint" ->
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
        |deg AS (SELECT a, COUNT(*) AS deg FROM edges GROUP BY a),
        |r0 AS (SELECT a AS node, CAST(1000000 AS BIGINT) AS rk FROM deg),
        |c1 AS (SELECT e.b AS node, (r.rk * 17) // (20 * d.deg) AS share
        |       FROM edges e JOIN r0 r ON e.a = r.node JOIN deg d ON e.a = d.a),
        |r1 AS (SELECT node, 150000 + SUM(share) AS rk FROM c1 GROUP BY node),
        |c2 AS (SELECT e.b AS node, (r.rk * 17) // (20 * d.deg) AS share
        |       FROM edges e JOIN r1 r ON e.a = r.node JOIN deg d ON e.a = d.a),
        |r2 AS (SELECT node, 150000 + SUM(share) AS rk FROM c2 GROUP BY node),
        |c3 AS (SELECT e.b AS node, (r.rk * 17) // (20 * d.deg) AS share
        |       FROM edges e JOIN r2 r ON e.a = r.node JOIN deg d ON e.a = d.a),
        |r3 AS (SELECT node, 150000 + SUM(share) AS rk FROM c3 GROUP BY node)
        |SELECT node, CAST(rk AS BIGINT) AS rank_fp
        |FROM r3 ORDER BY rk DESC, node LIMIT 20""".stripMargin,

    "embed_drift" ->
      """WITH e AS (
        |  SELECT label, i AS dim,
        |         CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS vi
        |  FROM embeddings, range(1, 65) t(i)),
        |bl AS (SELECT label, dim,
        |         CAST(ROUND(CAST(SUM(vi) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ml
        |       FROM e GROUP BY label, dim),
        |g AS (SELECT dim,
        |        CAST(ROUND(CAST(SUM(vi) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mg
        |      FROM e GROUP BY dim),
        |d AS (SELECT label, CAST(SUM(ml * mg) AS BIGINT) AS dot,
        |        CAST(SUM(ml * ml) AS BIGINT) AS n1,
        |        CAST(SUM(mg * mg) AS BIGINT) AS n2
        |      FROM bl JOIN g USING (dim) GROUP BY label),
        |nv AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
        |       FROM embeddings GROUP BY label)
        |SELECT label, n_vecs,
        |       round(dot / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
        |         AS drift_cos
        |FROM d JOIN nv USING (label) ORDER BY label""".stripMargin,

    "json_keys_profile" ->
      """SELECT event_type, k, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM (SELECT event_type, unnest(json_keys(props)) AS k FROM events)
        |GROUP BY event_type, k ORDER BY event_type, k""".stripMargin,

    "events_anomaly_zscore" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY event_type, h),
        |st AS (SELECT event_type AS t, AVG(cnt) AS mu, STDDEV_SAMP(cnt) AS sd
        |       FROM hourly GROUP BY event_type)
        |SELECT event_type, h, cnt, round((cnt - mu) / sd, 6) AS z
        |FROM hourly JOIN st ON event_type = t
        |WHERE abs(round((cnt - mu) / sd, 6)) > 2.0
        |ORDER BY event_type, h""".stripMargin,

    "brand_affinity" ->
      """WITH li AS (
        |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM li),
        |s AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nb FROM li GROUP BY b),
        |pr AS (SELECT a.b AS b, c.b AS b2, CAST(COUNT(*) AS BIGINT) AS nab
        |       FROM li a JOIN li c ON a.ok = c.ok AND a.b < c.b
        |       GROUP BY a.b, c.b)
        |SELECT pr.b, pr.b2, nab,
        |       round((CAST(nab AS DOUBLE) * n_orders)
        |             / (CAST(s1.nb AS DOUBLE) * CAST(s2.nb AS DOUBLE)), 6) AS lift
        |FROM pr JOIN s s1 ON pr.b = s1.b JOIN s s2 ON pr.b2 = s2.b
        |CROSS JOIN n
        |WHERE nab >= 20
        |ORDER BY pr.b, pr.b2""".stripMargin,

    "time_weighted_avg" ->
      """WITH ev AS (SELECT user_id, event_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |              CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events),
        |seg AS (SELECT user_id, vc,
        |          LEAD(us, 1) OVER (PARTITION BY user_id
        |                            ORDER BY us, event_id) - us AS dur
        |        FROM ev)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |       round(CAST(SUM(vc * dur) AS DOUBLE)
        |             / CAST(SUM(dur) AS DOUBLE), 6) AS twap_cents
        |FROM seg WHERE dur IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "window_ntile_family" ->
      """WITH r AS (
        |  SELECT c_mktsegment, c_custkey,
        |         NTILE(4) OVER w AS q,
        |         round(PERCENT_RANK() OVER w, 6) AS pr,
        |         round(CUME_DIST() OVER w, 6) AS cd
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment
        |               ORDER BY c_acctbal DESC, c_custkey))
        |SELECT c_mktsegment, CAST(q AS INTEGER) AS q,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
        |       MIN(pr) AS pr_min, MAX(cd) AS cd_max
        |FROM r GROUP BY c_mktsegment, q
        |ORDER BY c_mktsegment, q""".stripMargin,

    "rolling_7d_active" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |w AS (SELECT DISTINCT user_id, day + i AS wday
        |      FROM ud, unnest(range(0, 7)) t(i))
        |SELECT wday, CAST(COUNT(*) AS BIGINT) AS active_7d
        |FROM w GROUP BY wday ORDER BY wday""".stripMargin,

    "quality_binned_sample" ->
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    round(-1.5 + 0.002 * CAST(length(text) AS DOUBLE)
         |          + 0.01 * CAST(len(string_split($normSql, ' ')) AS DOUBLE)
         |          - 0.05 * CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]+', '', 'g')) AS DOUBLE),
         |          6) AS logit
         |  FROM documents),
         |cuts AS (
         |  SELECT list_transform(
         |    quantile_cont(logit, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
         |    c -> round(c, 6)) AS cuts
         |  FROM scored),
         |binned AS (
         |  SELECT doc_id, logit,
         |         len(list_filter(cuts, c -> logit > c)) + 1 AS bin
         |  FROM scored CROSS JOIN cuts),
         |k AS (
         |  SELECT bin, logit,
         |         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |                   % 100 < bin * 10 THEN 1 ELSE 0 END AS keep
         |  FROM binned)
         |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(keep) AS BIGINT) AS n_kept,
         |       MIN(logit) AS min_logit, MAX(logit) AS max_logit
         |FROM k GROUP BY bin ORDER BY bin""".stripMargin,

    "quality_lr_logit" ->
      s"""SELECT doc_id,
         |  round(-1.5 + 0.002 * CAST(length(text) AS DOUBLE)
         |        + 0.01 * CAST(len(string_split($normSql, ' ')) AS DOUBLE)
         |        - 0.05 * CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]+', '', 'g')) AS DOUBLE),
         |        6) AS logit,
         |  round(-1.5 + 0.002 * CAST(length(text) AS DOUBLE)
         |        + 0.01 * CAST(len(string_split($normSql, ' ')) AS DOUBLE)
         |        - 0.05 * CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]+', '', 'g')) AS DOUBLE),
         |        6) > 0 AS keep
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
