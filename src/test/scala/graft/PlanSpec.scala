package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan quality gates (the 100 TB checklist): column pruning
  * reaches the scan, small dims broadcast, top-k avoids global sorts,
  * aggregates are partial (map-side combine), hot paths stay inside
  * whole-stage codegen. These assertions pin the plans we want — a
  * regression to a shuffle-heavy plan fails the build, not just the bench.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("scan_project prunes columns at the parquet scan (ReadSchema)") {
    val p = plan("scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && !read.contains("l_shipdate"),
      s"projection not pruned: $read")
  }

  test("filter_modulo scans vectorized (Batched) with a data filter") {
    val p = plan("filter_modulo")
    assert(p.contains("Batched: true"), p)
    assert(p.contains("Filter"), p)
  }

  test("join_broadcast_dim uses BroadcastHashJoin, never SortMergeJoin") {
    val p = plan("join_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("join_agg_segment broadcasts the dimension side") {
    val p = plan("join_agg_segment")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("sort_limit_topk plans TakeOrderedAndProject (no global sort shuffle)") {
    val p = plan("sort_limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1_agg aggregates partially before the shuffle, filter pushed to parquet") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,0.0)]"), p)
  }

  test("sim_topk_cosine plans TakeOrderedAndProject (per-partition top-k)") {
    val p = plan("sim_topk_cosine")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("pos_delete_merge anti-join avoids cartesian/nested-loop") {
    val p = plan("pos_delete_merge")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("partition_prune hits PartitionFilters — non-matching dirs never open") {
    val p = plan("partition_prune")
    assert(p.contains("PartitionFilters: [isnotnull(l_returnflag"), p)
    // the partition column filter must NOT degrade to a data filter
    val scanLine = p.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(!scanLine.contains("PushedFilters: [IsNotNull(l_returnflag"), scanLine)
  }

  test("mor_count_golden plan: hash/broadcast anti-joins only, no nested loop") {
    val p = plan("mor_count_golden")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("dedup_minhash plan: single signature pipeline (no duplicated scan sides)") {
    val df = SparkEntry.queries("dedup_minhash")(spark, dir)
    val scans = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("FileScan"))
    // corpus = documents ∪ perturbed documents = 2 scans; the old self-join
    // formulation had 4
    assert(scans == 2, s"expected 2 scans, got $scans")
  }

  test("eq-delete read: many delete commits -> ONE multi-path scan per key set") {
    import graft.gen.Bundles
    import graft.scenarios.Scenarios
    import graft.table.GraftTableGenerator
    val wh = java.nio.file.Files.createTempDirectory("graft-eqplan").toString
    val g = new GraftTableGenerator(spark, wh, "many_eq")
      .create(Scenarios.OrdersSchema, Seq("order_year"))
      .append(Seq(2019, 2020), Bundles.orders(), 2, 100).commit()
    // 20 separate eq-delete commits on the same key set (S9-shaped history)
    (0 until 20).foreach { i =>
      g.equalityDelete(org.apache.spark.sql.functions.col("order_id") === i,
        Seq("order_id")).commit()
    }
    val df = g.read
    val p = df.queryExecution.executedPlan.toString
    val eqScans = p.linesIterator.count(l => l.contains("FileScan") && l.contains("eqdelete"))
    assert(eqScans == 1, s"expected 1 eqdelete FileScan, got $eqScans:\n$p")
    // and the semantics still hold: ids 0..19 are gone
    assert(df.count() == 380 &&
      df.where(org.apache.spark.sql.functions.col("order_id") < 20).count() == 0)
  }

  test("join_range_bucketed: hash join on (key, bucket), never a nested loop") {
    val p = plan("join_range_bucketed")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join") || p.contains("HashJoin"), p)
  }

  test("sample_stratified: row-local predicate — no join, no pre-agg exchange") {
    val p = plan("sample_stratified")
    assert(!p.contains("Join"), p) // selection never shuffles the corpus
    // below the partial aggregate (dataflow before it) sits only filter+scan
    val belowAgg = p.linesIterator.dropWhile(!_.contains("partial_count")).drop(1)
    assert(belowAgg.count(_.contains("Exchange")) == 0,
      s"selection shuffled before aggregation:\n$p")
  }

  test("pack_token_budget: data-scale cumsum window is PARTITIONED by bucket") {
    val p = plan("pack_token_budget")
    // the big-side window must carry the bucket partition key; the only
    // partition-less window allowed is the bucket-summary (broadcast side)
    assert(p.contains("windowspecdefinition(_rt_bkt"), p)
    assert(p.contains("BroadcastHashJoin"), p) // offsets attach via broadcast
  }

  test("freq_terms: map-side partial aggregation + TakeOrderedAndProject top-k") {
    val p = plan("freq_terms")
    assert(p.contains("partial_count"), p) // vocabulary combines before the shuffle
    assert(p.contains("TakeOrderedAndProject"), p) // no global sort for the top-k
  }

  test("metrics_file_prune: range predicate opens ONLY the files whose stats match") {
    val df = SparkEntry.queries("metrics_file_prune")(spark, dir)
    // 10 data files exist with order_id ranges [0,100) .. [900,1000);
    // [250,449] intersects exactly files 2,3,4 — the rest must never be
    // part of the scan's file set (pruned from the log's metrics, no open)
    val dataFiles = df.inputFiles.filter(p => !p.contains("eqdelete"))
    assert(dataFiles.length == 3,
      s"expected 3 of 10 data files after metrics pruning, got:\n${dataFiles.mkString("\n")}")
    // correctness intact: the eq-delete wave still applies to survivors
    val r = df.head()
    assert(r.getLong(0) == 180, r.toString) // 200 ids minus 20 ending in 7
  }

  test("dedup_exact shuffles only (hash, id) — no text column past the scan") {
    val p = plan("dedup_exact")
    val exchange = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchange.contains("text"), s"text column reaches the shuffle:\n$exchange")
  }

  test("dedup_passage shuffles hashes and packed keys — never chunk text") {
    val p = plan("dedup_passage")
    val exchange = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchange.contains("_chunk") && !exchange.contains("text"),
      s"chunk/text column reaches a shuffle:\n$exchange")
  }

  test("window_topk_group pre-ranks per input partition before the per-group window") {
    val p = plan("window_topk_group")
    // the fine-grained window must partition on (_group, _pid) — that is
    // the stage that keeps a 3-group 100 TB table off 3 single tasks
    assert(p.contains("_pid"), p)
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows >= 2, s"expected local+global Window nodes:\n$p")
  }

  test("metadata tables plan with zero data-file scans (log-only)") {
    // a FileScan in the plan would mean the metadata table opened data
    // files; it must materialize purely from the snapshot log
    val p = plan("meta_files") + plan("meta_snapshots") + plan("meta_partitions")
    assert(!p.contains("FileScan parquet"), p)
  }

  test("dedup_semantic: broadcast centroid assignment, equi-join verify, no nested loop") {
    val p = plan("dedup_semantic")
    // centroid frame must broadcast (nCells rows — never a shuffle side)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // the within-cell verify join must be a hash equi-join on the cell key
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin") || p.contains("_cell"), p)
    // assignment argmax is a partial-aggregated groupBy (map-side combine
    // collapses the 64×n expanded frame BEFORE the exchange), not a window
    // — struct-max plans as SortAggregate, so accept either operator
    assert(p.contains("partial_max"), s"no partial aggregate before shuffle:\n$p")
    val aggs = p.linesIterator.count(l =>
      l.contains("HashAggregate") || l.contains("SortAggregate"))
    assert(aggs >= 2, s"expected partial+final aggregate:\n$p")
  }

  test("fuzzy_join_edit: blocked equi-join — never cartesian or nested loop") {
    val p = plan("fuzzy_join_edit")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the join key must be the blocking column, so the quadratic distance
    // only runs inside blocks
    assert(p.contains("_blk"), s"no blocking key in join:\n$p")
  }

  test("embed_gram: per-partition fold — no self-join, tiny broadcast (i,j) map") {
    val p = plan("embed_gram")
    // the corpus must fold inside tasks (one tri-array per task), never
    // self-join on the row id (n·d joined rows) or explode per-row pairs
    assert(p.contains("MapPartitions"), s"no per-partition fold:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the pos→(i,j) decode joins a d²/2-row literal map — broadcast only
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("agg_skew_distinct: pair-level shuffle spreads hot keys before the count") {
    val p = plan("agg_skew_distinct")
    // stage 1 dedups on (key, value): its exchange must hash-partition on
    // BOTH columns — that is what spreads a hot key across the cluster
    val pairEx = p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("l_returnflag") &&
        l.contains("l_partkey"))
    assert(pairEx, s"no (key, value) exchange:\n$p")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 3, s"expected partial+final dedup aggs plus count:\n$p")
  }

  test("tfidf/bm25: corpus-stat joins stay off cartesian; tf/df aggregate partially") {
    val p = plan("tfidf_topk") + plan("bm25_topk")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial"), p)
    // the one-row corpus-stats frame joins as an explicit broadcast
    assert(p.contains("BroadcastExchange"), p)
  }

  test("tpch_all: the 22-query board keeps its plan invariants when run " +
      "back-to-back in one session (rule-ordering interactions)") {
    val board = graft.queries.DepthQueries.tpchBoard
    assert(board.size == 22, s"board is ${board.size} queries: $board")
    // run the WHOLE board once in this session (codegen caches, broadcast
    // thresholds, AQE state all shared) ...
    board.foreach(k => SparkEntry.queries(k)(spark, dir)
      .write.format("noop").mode("overwrite").save())
    // ... then every plan, built in that polluted session, still holds
    // the composite invariants the per-key gates pin
    val singleTable = Set("tpch_q1_full", "tpch_q6")
    board.foreach { k =>
      val p = plan(k)
      assert(!p.contains("CartesianProduct"),
        s"$k grew a cartesian product when run with the full board:\n$p")
      if (!singleTable(k))
        assert(p.contains("BroadcastHashJoin"),
          s"$k lost its dimension broadcast when run with the full board:\n$p")
    }
  }

  test("tpch_q3_top10: dim broadcast, date filters pushed to both fact scans") {
    val p = plan("tpch_q3_top10")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // the timestamp cutoffs must reach parquet on BOTH fact tables
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate"), p)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("quality_lr_logit: map-only scorer — no exchange before the sort") {
    val p = plan("quality_lr_logit")
    // one projection over the scan; the only exchange allowed is the final
    // rangepartitioning for the deterministic ORDER BY
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"scoring introduced a non-sort exchange:\n$p")
    // scoring is one Project straight over the scan — no join, no agg
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
  }

  test("cohort_retention: user-key aggregates are partial; no raw-event window") {
    val p = plan("cohort_retention")
    assert(p.contains("partial_min") || p.contains("partial"), p)
    assert(!p.contains("WindowExec") && !p.contains("Window "), p)
  }

  test("brand_affinity: order-key equi self-join — never cartesian") {
    val p = plan("brand_affinity")
    // the one-row broadcast of the corpus-size aggregate is the only
    // permitted nested-loop shape (a cross with a single-row build side)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.linesIterator.exists(l =>
      l.contains("NestedLoop") && !l.contains("Cross")), p)
    assert(p.contains("partial"), p)
  }

  test("time_weighted_avg: the lead window is PARTITIONED by user") {
    val p = plan("time_weighted_avg")
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, p)
    assert(windows.forall(_.contains("user_id")),
      s"global window detected:\n$p")
  }

  test("events_anomaly_zscore: per-type stats join by broadcast") {
    val p = plan("events_anomaly_zscore")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("tpch_q1_full: shipdate pushed to parquet; one partial-agg pass; pruned scan") {
    val p = plan("tpch_q1_full")
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("partial_sum"), p)
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_partkey") && !read.contains("l_comment"),
      s"scan not pruned: $read")
  }

  test("tpch_q5: every dimension edge broadcast; date slice pushed to orders") {
    val p = plan("tpch_q5")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
    assert(p.contains("EqualTo(r_name,ASIA)"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"dimension edge shuffled:\n$p")
  }

  test("tpch_q7: nation/supplier dims broadcast; shipdate slice pushed to lineitem") {
    val p = plan("tpch_q7")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"supplier + both nation edges must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch_q18: grouped-HAVING side broadcasts back onto orders; partial agg") {
    val p = plan("tpch_q18")
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("o_orderkey")),
      s"the qualifying-order set must broadcast, not shuffle orders:\n$p")
    assert(p.contains("partial_sum"), s"quantity aggregate must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch_q6: every predicate pushed to the scan; no join, no wide shuffle") {
    val p = plan("tpch_q6")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"),
      s"all three predicates must reach the parquet scan: $pushed")
    assert(!p.contains("Join"), s"Q6 has no join:\n$p")
    assert(p.contains("partial_sum"), s"map-side combine expected:\n$p")
  }

  test("tpch_q4: EXISTS plans as a broadcast/shuffled hash LEFT SEMI, no dup-count") {
    val p = plan("tpch_q4")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch_q8: dims broadcast; orderdate slice pushed; no cartesian") {
    val p = plan("tpch_q8")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"part/supplier/nation edges must broadcast:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch_q13: left outer + two-level aggregate, both with partial combine") {
    val p = plan("tpch_q13")
    assert(p.contains("LeftOuter"), p)
    assert(p.contains("partial_count"), s"both aggregates map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch_q17: decorrelated per-part average joins hash-side, brand filter broadcast") {
    val p = plan("tpch_q17")
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("p_partkey")),
      s"the filtered part dim must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch_q22: global average folds in as a one-row broadcast; anti join to orders") {
    val p = plan("tpch_q22")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the scalar average must broadcast, never shuffle customers against it:\n$p")
  }

  test("tpch_q2: supply aggregates partially; dims broadcast; min-cost join off cartesian") {
    val p = plan("tpch_q2")
    assert(p.contains("partial_min"), s"per-pair min must map-side combine:\n$p")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"region-filtered supplier and part dims must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), s"LIMIT must plan as top-k:\n$p")
  }

  test("tpch_q11: the global threshold is a one-row broadcast, never a fact shuffle") {
    val p = plan("tpch_q11")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the total must broadcast onto the per-part values:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("tpch_q15: one fact aggregation, argmax folds back by broadcast equality") {
    val p = plan("tpch_q15")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"the quarter slice must reach the scan:\n$p")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch_q16: complaint suppliers anti-join broadcast; distinct count partials") {
    val p = plan("tpch_q16")
    assert(p.linesIterator.exists(l =>
      l.contains("LeftAnti") && l.contains("Broadcast")),
      s"the exclusion dim must broadcast as an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial"), p)
  }

  test("tpch_q19: OR-of-conjuncts — quantity envelope pushed; part dim broadcast") {
    val p = plan("tpch_q19")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_quantity"),
      s"the quantity envelope must reach the lineitem scan: $pushed")
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("p_partkey")),
      s"the disjunction-pruned part dim must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch_q20: both nested IN sets plan as semi joins, no supplier duplication") {
    val p = plan("tpch_q20")
    assert(p.linesIterator.count(_.contains("LeftSemi")) >= 2,
      s"widget-part and qualifying-supplier sets must both semi-join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("tpch_q21: EXISTS semi + NOT-EXISTS anti on the order key; no self cartesian") {
    val p = plan("tpch_q21")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), s"LIMIT must plan as top-k:\n$p")
  }

  test("graph_triangles: wedge + closing-edge probes are hash joins, never nested loop") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("partial"), p)
  }

  test("dq_expectations: FK orphan checks plan as hash anti-joins") {
    val p = plan("dq_expectations")
    // the orphan probes themselves must be hash anti-joins; the report
    // assembly's 1-row × 1-row crosses are the only nested loops allowed
    assert(p.linesIterator.exists(l =>
      l.contains("LeftAnti") && l.contains("HashJoin")), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.linesIterator.exists(l =>
      l.contains("NestedLoop") && l.contains("LeftAnti")), p)
  }

  test("pareto_frontier: data-scale windows are PARTITIONED by price bucket") {
    val p = plan("pareto_frontier")
    val windows = p.linesIterator.filter(_.contains("Window ")).toSeq
    // the in-bucket prefix max is bucket-partitioned; the only permitted
    // unpartitioned window is the BUCKET-level prefix (|buckets| rows)
    val unpartitioned = windows.filterNot(_.contains("bk"))
    assert(unpartitioned.isEmpty,
      s"data-scale global window detected:\n${windows.mkString("\n")}")
  }

  test("gap_fill_locf: closed-form fill — no windows, no joins, " +
      "aggregates only (r12 rewrite)") {
    val p = plan("gap_fill_locf")
    // the r12 closed-form formulation computes LOCF spine sums from each
    // user's sorted observation array: the spine join, the LOCF window
    // and the last-in-hour row_number window must all stay gone — any
    // Window or Join reappearing is a regression to the shuffle-heavy
    // shape (plans/r12/gap_fill_locf_{before,after}.txt)
    assert(!p.linesIterator.exists(_.contains("Window ")),
      s"window reintroduced into the closed-form gap fill:\n$p")
    assert(!p.contains("Join"), s"join reintroduced:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("sample_reservoir_group pre-ranks per input partition before the per-group window") {
    val p = plan("sample_reservoir_group")
    assert(p.contains("_pid"), p) // two-level topKPerGroup decomposition
  }
}
