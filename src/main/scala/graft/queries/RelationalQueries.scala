package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** Core relational query inventory (SURVEY.md §2.8) over /root/testdata.
  *
  * Each key mirrors a capability the reference's tables demand of a reader:
  * scan/projection, the §2.5 predicate shapes (reference `Main.java:160-205`),
  * partition-membership pruning, per-file position assignment, and the
  * merge-on-read delete anti-joins (reference `IcebergTableGenerator.java:
  * 177-365`). All are DuckDB-oracle checkable.
  */
object RelationalQueries {

  val queries: Map[String, QueryFn] = Map(
    // ---- scan + projection (ref IcebergTableGenerator.java:249-257) ----
    "scan_project" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- §2.5 predicate shapes (ref Main.java:160,165,172) ----
    "filter_modulo" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .where(col("l_orderkey") % 10 === 0)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // band predicate (ref Main.java:203-204: % 3000 in [700,1200))
    "filter_range_band" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      li.where(col("l_orderkey") % 3000 >= 700 && col("l_orderkey") % 3000 < 1200)
        .select("l_orderkey", "l_linenumber", "l_suppkey")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // string equality (ref Main.java:384: color.equals("green"))
    "filter_string_eq" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .where(col("l_returnflag") === "R")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("l_quantity"))).as("qty_cents"))
        .orderBy("l_linestatus")
    }),

    // partition-membership (ref Expressions.in, IcebergTableGenerator.java:196)
    "filter_isin" -> ((s, d) => {
      tbl(s, d, "orders")
        .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("o_totalprice"))).as("price_cents"))
        .orderBy("o_orderpriority")
    }),

    // ---- aggregation (validates per-partition counts, SURVEY §2.8) ----
    "agg_partition_counts" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // flagship: scan → filter → agg → sort (TPC-H Q1 shape)
    "q1_agg" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .where(col("l_quantity") > 0)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- joins ----
    // small-dim broadcast join (region is 5 rows — must broadcast, never shuffle)
    "join_broadcast_dim" -> ((s, d) => {
      val nation = tbl(s, d, "nation")
      val region = tbl(s, d, "region")
      nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_nations"))
        .orderBy("r_name")
    }),

    // fact-dim join + agg (shuffle-hash/broadcast on customer side)
    "join_agg_segment" -> ((s, d) => {
      val orders = tbl(s, d, "orders")
      val cust = tbl(s, d, "customer")
      orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("price_cents"))
        .orderBy("c_mktsegment")
    }),

    // ---- sort/limit (TakeOrderedAndProject — no global sort at scale) ----
    "sort_limit_topk" -> ((s, d) => {
      tbl(s, d, "orders")
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
        .orderBy(desc("price_cents"), col("o_orderkey"))
        .limit(100)
    }),

    "distinct_agg" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             count(lit(1)).as("n_rows"))
    }),

    // ---- position assignment (delete addressing, SURVEY §2.8 pos_assign) ----
    // global index WITHOUT a single-partition window: range exchange +
    // per-partition offsets (graft.operators.Ops.withGlobalIndex)
    "pos_assign" -> ((s, d) => {
      graft.operators.Ops.withGlobalIndex(
          tbl(s, d, "lineitem").select("l_orderkey", "l_linenumber"),
          Seq(col("l_orderkey"), col("l_linenumber")), "pos")
        .orderBy("pos")
    }),

    // skew-resistant salted equi-join — row-identical to the plain join
    "join_skew_salted" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      val ords = tbl(s, d, "orders")
      graft.operators.Ops.saltedEquiJoin(li, ords, "l_orderkey", "o_orderkey", 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("l_extendedprice"))).as("rev_cents"))
        .orderBy("o_orderpriority")
    }),

    // ---- MoR positional-delete application (ref :177-286) ----
    // Deletes are addressed by (file_path, row_index) — the real Iceberg v2
    // positional-delete mechanics — synthesized from the %10 predicate so
    // DuckDB can replay the survivor set as a plain filter.
    "pos_delete_merge" -> ((s, d) => {
      val data = tbl(s, d, "lineitem")
        .select(col("*"),
                col("_metadata.file_path").as("__fp"),
                col("_metadata.row_index").as("__pos"))
      val dels = data.where(col("l_orderkey") % 10 === 0)
        .select(col("__fp").as("d_fp"), col("__pos").as("d_pos"))
      data.join(dels, col("__fp") === col("d_fp") && col("__pos") === col("d_pos"), "left_anti")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("l_extendedprice"))).as("price_cents"))
        .orderBy("l_returnflag")
    }),

    // ---- MoR equality-delete application (ref :288-365) ----
    "eq_delete_merge" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
      val dels = tbl(s, d, "part").where(col("p_size") < 5).select("p_partkey")
      li.join(broadcast(dels), col("l_partkey") === col("p_partkey"), "left_anti")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // ---- eq-delete sequence visibility (ref Main.java:328-354 semantics) ----
    // Rows carry a synthetic data-file sequence number; a delete (seq=2)
    // applies only to rows with a STRICTLY SMALLER sequence — later inserts
    // survive. This is the semantic heart of Iceberg v2 MoR.
    "eq_delete_seq_visibility" -> ((s, d) => {
      val li = tbl(s, d, "lineitem")
        .withColumn("__seq", when(col("l_linenumber") <= 3, lit(1L)).otherwise(lit(2L)))
      val dels = tbl(s, d, "part").where(col("p_size") < 10)
        .select(col("p_partkey"), lit(2L).as("d_seq"))
      li.join(broadcast(dels),
              col("l_partkey") === col("p_partkey") && col("d_seq") > col("__seq"),
              "left_anti")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    }),

    // grouped file/position ordering (ref :451-464)
    "file_order_group" -> ((s, d) => {
      tbl(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(min(col("l_orderkey")).as("first_key"),
             max(col("l_orderkey")).as("last_key"),
             count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "filter_modulo" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem WHERE l_orderkey % 10 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "filter_range_band" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey
        |FROM lineitem WHERE l_orderkey % 3000 >= 700 AND l_orderkey % 3000 < 1200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "filter_string_eq" ->
      """SELECT l_linestatus, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "filter_isin" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "agg_partition_counts" ->
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |       COUNT(*) AS cnt
        |FROM lineitem WHERE l_quantity > 0
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "join_broadcast_dim" ->
      """SELECT r_name, COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "join_agg_segment" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "sort_limit_topk" ->
      """SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 100""".stripMargin,

    "distinct_agg" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps,
        |       COUNT(*) AS n_rows
        |FROM lineitem""".stripMargin,

    "pos_assign" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS BIGINT) AS pos
        |FROM lineitem ORDER BY pos""".stripMargin,

    "join_skew_salted" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "pos_delete_merge" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM lineitem WHERE NOT (l_orderkey % 10 = 0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "eq_delete_merge" ->
      """SELECT l_returnflag, COUNT(*) AS cnt
        |FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM part
        |                  WHERE p_partkey = l_partkey AND p_size < 5)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "eq_delete_seq_visibility" ->
      """SELECT l_returnflag, COUNT(*) AS cnt
        |FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM part
        |                  WHERE p_partkey = l_partkey AND p_size < 10
        |                    AND 2 > (CASE WHEN l_linenumber <= 3 THEN 1 ELSE 2 END))
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "file_order_group" ->
      """SELECT l_returnflag, l_linestatus,
        |       MIN(l_orderkey) AS first_key, MAX(l_orderkey) AS last_key,
        |       COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
