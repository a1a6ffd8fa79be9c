package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the full declared operator inventory (SURVEY.md
  * §2.8 relational/MoR keys + §2.9 LLM-pipeline extensions); `oracleSql`
  * carries the DuckDB-equivalent SQL for the driver's hash compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The spine of the whole engine (SURVEY.md §7.3): Parquet scan with file
    * metadata columns → positional-delete synthesis (predicate shape from
    * reference `Main.java:160`) → MoR anti-join → aggregate → sort.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val data = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("*"),
              col("_metadata.file_path").as("__fp"),
              col("_metadata.row_index").as("__pos"))
    val dels = data.where(col("l_orderkey") % 10 === 0)
      .select(col("__fp").as("d_fp"), col("__pos").as("d_pos"))
    data.join(dels, col("__fp") === col("d_fp") && col("__pos") === col("d_pos"), "left_anti")
      .groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice")).as("revenue"), count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
  }

  /** One entry per implemented operator from SURVEY.md §2. Every query is
    * wrapped to register graft's native Catalyst functions on whatever
    * session the host hands us (idempotent). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (RelationalQueries.queries ++ MorQueries.queries ++ ExtQueries.queries ++
      MediaQueries.queries ++ BreadthQueries.queries ++
      RelevanceQueries.queries ++ AnalyticsQueries.queries ++
      AnalyticsQueries.queries2 ++
      CorpusSourceQueries.queries ++ DepthQueries.queries ++
      DepthQueries.tpchAll ++
      CatalogQueries.queries ++ StreamTableQueries.queries).map { case (k, fn) =>
      k -> ((s: SparkSession, d: String) => {
        graft.functions.GraftFunctions.ensureRegistered(s); fn(s, d)
      })
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ MorQueries.oracleSql ++ ExtQueries.oracleSql ++
      MediaQueries.oracleSql ++ BreadthQueries.oracleSql ++
      RelevanceQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      CorpusSourceQueries.oracleSql ++ DepthQueries.oracleSql ++
      DepthQueries.tpchAllOracle ++
      CatalogQueries.oracleSql ++ StreamTableQueries.oracleSql
}
