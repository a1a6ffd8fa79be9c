package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.MediaOps
import Q._

/** Multimodal-column queries (SURVEY.md §2.9): binary payload + typed
  * metadata synthesized deterministically from `documents`, pushed through
  * the batched decode path (stubbed codec — see [[graft.ext.MediaOps]]).
  * Oracles reconstruct the md5-derived stub features in SQL.
  */
object MediaQueries {

  val queries: Map[String, QueryFn] = Map(
    "multimodal_features" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      MediaOps.decodeFeatures(media, dims = 4, batchSize = 64)
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum("payload_len").as("total_bytes"),
          round(avg(element_at(col("features"), 1)), 4).as("avg_f0"))
        .orderBy("kind")
    }),

    "multimodal_resize" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      MediaOps.resizeMeta(media, 2)
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum(col("meta.width").cast("long")).as("sum_w"),
          sum(col("meta.height").cast("long")).as("sum_h"))
        .orderBy("kind")
    }),

    "multimodal_frame_sample" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      MediaOps.frameSamplePlan(media, everyMs = 500)
        .agg(count(lit(1)).as("n_frames"),
          sum(col("frame_ts_ms").cast("long")).as("ts_checksum"))
    })
  )

  private val kindSql =
    "(['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1]"

  val oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      s"""SELECT $kindSql AS kind, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         |  round(avg(('0x' || substr(md5('0|' || text), 1, 15))::BIGINT
         |            / 1152921504606846976.0), 4) AS avg_f0
         |FROM documents GROUP BY kind ORDER BY kind""".stripMargin,

    "multimodal_resize" ->
      s"""SELECT $kindSql AS kind, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST((doc_id % 8 * 160 + 320) / 2 AS INTEGER)) AS BIGINT) AS sum_w,
         |  CAST(SUM(CAST((doc_id % 8 * 90 + 180) / 2 AS INTEGER)) AS BIGINT) AS sum_h
         |FROM documents GROUP BY kind ORDER BY kind""".stripMargin,

    // frames at 0,500,...,≤duration: n = dur//500 + 1, Σts = 500·n(n−1)/2
    "multimodal_frame_sample" ->
      """SELECT CAST(SUM(n) AS BIGINT) AS n_frames,
        |       CAST(SUM(500 * n * (n - 1) / 2) AS BIGINT) AS ts_checksum
        |FROM (SELECT n_chars * 40 // 500 + 1 AS n
        |      FROM documents WHERE doc_id % 3 = 2)""".stripMargin
  )
}
