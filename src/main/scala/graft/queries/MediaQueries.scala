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
    }),

    // duration-bucketed stats over the time-based modalities (5 s buckets)
    "multimodal_duration_stats" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      MediaOps.durationStats(media, bucketMs = 5000)
        .orderBy("kind", "dur_bucket")
    }),

    // count-normalized sampling: exactly 4 frames per video however long
    "multimodal_frame_norm" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      MediaOps.frameSampleNormalized(media, nFrames = 4)
        .agg(count(lit(1)).as("n_frames"),
          sum("frame_ts_ms").as("ts_checksum"),
          count_distinct(col("media_id")).as("n_videos"))
    }),

    // per-kind per-dimension mean of the (stub) decoded features — the
    // full 4-dim generalization of multimodal_features' avg_f0
    "multimodal_kind_features" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      MediaOps.featureMeansByKind(media, dims = 4)
        .orderBy("kind", "dim")
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
        |      FROM documents WHERE doc_id % 3 = 2)""".stripMargin,

    "multimodal_duration_stats" ->
      s"""SELECT kind, CAST(dur // 5000 AS BIGINT) AS dur_bucket,
         |       CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dur) AS BIGINT) AS total_ms
         |FROM (SELECT $kindSql AS kind, n_chars * 40 AS dur FROM documents)
         |WHERE kind IN ('audio', 'video')
         |GROUP BY kind, dur_bucket ORDER BY kind, dur_bucket""".stripMargin,

    "multimodal_frame_norm" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_frames,
        |       CAST(SUM((f.i * d.dur) // 4) AS BIGINT) AS ts_checksum,
        |       CAST(COUNT(DISTINCT d.doc_id) AS BIGINT) AS n_videos
        |FROM (SELECT doc_id, n_chars * 40 AS dur FROM documents
        |      WHERE doc_id % 3 = 2) d,
        |     LATERAL unnest(range(0, 4)) AS f(i)""".stripMargin,

    "multimodal_kind_features" ->
      s"""SELECT $kindSql AS kind, CAST(j.j AS INTEGER) AS dim,
         |  round(avg(('0x' || substr(md5(CAST(j.j AS VARCHAR) || '|' || text), 1, 15))::BIGINT
         |            / 1152921504606846976.0), 4) AS avg_f,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM documents, LATERAL unnest(range(0, 4)) AS j(j)
         |GROUP BY kind, dim ORDER BY kind, dim""".stripMargin
  )
}
