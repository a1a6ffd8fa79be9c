package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.MediaOps
import Q._

/** Multimodal-column queries (SURVEY.md §2.9): binary payload + typed
  * metadata synthesized deterministically from `documents`, pushed through
  * the batched decode path with REAL BMP/WAV codecs
  * ([[graft.ext.MediaCodecs]]). Payload pixel/sample values are closed-form
  * in (media_id, index), so the oracles recompute the decoded features —
  * channel sums, sample sums, resized pixel grids — directly in SQL; a
  * codec bug (stride, row order, sign, padding) breaks the hash compare.
  */
object MediaQueries {

  val queries: Map[String, QueryFn] = Map(
    // features from DECODED payloads: f0 = ΣR (BMP) / Σsamples (WAV) —
    // exact integers, summed per kind; total_bytes checks the container
    // sizes the encoders emitted
    "multimodal_features" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      MediaOps.decodeFeatures(media, dims = 4, batchSize = 64)
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum("payload_len").as("total_bytes"),
          sum(element_at(col("features"), 1).cast("long")).as("f0_sum"))
        .orderBy("kind")
    }),

    // PNG corpus through the full DEFLATE + 5-filter reconstruction path:
    // image rows are REAL 8-bit truecolor PNGs (encoder cycles scanline
    // filters y%5, so None/Sub/Up/Average/Paeth all sit in every payload);
    // the decoded channel sums must equal the same closed-form pixel
    // arithmetic the BMP keys mirror — byte-level codec bugs (filter
    // reconstruction, IDAT reassembly, stride) break the hash
    "multimodal_png_decode" -> ((s, d) => {
      val media = MediaOps.synthesizeMixedFromDocs(tbl(s, d, "documents"))
        .where(col("kind") === "image")
      MediaOps.decodeFeatures(media, dims = 4, batchSize = 64)
        .agg(count(lit(1)).as("n"),
          sum(element_at(col("features"), 1).cast("long")).as("r_sum"),
          sum(element_at(col("features"), 2).cast("long")).as("g_sum"),
          sum(element_at(col("features"), 3).cast("long")).as("b_sum"),
          sum(element_at(col("features"), 4).cast("long")).as("px_sum"))
    }),

    // JPEG corpus through the full baseline path (markers, canonical
    // Huffman, dequant, IDCT): video rows are REAL grayscale JPEGs whose
    // 8×8 blocks are constant — DC-only blocks survive the lossy DCT
    // exactly, so the decoded channel sums equal 64·Σ blockVal in closed
    // form; any entropy/IDCT/marker bug breaks the hash
    "multimodal_jpeg_decode" -> ((s, d) => {
      val media = MediaOps.synthesizeMixedFromDocs(tbl(s, d, "documents"))
        .where(col("kind") === "video")
      MediaOps.decodeFeatures(media, dims = 4, batchSize = 64)
        .agg(count(lit(1)).as("n"),
          sum(element_at(col("features"), 1).cast("long")).as("r_sum"),
          sum(element_at(col("features"), 2).cast("long")).as("g_sum"),
          sum(element_at(col("features"), 3).cast("long")).as("b_sum"),
          sum(element_at(col("features"), 4).cast("long")).as("px_sum"))
    }),

    // REAL raster resize: decode BMP → 2×2 box-average (integer div) →
    // re-encode BMP → decode AGAIN for the aggregate, so the oracle's
    // closed-form resized grid checks both directions of the codec
    // (including the now-unaligned stride padding of the halved widths)
    "multimodal_resize" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      MediaOps.decodeFeatures(MediaOps.resizePixels(media, 2),
          dims = 4, batchSize = 64)
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum((element_at(col("features"), 1) + element_at(col("features"), 2) +
            element_at(col("features"), 3)).cast("long")).as("pix_sum"),
          sum(element_at(col("features"), 4).cast("long")).as("out_pixels"),
          sum("payload_len").as("total_bytes"))
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

    // patch-grid embeddings from decoded pixels (the CLIP-preprocessing
    // shape): 2×2 patches × 3 channels → 12 integer-exact dims per image;
    // folded to per-kind dimension sums so the oracle can recompute every
    // patch mean from the closed-form pixel values
    "multimodal_patch_embed" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      val pe = MediaOps.patchEmbed(media, grid = 2, batchSize = 64)
      val sums = (0 until 12).map(i =>
        sum(element_at(col("embed"), i + 1).cast("long")).as(s"e${i}_sum"))
      pe.groupBy("kind").agg(count(lit(1)).as("n"), sums: _*).orderBy("kind")
    }),

    // perceptual-hash near-dup over decoded rasters: aHash (8×8 nearest
    // luminance grid vs its mean) clusters pixel-identical and
    // near-identical images; dedup = ONE shuffle on the hash key. The
    // corpus has REAL duplicate structure (doc_id ≥ 256 rasters repeat
    // doc_id − 256), and the oracle recomputes every hash closed-form —
    // a decode/stride/threshold bug reshuffles clusters and breaks it.
    "multimodal_ahash_dedup" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      MediaOps.aHash(media, batchSize = 64)
        .groupBy("ahash")
        .agg(count(lit(1)).as("c"), sum("media_id").as("ids"))
        .agg(sum("c").cast("long").as("n_imgs"),
          count(lit(1)).as("n_hashes"),
          coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).cast("long")
            .as("n_dup_imgs"),
          coalesce(sum(when(col("c") > 1, col("ids"))), lit(0L)).cast("long")
            .as("dup_id_sum"))
    }),

    // REAL video-clip frame sampling: "GVID" multi-frame containers
    // (3..7 grayscale JPEG frames per video doc), every 2nd frame sliced
    // out via the header index and decoded through the full baseline JPEG
    // path — skipped frames are never entropy-decoded. Closed-form frame
    // pixel oracle (DC-only blocks are DCT-exact).
    "multimodal_video_frames" -> ((s, d) => {
      val clips = MediaOps.synthesizeClipsFromDocs(tbl(s, d, "documents"))
      MediaOps.sampleClipFrames(clips, every = 2)
        .agg(count(lit(1)).as("n_frames"),
          count_distinct(col("media_id")).as("n_clips"),
          sum(col("frame_idx").cast("long")).as("idx_sum"),
          sum("gray_sum").as("gray"),
          sum("px").as("px_sum"))
    }),

    // audio near-dup via energy-contour fingerprints over decoded WAV
    // samples: 16-window |s| energies vs the total (integer compare),
    // bucketed by the 16-bit contour — the oracle recomputes every
    // fingerprint closed-form, so a decode/windowing/threshold bug
    // reshuffles buckets and breaks the hash
    "multimodal_audio_fp" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      MediaOps.audioFingerprint(media, batchSize = 64)
        .groupBy("fp")
        .agg(count(lit(1)).as("c"), sum("media_id").as("ids"))
        .agg(sum("c").cast("long").as("n_audio"),
          count(lit(1)).as("n_fp"),
          max("c").cast("long").as("max_bucket"),
          sum(col("ids")).cast("long").as("id_sum"))
    }),

    // per-kind per-dimension mean of the decoded features — the full 4-dim
    // generalization of multimodal_features' f0_sum (BMP: ΣR/ΣG/ΣB/pixels;
    // WAV: Σs/Σ|s|/n/max|s|)
    "multimodal_kind_features" -> ((s, d) => {
      val media = MediaOps.synthesizeFromDocs(tbl(s, d, "documents"))
      MediaOps.featureMeansByKind(media, dims = 4)
        .orderBy("kind", "dim")
    })
  )

  private val kindSql =
    "(['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1]"

  /** Shared per-doc media geometry (mirrors MediaOps.bmpDims/nSamples). */
  private val mediaCte =
    s"""m AS (
       |  SELECT doc_id, $kindSql AS kind,
       |         (doc_id % 8) * 4 + 8 AS w, (doc_id % 8) * 2 + 6 AS h,
       |         (doc_id % 16) * 32 + 64 AS ns
       |  FROM documents)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // closed-form decoded features: BMP f0 = Σ over red channel of
    // (id·31 + (3p)·7) % 256; WAV f0 = Σ ((id·17 + i·13) % 4001 − 2000);
    // container sizes: BMP 54 + 3wh (w≡0 mod 4 ⇒ no padding),
    // WAV 44 + 2·ns
    "multimodal_features" ->
      s"""WITH $mediaCte
         |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN kind = 'audio' THEN 44 + 2 * ns
         |                ELSE 54 + 3 * w * h END) AS BIGINT) AS total_bytes,
         |  CAST(SUM(CASE WHEN kind = 'audio'
         |    THEN list_sum(list_transform(range(0, ns),
         |           i -> (doc_id * 17 + i * 13) % 4001 - 2000))
         |    ELSE list_sum(list_transform(range(0, w * h),
         |           p -> (doc_id * 31 + p * 21) % 256))
         |  END) AS BIGINT) AS f0_sum
         |FROM m GROUP BY kind ORDER BY kind""".stripMargin,

    // channel c sum over images (id%3=0): Σ_p (id·31 + (3p+c)·7) % 256
    "multimodal_png_decode" ->
      s"""WITH $mediaCte
         |SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(list_sum(list_transform(range(0, w * h),
         |    p -> (doc_id * 31 + (3 * p) * 7) % 256))) AS BIGINT) AS r_sum,
         |  CAST(SUM(list_sum(list_transform(range(0, w * h),
         |    p -> (doc_id * 31 + (3 * p + 1) * 7) % 256))) AS BIGINT) AS g_sum,
         |  CAST(SUM(list_sum(list_transform(range(0, w * h),
         |    p -> (doc_id * 31 + (3 * p + 2) * 7) % 256))) AS BIGINT) AS b_sum,
         |  CAST(SUM(w * h) AS BIGINT) AS px_sum
         |FROM m WHERE kind = 'image'""".stripMargin,

    // gray block b of video doc_id is constant (id·37 + b·11) % 256 over
    // 64 pixels; r=g=b for grayscale output
    "multimodal_jpeg_decode" ->
      """WITH j AS (
        |  SELECT doc_id, doc_id % 6 + 1 AS nbx, doc_id % 4 + 1 AS nby
        |  FROM documents WHERE doc_id % 3 = 2),
        |s AS (
        |  SELECT doc_id, nbx * 8 * nby * 8 AS px,
        |    64 * list_sum(list_transform(range(0, nbx * nby),
        |      b -> (doc_id * 37 + b * 11) % 256)) AS csum
        |  FROM j)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(csum) AS BIGINT) AS r_sum,
        |  CAST(SUM(csum) AS BIGINT) AS g_sum,
        |  CAST(SUM(csum) AS BIGINT) AS b_sum,
        |  CAST(SUM(px) AS BIGINT) AS px_sum
        |FROM s""".stripMargin,

    // every patch mean recomputed in closed form: patch d (= (gy·2+gx)·3+c)
    // of media doc_id is floor(Σ pixel((gy·ph + k÷pw)·w + gx·pw + k%pw, c)
    // / (pw·ph)) with pw=w/2, ph=h/2 — a stride/row-order bug anywhere in
    // decode or patch addressing shifts a mean and breaks the hash
    "multimodal_patch_embed" -> {
      val filters = (0 until 12).map(i =>
        s"CAST(SUM(pm) FILTER (d = $i) AS BIGINT) AS e${i}_sum")
        .mkString(",\n  ")
      s"""WITH $mediaCte,
         |p AS (
         |  SELECT kind, doc_id, d,
         |    list_sum(list_transform(range(0, (w // 2) * (h // 2)), k ->
         |      (doc_id * 31 +
         |       (((((d // 3) // 2) * (h // 2) + k // (w // 2)) * w
         |         + ((d // 3) % 2) * (w // 2) + k % (w // 2)) * 3 + d % 3) * 7
         |      ) % 256)) // ((w // 2) * (h // 2)) AS pm
         |  FROM m, range(0, 12) t(d) WHERE kind <> 'audio')
         |SELECT kind, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n,
         |  $filters
         |FROM p GROUP BY kind ORDER BY kind""".stripMargin
    },

    // resized grid recomputed in closed form: out pixel (x,y,c) is the
    // floor-average of the 2×2 source block, source index base
    // b = (2y·w + 2x)·3 + c, the 4 taps at b, b+3, b+3w, b+3w+3;
    // total_bytes re-derives the PADDED stride of the halved width
    "multimodal_resize" ->
      s"""WITH $mediaCte,
         |r AS (
         |  SELECT kind, w // 2 AS ow, h // 2 AS oh,
         |    list_sum(list_transform(range(0, (w // 2) * (h // 2) * 3), k ->
         |      (  (doc_id*31 + (6*((k//3)//(w//2))*w + 6*((k//3)%(w//2)) + k%3)*7) % 256
         |       + (doc_id*31 + (6*((k//3)//(w//2))*w + 6*((k//3)%(w//2)) + k%3)*7 + 21) % 256
         |       + (doc_id*31 + (6*((k//3)//(w//2))*w + 6*((k//3)%(w//2)) + k%3)*7 + 21*w) % 256
         |       + (doc_id*31 + (6*((k//3)//(w//2))*w + 6*((k//3)%(w//2)) + k%3)*7 + 21*w + 21) % 256
         |      ) // 4)) AS psum
         |  FROM m WHERE kind <> 'audio')
         |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(psum) AS BIGINT) AS pix_sum,
         |  CAST(SUM(ow * oh) AS BIGINT) AS out_pixels,
         |  CAST(SUM(54 + ((3 * ow + 3) // 4) * 4 * oh) AS BIGINT) AS total_bytes
         |FROM r GROUP BY kind ORDER BY kind""".stripMargin,

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

    // aHash recomputed closed-form: sample k reads pixel
    // p = ((k//8)·h//8)·w + (k%8)·w//8, lum = Σ_c (id·31 + (3p+c)·7) % 256,
    // bit = lum >= floor(mean); clusters then aggregate exactly like Spark
    "multimodal_ahash_dedup" ->
      s"""WITH $mediaCte,
         |l AS (
         |  SELECT doc_id,
         |    list_transform(range(0, 64), k ->
         |        (doc_id*31 + (3*((((k//8)*h)//8)*w + ((k%8)*w)//8))*7) % 256
         |      + (doc_id*31 + (3*((((k//8)*h)//8)*w + ((k%8)*w)//8)+1)*7) % 256
         |      + (doc_id*31 + (3*((((k//8)*h)//8)*w + ((k%8)*w)//8)+2)*7) % 256
         |    ) AS lums
         |  FROM m WHERE kind <> 'audio'),
         |hsh AS (
         |  SELECT doc_id, list_aggregate(
         |    list_transform(lums, v ->
         |      CASE WHEN v >= list_sum(lums) // 64 THEN '1' ELSE '0' END),
         |    'string_agg', '') AS ahash
         |  FROM l),
         |g AS (SELECT ahash, COUNT(*) AS c, SUM(doc_id) AS ids
         |      FROM hsh GROUP BY ahash)
         |SELECT CAST(SUM(c) AS BIGINT) AS n_imgs,
         |       CAST(COUNT(*) AS BIGINT) AS n_hashes,
         |       CAST(COALESCE(SUM(c) FILTER (c > 1), 0) AS BIGINT) AS n_dup_imgs,
         |       CAST(COALESCE(SUM(ids) FILTER (c > 1), 0) AS BIGINT) AS dup_id_sum
         |FROM g""".stripMargin,

    // sampled frames fi ∈ {0,2,4,...} < (id%5)+3; frame gray sum =
    // 64·Σ_b (id·37 + b·11 + fi·29) % 256 over the (id%6+1)·(id%4+1) blocks
    "multimodal_video_frames" ->
      """WITH v AS (
        |  SELECT doc_id, (doc_id % 5) + 3 AS nf,
        |         (doc_id % 6 + 1) * (doc_id % 4 + 1) AS nb,
        |         (doc_id % 6 + 1) * 8 * (doc_id % 4 + 1) * 8 AS px
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, nb, px, fi
        |  FROM v, LATERAL unnest(range(0, nf)) t(fi) WHERE fi % 2 = 0),
        |g AS (
        |  SELECT doc_id, fi, px,
        |    64 * list_sum(list_transform(range(0, nb),
        |      b -> (doc_id * 37 + b * 11 + fi * 29) % 256)) AS gs
        |  FROM f)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_frames,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_clips,
        |       CAST(SUM(fi) AS BIGINT) AS idx_sum,
        |       CAST(SUM(gs) AS BIGINT) AS gray,
        |       CAST(SUM(px) AS BIGINT) AS px_sum
        |FROM g""".stripMargin,

    // contour recomputed closed-form: window w of doc_id sums
    // |((id·17 + i·13) % 4001) − 2000| over i ∈ [w·ns/16, (w+1)·ns/16);
    // bit = energy·16 >= total
    "multimodal_audio_fp" ->
      """WITH a AS (
        |  SELECT doc_id, (doc_id % 16) * 32 + 64 AS ns
        |  FROM documents WHERE doc_id % 3 = 1),
        |e AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 16), w ->
        |      list_sum(list_transform(
        |        range(w * (ns // 16), (w + 1) * (ns // 16)),
        |        i -> abs((doc_id * 17 + i * 13) % 4001 - 2000)))) AS es
        |  FROM a),
        |f AS (
        |  SELECT doc_id, list_aggregate(
        |    list_transform(es, v ->
        |      CASE WHEN v * 16 >= list_sum(es) THEN '1' ELSE '0' END),
        |    'string_agg', '') AS fp
        |  FROM e),
        |g AS (SELECT fp, COUNT(*) AS c, SUM(doc_id) AS ids FROM f GROUP BY fp)
        |SELECT CAST(SUM(c) AS BIGINT) AS n_audio,
        |       CAST(COUNT(*) AS BIGINT) AS n_fp,
        |       CAST(MAX(c) AS BIGINT) AS max_bucket,
        |       CAST(SUM(ids) AS BIGINT) AS id_sum
        |FROM g""".stripMargin,

    // all 4 decoded dims per kind: BMP j<3 → channel-j sum
    // ((id·31 + (3p+j)·7) % 256 summed), j=3 → pixel count;
    // WAV → [Σs, Σ|s|, ns, max|s|]
    "multimodal_kind_features" ->
      s"""WITH $mediaCte,
         |f AS (
         |  SELECT kind, CAST(j.j AS INTEGER) AS dim,
         |    CASE
         |      WHEN kind = 'audio' AND j.j = 0 THEN
         |        list_sum(list_transform(range(0, ns),
         |          i -> (doc_id * 17 + i * 13) % 4001 - 2000))
         |      WHEN kind = 'audio' AND j.j = 1 THEN
         |        list_sum(list_transform(range(0, ns),
         |          i -> abs((doc_id * 17 + i * 13) % 4001 - 2000)))
         |      WHEN kind = 'audio' AND j.j = 2 THEN ns
         |      WHEN kind = 'audio' THEN
         |        list_max(list_transform(range(0, ns),
         |          i -> abs((doc_id * 17 + i * 13) % 4001 - 2000)))
         |      WHEN j.j = 3 THEN w * h
         |      ELSE list_sum(list_transform(range(0, w * h),
         |             p -> (doc_id * 31 + p * 21 + j.j * 7) % 256))
         |    END AS fv
         |  FROM m, LATERAL unnest(range(0, 4)) AS j(j))
         |SELECT kind, dim, round(avg(fv), 4) AS avg_f,
         |       CAST(COUNT(*) AS BIGINT) AS n
         |FROM f GROUP BY kind, dim ORDER BY kind, dim""".stripMargin
  )
}
