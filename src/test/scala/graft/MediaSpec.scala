package graft

import org.apache.spark.sql.functions._

import graft.ext.MediaOps

class MediaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val media =
    MediaOps.synthesizeFromDocs(spark.read.parquet(s"$dir/documents.parquet"))

  test("media schema: binary payload + typed metadata") {
    assert(media.schema("payload").dataType.typeName == "binary")
    val meta = media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("width", "height", "duration_ms", "mime"))
  }

  test("decodeFeatures: batched invocation (mapInPandas-shaped), stable output") {
    val counter = spark.sparkContext.longAccumulator("batches")
    val m = media.repartition(4)
    val feats = MediaOps.decodeFeatures(m, dims = 4, batchSize = 64,
      batchCounter = Some(counter))
    val n = feats.count()
    assert(n == 500)
    // batches of ≤64 across 4 partitions: between ceil(500/64)=8 and 8+4
    assert(counter.value >= 8 && counter.value <= 12,
      s"unexpected batch count ${counter.value}")
    assert(feats.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "payload_len", "features"))
    // determinism across runs (task-retry safety of the stub decoder)
    val a = feats.orderBy("media_id").collect().map(_.toString).toSeq
    val b = MediaOps.decodeFeatures(m, 4, 64).orderBy("media_id")
      .collect().map(_.toString).toSeq
    assert(a == b)
    // features in [0,1)
    val bad = feats.where(expr("exists(features, f -> f < 0 or f >= 1)")).count()
    assert(bad == 0)
  }

  test("resizeMeta halves dimensions; frameSamplePlan covers duration") {
    val r = MediaOps.resizeMeta(media, 2)
      .where(col("media_id") === 1).select("meta.width", "meta.height").head()
    assert(r.getInt(0) == (1 % 8 * 160 + 320) / 2)
    assert(r.getInt(1) == (1 % 8 * 90 + 180) / 2)
    val frames = MediaOps.frameSamplePlan(media, 500)
    val perVideo = frames.groupBy("media_id").count()
      .join(media.select(col("media_id"), col("meta.duration_ms")), "media_id")
    val wrong = perVideo.where(expr("count != duration_ms div 500 + 1")).count()
    assert(wrong == 0)
  }

  test("frameSampleNormalized: exactly nFrames per video, evenly spaced, in range") {
    val frames = MediaOps.frameSampleNormalized(media, nFrames = 4)
    val nVideos = media.where(col("kind") === "video").count()
    assert(frames.count() == nVideos * 4)
    // per video: 4 distinct indices 0..3, timestamps monotone and < duration
    val bad = frames
      .join(media.select(col("media_id"), col("meta.duration_ms").as("dur")), "media_id")
      .where(expr("frame_ts_ms != (frame_idx * dur) div 4") ||
        col("frame_ts_ms") >= col("dur") && col("dur") > 0)
      .count()
    assert(bad == 0)
  }

  test("durationStats: only time-based kinds, buckets partition the durations") {
    val stats = MediaOps.durationStats(media, bucketMs = 5000)
    assert(stats.where(col("kind") === "image").count() == 0)
    // bucket totals reconcile with the raw durations
    val total = stats.agg(sum("total_ms")).head().getLong(0)
    val expected = media.where(col("kind").isin("audio", "video"))
      .agg(sum(col("meta.duration_ms").cast("long"))).head().getLong(0)
    assert(total == expected)
  }
}
