package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.9): image/audio/video travel as
  * opaque `binary` payloads with typed metadata; decode / feature-extract /
  * resize run as batched per-partition functions — the Scala analog of
  * `mapInPandas` (iterator of record batches in, iterator of batches out),
  * which is the shape a real decoder (JNI codec, ONNX runtime) plugs into.
  *
  * No image/audio libraries exist in this container, so THE DECODE STEP IS
  * A STUB: `fakeDecode` derives a deterministic 4-dim feature vector from
  * the payload bytes via salted md5 — the Spark-side schema, batching,
  * partitioning, and aggregation are real and tested, and the md5 basis
  * keeps the whole pipeline oracle-checkable end to end.
  */
object MediaOps {

  /** media schema: (media_id, kind, payload, meta{width,height,duration_ms,mime}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("duration_ms", IntegerType), StructField("mime", StringType))))))

  /** Deterministic media table synthesized from `documents`: payload =
    * UTF-8 text bytes, kind/meta hash-derived. Stands in for a real
    * binary-ingest source; every derivation is SQL-mirrorable. */
  def synthesizeFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int").as("height"),
        (col("n_chars") * 40).cast("int").as("duration_ms"),
        concat(lit("media/x-fake-"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int"))).as("mime")).as("meta"))

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** STUBBED decoder: dim j of the feature vector = salted-md5-derived
    * value in [0,1). Mirror SQL:
    * `('0x'||substr(md5(j || '|' || payload),1,15))::BIGINT / 2^60`. */
  private[ext] def fakeDecode(payload: Array[Byte], dims: Int): Array[Double] =
    Array.tabulate(dims) { j =>
      val salted = (s"$j|").getBytes("UTF-8") ++ payload
      java.lang.Long.parseLong(md5Hex(salted).substring(0, 15), 16).toDouble /
        (1L << 60).toDouble
    }

  /** Output schema of [[decodeFeatures]]. */
  def featuresSchema(dims: Int): StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("payload_len", LongType),
    StructField("features", ArrayType(DoubleType))))

  /** Batched feature extraction over partitions: the iterator is consumed
    * in `batchSize` slices, the (stub) decoder runs once per batch over a
    * materialized batch array — exactly the mapInPandas/Arrow contract, so
    * swapping `fakeDecode` for a real codec touches nothing else.
    * `batchCounter` (optional accumulator) observes per-batch granularity
    * for tests. */
  def decodeFeatures(media: DataFrame, dims: Int = 4, batchSize: Int = 64,
                     batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val out = featuresSchema(dims)
    val enc = RowEncoder.encoderFor(out)
    media.select("media_id", "kind", "payload").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        // batch-granular decode (a real impl would hand the whole batch to
        // a vectorized codec); one output row per input row
        batch.iterator.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getLong(0), r.getString(1), payload.length.toLong,
            fakeDecode(payload, dims).toSeq)
        }
      }
    }(enc)
  }

  /** Metadata-level resize: halves dimensions, payload untouched (a real
    * impl would re-encode in the same batched decoder path). */
  def resizeMeta(media: DataFrame, factor: Int): DataFrame =
    media.withColumn("meta", struct(
      (col("meta.width") / factor).cast("int").as("width"),
      (col("meta.height") / factor).cast("int").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.mime").as("mime")))

  /** Frame-sample plan: every `everyMs` ms over the duration — returns
    * (media_id, frame_ts_ms) rows via a sequence explode; the decode of
    * each frame would ride the same batched path. */
  def frameSamplePlan(media: DataFrame, everyMs: Int): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.duration_ms"), lit(everyMs)))
          .as("frame_ts_ms"))

  /** Duration-bucketed stats over time-based media (audio/video): bucket =
    * `duration_ms div bucketMs` (integer div — exact past 2^53). Partial
    * aggregation combines map-side; the shuffle carries (kind, bucket)
    * keys only. */
  def durationStats(media: DataFrame, bucketMs: Int): DataFrame =
    media.where(col("kind").isin("audio", "video"))
      .select(col("kind"),
        expr(s"cast(meta.duration_ms div $bucketMs as bigint)").as("dur_bucket"),
        col("meta.duration_ms").cast("long").as("_dur"))
      .groupBy("kind", "dur_bucket")
      .agg(count(lit(1)).as("n"), sum(col("_dur")).as("total_ms"))

  /** COUNT-normalized frame sampling: every video yields exactly `nFrames`
    * evenly-spaced timestamps `(i · duration) div nFrames` — the shape a
    * training pipeline wants (fixed frames per clip regardless of length),
    * vs [[frameSamplePlan]]'s fixed PERIOD (frame count scales with
    * duration). Row-local explode, no shuffle; each frame's decode rides
    * the same batched path. */
  def frameSampleNormalized(media: DataFrame, nFrames: Int): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").cast("long").as("_dur"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        expr(s"cast((frame_idx * _dur) div $nFrames as bigint)").as("frame_ts_ms"))

  /** Per-kind, per-dimension mean feature over the batched decoder output —
    * the aggregation a corpus-QA dashboard runs per modality. posexplode
    * keeps the dimension index; the shuffle carries (kind, dim) keys with
    * map-side partial averages. */
  def featureMeansByKind(media: DataFrame, dims: Int = 4): DataFrame =
    decodeFeatures(media, dims)
      .select(col("kind"), posexplode(col("features")).as(Seq("dim", "f")))
      .groupBy("kind", "dim")
      .agg(round(avg("f"), 4).as("avg_f"), count(lit(1)).as("n"))
}
