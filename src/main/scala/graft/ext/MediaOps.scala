package graft.ext

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
  * The decode step is REAL: payloads are genuine 24bpp BMP (images, video
  * poster frames) and RIFF PCM WAV (audio) containers built and parsed by
  * [[MediaCodecs]] — headers, strides, bottom-up rows, two's-complement
  * samples. Pixel/sample VALUES are closed-form in (media_id, index), so
  * every decoded feature stays DuckDB-reproducible end to end while the
  * Spark side earns it by actually parsing the binary. Formats needing
  * codec libraries this container lacks (JPEG, MP3, H.264) would plug into
  * the same batched iterator without touching anything else.
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

  // closed-form payload content (mirrored by the DuckDB oracles):
  //   image/video: w=(id%8)·4+8, h=(id%8)·2+6, pixel v(i)=(id·31+i·7)%256
  //                at logical index i=(y·w+x)·3+c
  //   audio:       ns=(id%16)·32+64 samples at 8 kHz,
  //                s(i)=((id·17+i·13)%4001)−2000
  private[ext] def bmpDims(id: Long): (Int, Int) =
    (((id % 8) * 4 + 8).toInt, ((id % 8) * 2 + 6).toInt)
  private[ext] def pixel(id: Long, i: Int): Int = ((id * 31 + i * 7) % 256).toInt
  private[ext] def nSamples(id: Long): Int = ((id % 16) * 32 + 64).toInt
  private[ext] def sample(id: Long, i: Int): Int =
    ((id * 17 + i * 13) % 4001).toInt - 2000
  private[ext] val SampleRate = 8000

  /** Deterministic media table synthesized from `documents`: payloads are
    * REAL containers — BMP for images and video posters, WAV/PCM for audio
    * ([[MediaCodecs]]) — with closed-form pixel/sample values so downstream
    * decoded features stay SQL-mirrorable. Meta describes the (nominal)
    * source media; the payload is its thumbnail/clip rendition. */
  def synthesizeFromDocs(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id"), col("n_chars")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload = kind match {
          case "audio" =>
            MediaCodecs.encodeWav(nSamples(id), SampleRate, sample(id, _))
          case _ =>
            val (w, h) = bmpDims(id)
            MediaCodecs.encodeBmp(w, h, pixel(id, _))
        }
        Row(id, kind, payload,
          Row(((id % 8) * 160 + 320).toInt, ((id % 8) * 90 + 180).toInt,
            (r.getLong(1) * 40).toInt, s"media/x-fake-$kind"))
      }
    }(enc)
  }

  /** Container-sniffing raster decode: BMP, PNG or JPEG → (w, h, RGB). */
  private[ext] def decodeRaster(payload: Array[Byte]): (Int, Int, Array[Int]) =
    if (MediaCodecs.isPng(payload)) MediaCodecs.decodePng(payload)
    else if (MediaCodecs.isJpeg(payload)) MediaCodecs.decodeJpeg(payload)
    else MediaCodecs.decodeBmp(payload)

  /** JPEG geometry for doc `id`: 8-pixel block grid (the format's MCU
    * quantum) — (blocksX, blocksY); dims are blocks·8. */
  private[graft] def jpegBlocks(id: Long): (Int, Int) =
    (((id % 6) + 1).toInt, ((id % 4) + 1).toInt)

  /** Closed-form block value: block b (raster order) of doc `id` is the
    * constant (id·37 + b·11) % 256 — the oracle re-derives channel sums as
    * 64·Σ v since a DC-only block round-trips exactly. */
  private[graft] def jpegBlockVal(id: Long, b: Int): Int =
    ((id * 37 + b.toLong * 11) % 256).toInt

  /** The [[synthesizeFromDocs]] corpus with IMAGE rows carried as real
    * PNGs (8-bit truecolor, all five scanline filters exercised by the
    * encoder's y%5 cycling) and VIDEO poster rows as real baseline JPEGs
    * (grayscale block-constant — DC-only blocks round-trip the DCT
    * exactly, so the lossy container still carries closed-form oracles).
    * Audio stays WAV — the mixed-container shape a real corpus has. */
  def synthesizeMixedFromDocs(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id"), col("n_chars")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload = kind match {
          case "audio" =>
            MediaCodecs.encodeWav(nSamples(id), SampleRate, sample(id, _))
          case "image" =>
            val (w, h) = bmpDims(id)
            MediaCodecs.encodePng(w, h, pixel(id, _))
          case _ =>
            val (nbx, nby) = jpegBlocks(id)
            MediaCodecs.encodeJpegBlocks(nbx * 8, nby * 8, gray = true,
              (bx, by, _) => jpegBlockVal(id, by * nbx + bx))
        }
        Row(id, kind, payload,
          Row(((id % 8) * 160 + 320).toInt, ((id % 8) * 90 + 180).toInt,
            (r.getLong(1) * 40).toInt, s"media/x-fake-$kind"))
      }
    }(enc)
  }

  private[graft] def clipFrameCountOf(id: Long): Int = ((id % 5) + 3).toInt
  private[graft] def clipBlockVal(id: Long, f: Int, b: Int): Int =
    ((id * 37 + b.toLong * 11 + f.toLong * 29) % 256).toInt

  /** Multi-frame VIDEO clips for the video docs (doc_id % 3 == 2): a
    * "GVID" container of 3..7 grayscale JPEG frames, frame f's blocks
    * constant at (id·37 + b·11 + f·29) % 256 — the DC-only blocks
    * round-trip the DCT exactly, so per-frame channel sums stay
    * closed-form through the REAL JPEG path. */
  def synthesizeClipsFromDocs(docs: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("n_frames", IntegerType),
      StructField("payload", BinaryType)))
    val enc = RowEncoder.encoderFor(out)
    docs.select(col("doc_id")).where(col("doc_id") % 3 === 2)
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val (nbx, nby) = jpegBlocks(id)
          val nf = clipFrameCountOf(id)
          val frames = (0 until nf).map { f =>
            MediaCodecs.encodeJpegBlocks(nbx * 8, nby * 8, gray = true,
              (bx, by, _) => clipBlockVal(id, f, by * nbx + bx))
          }
          Row(id, nf, MediaCodecs.encodeClip(frames))
        }
      }(enc)
  }

  /** Frame sampling over clip payloads: decode every `every`-th frame
    * through the real JPEG decoder — the container index makes skipped
    * frames FREE (sliced over, never entropy-decoded), which is the whole
    * economics of video preprocessing at corpus scale: sampling 1-in-30
    * frames must cost 1/30th of the decode, not a full scan per clip.
    * One output row per sampled frame: (media_id, frame_idx, gray_sum,
    * px) with gray_sum = Σ red channel (r=g=b for grayscale). */
  def sampleClipFrames(clips: DataFrame, every: Int,
                       batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("frame_idx", IntegerType),
      StructField("gray_sum", LongType), StructField("px", LongType)))
    val enc = RowEncoder.encoderFor(out)
    clips.select("media_id", "payload").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val payload = r.getAs[Array[Byte]](1)
          val n = MediaCodecs.clipFrameCount(payload)
          (0 until n by every).iterator.map { f =>
            val (w, h, px) = MediaCodecs.decodeJpeg(
              MediaCodecs.clipFrame(payload, f))
            var sum = 0L
            var p = 0
            while (p < w * h) { sum += px(3 * p); p += 1 }
            Row(r.getLong(0), f, sum, w.toLong * h)
          }
        }
      }
    }(enc)
  }

  /** REAL decoder: sniffs the container magic and parses the payload.
    *   BMP → [ΣR, ΣG, ΣB, w·h] (channel sums over decoded pixels)
    *   WAV → [Σs, Σ|s|, nSamples, max|s|]
    * All four dims are exact integers (≪ 2^53), so double-typed features
    * aggregate without float-order hazards. */
  private[ext] def realDecode(payload: Array[Byte], dims: Int): Array[Double] = {
    require(dims == 4, s"decoder emits 4 dims, asked for $dims")
    if (MediaCodecs.isPng(payload) || MediaCodecs.isJpeg(payload) ||
        (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')) {
      val (w, h, px) = decodeRaster(payload)
      val sums = new Array[Long](3)
      var i = 0
      while (i < px.length) { sums(i % 3) += px(i); i += 1 }
      Array(sums(0).toDouble, sums(1).toDouble, sums(2).toDouble,
        (w.toLong * h).toDouble)
    } else {
      val (_, s) = MediaCodecs.decodeWav(payload)
      var (sum, sumAbs, maxAbs) = (0L, 0L, 0L)
      var i = 0
      while (i < s.length) {
        sum += s(i); sumAbs += math.abs(s(i))
        maxAbs = math.max(maxAbs, math.abs(s(i))); i += 1
      }
      Array(sum.toDouble, sumAbs.toDouble, s.length.toDouble, maxAbs.toDouble)
    }
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
          val payload = r.getAs[Array[Byte]](2)
          Row(r.getLong(0), r.getString(1), payload.length.toLong,
            realDecode(payload, dims).toSeq)
        }
      }
    }(enc)
  }

  /** Perceptual average-hash (aHash) over DECODED rasters — the image
    * near-dup primitive of a multimodal curation pipeline: an 8×8
    * nearest-neighbor luminance grid (sample (gy,gx) reads pixel
    * (gy·h/8, gx·w/8) — integer division, any raster size), bit k set
    * when sample k ≥ the integer mean of the 64 samples, rendered as a
    * 64-char '0'/'1' string (stable, groupBy/join-friendly). All
    * integer-exact, so the closed-form pixel corpus makes the hash —
    * and therefore the duplicate CLUSTERS — SQL-replicable.
    *
    * Scale shape: decode is batched per partition like [[decodeFeatures]];
    * the downstream dedup is one shuffle on the 64-byte hash key — never
    * an all-pairs image comparison. */
  def aHash(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("kind", StringType),
      StructField("ahash", StringType)))
    val enc = RowEncoder.encoderFor(out)
    media.where(col("kind") =!= "audio")
      .select("media_id", "kind", "payload").mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val (w, h, px) = decodeRaster(r.getAs[Array[Byte]](2))
            val lums = new Array[Long](64)
            var k = 0
            while (k < 64) {
              val p = ((k / 8) * h / 8) * w + (k % 8) * w / 8
              lums(k) = px(3 * p).toLong + px(3 * p + 1) + px(3 * p + 2)
              k += 1
            }
            val mean = lums.sum / 64
            val sb = new StringBuilder(64)
            lums.foreach(l => sb += (if (l >= mean) '1' else '0'))
            Row(r.getLong(0), r.getString(1), sb.result())
          }
        }
      }(enc)
  }

  /** Audio fingerprint over DECODED samples — the audio near-dup
    * primitive: the clip's |sample| energy contour over 16 equal windows
    * (sample counts are 16-aligned by construction), bit w set when
    * window w's energy × 16 ≥ the total energy (pure integer compare —
    * no division drift), rendered as a 16-char '0'/'1' string. Clips with
    * matching contours bucket together; dedup is ONE shuffle on the
    * fingerprint key. Integer-exact and SQL-replicable like [[aHash]]. */
  def audioFingerprint(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("fp", StringType)))
    val enc = RowEncoder.encoderFor(out)
    media.where(col("kind") === "audio")
      .select("media_id", "payload").mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val (_, s) = MediaCodecs.decodeWav(r.getAs[Array[Byte]](1))
            val win = s.length / 16
            val energies = new Array[Long](16)
            var i = 0
            while (i < s.length) {
              energies(i / win) += math.abs(s(i).toLong); i += 1
            }
            val total = energies.sum
            val sb = new StringBuilder(16)
            energies.foreach(e => sb += (if (e * 16 >= total) '1' else '0'))
            Row(r.getLong(0), sb.result())
          }
        }
      }(enc)
  }

  /** PIXEL-level resize: BMP payloads (image + video poster) are decoded,
    * box-averaged by `factor` (integer division — deterministic), and
    * re-encoded as BMP in the same batched per-partition path the decoder
    * uses. Audio rows are excluded (resize is a raster op). Output carries
    * the new payload so a downstream [[decodeFeatures]] proves the
    * re-encode round-trips. */
  def resizePixels(media: DataFrame, factor: Int, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("kind", StringType),
      StructField("payload", BinaryType)))
    val enc = RowEncoder.encoderFor(out)
    media.where(col("kind") =!= "audio")
      .select("media_id", "kind", "payload").mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            // positional access: rows arriving from a chained object-mode
            // operator carry no schema for name lookup
            Row(r.getLong(0), r.getString(1),
              MediaCodecs.resizeBmp(r.getAs[Array[Byte]](2), factor))
          }
        }
      }(enc)
  }

  /** Metadata-level resize: halves dimensions, payload untouched (the
    * cheap planning-only variant of [[resizePixels]]). */
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

  /** Patch-grid embedding from DECODED pixels — the CLIP-preprocessing
    * shape (image → patch grid → per-patch features): each BMP raster
    * splits into a `grid`×`grid` patch grid and every patch yields its
    * per-channel floor-mean, giving a grid²·3-dim integer-exact embedding
    * per media row. Runs in the same batched per-partition decode path as
    * [[decodeFeatures]] (a vectorized codec slots into the batch loop);
    * map-only — no shuffle until the caller aggregates. Synthesized
    * dimensions are even multiples of the default grid, so patch bounds
    * are exact; a general impl would pad or center-crop first. */
  def patchEmbed(media: DataFrame, grid: Int = 2, batchSize: Int = 64): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("kind", StringType),
      StructField("embed", ArrayType(DoubleType))))
    val enc = RowEncoder.encoderFor(out)
    media.where(col("kind") =!= "audio")
      .select("media_id", "kind", "payload").mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val (w, h, px) = decodeRaster(r.getAs[Array[Byte]](2))
            val (pw, ph) = (w / grid, h / grid)
            val emb = new Array[Double](grid * grid * 3)
            var gy = 0
            while (gy < grid) {
              var gx = 0
              while (gx < grid) {
                val sums = new Array[Long](3)
                var y = gy * ph
                while (y < (gy + 1) * ph) {
                  var x = gx * pw
                  while (x < (gx + 1) * pw) {
                    var c = 0
                    while (c < 3) { sums(c) += px((y * w + x) * 3 + c); c += 1 }
                    x += 1
                  }
                  y += 1
                }
                var c = 0
                while (c < 3) {
                  emb((gy * grid + gx) * 3 + c) =
                    (sums(c) / (pw.toLong * ph)).toDouble
                  c += 1
                }
                gx += 1
              }
              gy += 1
            }
            Row(r.getLong(0), r.getString(1), emb.toSeq)
          }
        }
      }(enc)
  }

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
