package graft

import org.apache.spark.sql.functions._

import graft.ext.MediaOps

class MediaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docsDf = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val media = MediaOps.synthesizeFromDocs(docsDf)

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
    // determinism across runs (task-retry safety of the decoder)
    val a = feats.orderBy("media_id").collect().map(_.toString).toSeq
    val b = MediaOps.decodeFeatures(m, 4, 64).orderBy("media_id")
      .collect().map(_.toString).toSeq
    assert(a == b)
    // decoded features are exact integers; dim 3 is pixel count (BMP) or
    // sample count (WAV) and must be strictly positive
    val bad = feats.where(expr(
      "exists(features, f -> f != round(f)) or element_at(features, 4) <= 0")).count()
    assert(bad == 0)
  }

  test("BMP codec: known 2x2 image round-trips; header fields honored") {
    import graft.ext.MediaCodecs
    // R,G,B per pixel: (10,20,30) (40,50,60) / (70,80,90) (100,110,120)
    val vals = Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val bmp = MediaCodecs.encodeBmp(2, 2, vals(_))
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    // 2px × 3B = 6B rows padded to 8 → 54 + 16 bytes
    assert(bmp.length == 54 + 16)
    val (w, h, px) = MediaCodecs.decodeBmp(bmp)
    assert(w == 2 && h == 2 && px.toSeq == vals.toSeq)
    // byte-level: file rows are bottom-up BGR — first data byte is the
    // BLUE of the BOTTOM-LEFT pixel (logical (0,1) → B=90)
    assert((bmp(54) & 0xff) == 90)
  }

  test("WAV codec: known samples round-trip incl. negatives; foreign chunks skipped") {
    import graft.ext.MediaCodecs
    val vals = Array(0, 1000, -1000, 32767, -32768, 7)
    val wav = MediaCodecs.encodeWav(vals.length, 8000, vals(_))
    assert(wav.length == 44 + 2 * vals.length)
    val (rate, s) = MediaCodecs.decodeWav(wav)
    assert(rate == 8000 && s.toSeq == vals.toSeq)
    // a LIST chunk inserted before data must be skipped, not parsed
    val extra = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    val spliced = wav.take(12) ++ extra.array() ++ wav.drop(12)
    // fix RIFF size field
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val (rate2, s2) = MediaCodecs.decodeWav(spliced)
    assert(rate2 == 8000 && s2.toSeq == vals.toSeq)
  }

  test("resizeBmp: 2x2 box average with integer floor; synthesized payloads decode to the formula") {
    import graft.ext.{MediaCodecs, MediaOps}
    // 4x2 → 2x1: out(0,0,c) = floor(avg of the 2x2 block)
    val bmp = MediaCodecs.encodeBmp(4, 2, i => i * 3 % 251)
    val (w0, h0, src) = MediaCodecs.decodeBmp(bmp)
    val (w, h, out) = MediaCodecs.decodeBmp(MediaCodecs.resizeBmp(bmp, 2))
    assert(w == 2 && h == 1)
    for (c <- 0 until 3; x <- 0 until 2) {
      val taps = Seq((0, 2 * x), (0, 2 * x + 1), (1, 2 * x), (1, 2 * x + 1))
        .map { case (y, sx) => src((y * w0 + sx) * 3 + c) }
      assert(out((0 * 2 + x) * 3 + c) == taps.sum / 4)
    }
    // a synthesized payload decodes back to the closed-form pixel values
    val media = this.media.where(col("kind") === "image").limit(1)
      .select("media_id", "payload").head()
    val id = media.getLong(0)
    val (wS, hS, pxS) = MediaCodecs.decodeBmp(media.getAs[Array[Byte]](1))
    assert(pxS.indices.forall(i => pxS(i) == ((id * 31 + i * 7) % 256).toInt))
    assert(wS == ((id % 8) * 4 + 8) && hS == ((id % 8) * 2 + 6))
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

  test("PNG codec: round-trip exercises all five scanline filters") {
    import graft.ext.MediaCodecs
    // 7x11: seven rows → filters 0,1,2,3,4,0,1 all appear; non-trivial
    // values so Sub/Up/Average/Paeth reconstruction must be exact
    val (w, h) = (11, 7)
    def pix(i: Int): Int = (i * 37 + (i * i) % 251) % 256
    val png = MediaCodecs.encodePng(w, h, pix)
    assert(MediaCodecs.isPng(png))
    val (dw, dh, px) = MediaCodecs.decodePng(png)
    assert(dw == w && dh == h)
    assert(px.length == w * h * 3)
    val bad = (0 until w * h * 3).filter(i => px(i) != pix(i))
    assert(bad.isEmpty, s"mismatched logical indices: ${bad.take(5)}")
  }

  test("PNG codec: 1-pixel-wide and 1-row images (filter edge cases)") {
    import graft.ext.MediaCodecs
    for ((w, h) <- Seq((1, 6), (6, 1), (1, 1))) {
      def pix(i: Int): Int = (i * 101 + 7) % 256
      val (dw, dh, px) = MediaCodecs.decodePng(MediaCodecs.encodePng(w, h, pix))
      assert((dw, dh) == (w, h))
      assert((0 until w * h * 3).forall(i => px(i) == pix(i)))
    }
  }

  test("PNG codec: RGBA (color type 6) decodes, alpha dropped; ancillary chunks skipped") {
    import graft.ext.MediaCodecs
    // hand-build a 2x2 RGBA PNG with filter 0 rows and a tEXt chunk the
    // decoder must skip; alpha bytes must not leak into the RGB output
    val (w, h) = (2, 2)
    val rgba = Array(
      10, 20, 30, 255, 40, 50, 60, 128,
      70, 80, 90, 0, 100, 110, 120, 200)
    val stride = 4 * w
    val raw = new Array[Byte]((1 + stride) * h)
    for (y <- 0 until h; i <- 0 until stride)
      raw(y * (1 + stride) + 1 + i) = rgba(y * stride + i).toByte
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(6.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(MediaCodecs.pngChunk("IHDR", ihdr))
    out.write(MediaCodecs.pngChunk("tEXt",
      "Comment synthetic".getBytes("US-ASCII")))
    out.write(MediaCodecs.pngChunk("IDAT", comp.toByteArray))
    out.write(MediaCodecs.pngChunk("IEND", Array.emptyByteArray))
    val (dw, dh, px) = MediaCodecs.decodePng(out.toByteArray)
    assert((dw, dh) == (w, h))
    val expected = Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    assert(px.toSeq == expected.toSeq)
  }

  test("mixed corpus: PNG images decode to the same features as their BMP twins") {
    val mixed = MediaOps.synthesizeMixedFromDocs(docsDf)
    val bmp = MediaOps.synthesizeFromDocs(docsDf)
    def feats(df: org.apache.spark.sql.DataFrame) =
      MediaOps.decodeFeatures(df.where(col("kind") === "image"))
        .select("media_id", "features").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val (fm, fb) = (feats(mixed), feats(bmp))
    assert(fm.nonEmpty && fm == fb,
      "container change must be invisible to decoded features")
    // and the payloads really are different containers
    val kinds = mixed.where(col("kind") === "image")
      .select(col("payload")).limit(1).collect()
    assert(graft.ext.MediaCodecs.isPng(kinds(0).getAs[Array[Byte]](0)))
  }

  test("JPEG: grayscale block-constant images round-trip exactly") {
    import graft.ext.MediaCodecs
    val nbx = 5; val nby = 3
    def bv(bx: Int, by: Int): Int = (7 + (by * nbx + bx) * 31) % 256
    val bytes = MediaCodecs.encodeJpegBlocks(nbx * 8, nby * 8, gray = true,
      (bx, by, _) => bv(bx, by))
    assert(MediaCodecs.isJpeg(bytes))
    val (w, h, px) = MediaCodecs.decodeJpeg(bytes)
    assert((w, h) == (40, 24))
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val want = bv(x / 8, y / 8)
      val got = px((y * w + x) * 3 + c)
      assert(got == want, s"pixel ($x,$y,$c): got $got want $want")
    }
  }

  test("JPEG: 4:2:0 color with flat macroblocks — upsampling + YCbCr exact") {
    import graft.ext.MediaCodecs
    // component values chosen mid-range so the BT.601 conversion is exact
    // and unclamped; each chroma block spans a 16x16 macroblock
    def comp(mx: Int, my: Int, c: Int): Int = c match {
      case 0 => 120 + mx * 3 + my * 5 // luma varies per 8x8 block
      case 1 => 118 + (mx % 3) * 4    // Cb per macroblock
      case _ => 132 + (my % 3) * 4    // Cr per macroblock
    }
    val bytes = MediaCodecs.encodeJpegBlocks(32, 32, gray = false, comp)
    val (w, h, px) = MediaCodecs.decodeJpeg(bytes)
    assert((w, h) == (32, 32))
    def clamp(v: Int) = math.max(0, math.min(255, v))
    for (y <- 0 until h by 3; x <- 0 until w by 5) {
      val yv = comp(x / 8, y / 8, 0)
      val cb = comp(x / 16, y / 16, 1) - 128
      val cr = comp(x / 16, y / 16, 2) - 128
      val want = Seq(
        clamp(yv + ((91881 * cr + 32768) >> 16)),
        clamp(yv - ((22554 * cb + 46802 * cr + 32768) >> 16)),
        clamp(yv + ((116130 * cb + 32768) >> 16)))
      val got = (0 until 3).map(c => px((y * w + x) * 3 + c))
      assert(got == want, s"pixel ($x,$y): got $got want $want")
    }
  }

  test("JPEG: hand-built AC spectra exercise run-length, ZRL, zigzag and IDCT") {
    import graft.ext.MediaCodecs
    // one AC coefficient at zig-zag index 1 (u=1, v=0): the decoded row
    // pattern is the textbook half-cosine, computed here independently
    val zz = new Array[Int](64)
    zz(0) = 0; zz(1) = 200
    val (w, h, px) = MediaCodecs.decodeJpeg(MediaCodecs.encodeJpegCoeffBlock8x8(zz))
    assert((w, h) == (8, 8))
    for (x <- 0 until 8) {
      val s = 0.25 * (1.0 / math.sqrt(2)) * 200 *
        math.cos((2 * x + 1) * math.Pi / 16) * math.sqrt(2)
      // direct formula: s(x) = 1/4 * C(v=0)=1/√2 * C(u=1)=1 * S * cos(..)
      val want = math.max(0, math.min(255, math.round(
        0.25 * (1.0 / math.sqrt(2)) * 200 * math.cos((2 * x + 1) * math.Pi / 16))
        .toInt + 128))
      assert(px(x * 3) == want, s"x=$x got ${px(x * 3)} want $want (s=$s)")
      // row-constant down the block (v = 0)
      for (y <- 1 until 8) assert(px((y * 8 + x) * 3) == px(x * 3))
    }
    // a sparse high-frequency spectrum with a >16 zero run forces ZRL;
    // round-trip through decode must place it at the right natural index
    val zz2 = new Array[Int](64)
    zz2(0) = 8 // DC = 1 after /8
    zz2(40) = 64
    val (_, _, px2) = MediaCodecs.decodeJpeg(MediaCodecs.encodeJpegCoeffBlock8x8(zz2))
    // zig-zag index 40 is natural index 29 (row 3, col 5) → u=5, v=3 —
    // check every pixel against the direct 2-D formula
    def direct(x: Int, y: Int): Int = {
      var s = 0.0
      for (u <- 0 until 8; v <- 0 until 8) {
        val nat = v * 8 + u
        val coef = if (nat == 0) 8.0 else if (nat == 29) 64.0 else 0.0
        if (coef != 0.0) {
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          s += 0.25 * cu * cv * coef *
            math.cos((2 * x + 1) * u * math.Pi / 16) *
            math.cos((2 * y + 1) * v * math.Pi / 16)
        }
      }
      math.max(0, math.min(255, math.round(s).toInt + 128))
    }
    for (y <- 0 until 8; x <- 0 until 8)
      assert(px2((y * 8 + x) * 3) == direct(x, y),
        s"($x,$y): got ${px2((y * 8 + x) * 3)} want ${direct(x, y)}")
  }

  test("JPEG: restart markers and multi-MCU grayscale via the mixed corpus path") {
    import graft.ext.MediaCodecs
    // the corpus synthesizer's shape: verify a larger grid decodes per-block
    val nbx = 6; val nby = 4; val id = 47L
    val bytes = MediaCodecs.encodeJpegBlocks(nbx * 8, nby * 8, gray = true,
      (bx, by, _) => graft.ext.MediaOps.jpegBlockVal(id, by * nbx + bx))
    val (w, h, px) = MediaCodecs.decodeJpeg(bytes)
    var rSum = 0L
    var i = 0
    while (i < px.length) { if (i % 3 == 0) rSum += px(i); i += 1 }
    val want = (0 until nbx * nby).map(b =>
      64L * graft.ext.MediaOps.jpegBlockVal(id, b)).sum
    assert(rSum == want, s"channel sum $rSum != closed-form $want")
    assert((w, h) == (48, 32))
  }

  test("GVID clip container: indexed frame slicing + sampled JPEG decode") {
    import graft.ext.MediaCodecs
    val id = 11L // nbx=6? (11%6+1)=6, nby=(11%4+1)=4, nf=(11%5+1+2)=4? (11%5)+3=4
    val (nbx, nby) = graft.ext.MediaOps.jpegBlocks(id)
    val nf = graft.ext.MediaOps.clipFrameCountOf(id)
    val frames = (0 until nf).map { f =>
      MediaCodecs.encodeJpegBlocks(nbx * 8, nby * 8, gray = true,
        (bx, by, _) => graft.ext.MediaOps.clipBlockVal(id, f, by * nbx + bx))
    }
    val clip = MediaCodecs.encodeClip(frames)
    assert(MediaCodecs.isClip(clip))
    assert(MediaCodecs.clipFrameCount(clip) == nf)
    // every frame slices back byte-identical through the header index
    (0 until nf).foreach { f =>
      assert(java.util.Arrays.equals(MediaCodecs.clipFrame(clip, f), frames(f)),
        s"frame $f did not slice back intact")
    }
    // sampled decode matches the closed-form per-frame sums
    (0 until nf by 2).foreach { f =>
      val (w, h, px) = MediaCodecs.decodeJpeg(MediaCodecs.clipFrame(clip, f))
      var rSum = 0L
      var p = 0
      while (p < w * h) { rSum += px(3 * p); p += 1 }
      val want = (0 until nbx * nby).map(b =>
        64L * graft.ext.MediaOps.clipBlockVal(id, f, b)).sum
      assert(rSum == want, s"frame $f: $rSum != $want")
    }
    intercept[IllegalArgumentException](MediaCodecs.clipFrame(clip, nf))
  }
}
