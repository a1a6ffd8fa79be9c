package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for the two container formats that need no external
  * libraries: 24-bit uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
  * bottom-up rows, 4-byte row padding) and RIFF/WAVE PCM (16-bit LE mono).
  * Public-knowledge formats (Windows BMP spec / Microsoft RIFF spec) —
  * these give the multimodal pipeline REAL decode: the feature extractor
  * parses headers, strides, and two's-complement samples from actual bytes,
  * so a codec bug shows up as an oracle mismatch, not a stubbed hash.
  *
  * Logical pixel addressing used throughout: index `i = (y·w + x)·3 + c`
  * with `c ∈ {0:R, 1:G, 2:B}`, row 0 at the TOP. The BMP byte layout
  * (bottom-up, BGR, padded) is an encode/decode detail that must round-trip
  * away.
  */
object MediaCodecs {

  // ---- BMP (24bpp, uncompressed) ------------------------------------

  private def bmpStride(w: Int): Int = ((3 * w + 3) / 4) * 4

  /** Encode a 24bpp BMP from logical top-down RGB values.
    * `pix(i)` must return the byte value (0..255) for logical index i. */
  def encodeBmp(w: Int, h: Int, pix: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val stride = bmpStride(w)
    val size = 54 + stride * h
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)               // reserved, data offset
    b.putInt(40).putInt(w).putInt(h)                    // info header, +h = bottom-up
      .putShort(1).putShort(24).putInt(0)               // planes, bpp, BI_RGB
      .putInt(stride * h).putInt(2835).putInt(2835)     // image size, 72 DPI
      .putInt(0).putInt(0)                              // palette counts
    var y = h - 1                                       // file rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        b.put(pix(base + 2).toByte)                     // B
          .put(pix(base + 1).toByte)                    // G
          .put(pix(base).toByte)                        // R
        x += 1
      }
      var pad = stride - 3 * w
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Decode a 24bpp BMP to `(w, h, logical top-down RGB array)`. Honors the
    * header's data offset, stride padding, and bottom-up vs top-down
    * (negative height) row order. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = b.getInt(10)
    val w = b.getInt(18)
    val rawH = b.getInt(22)
    val bottomUp = rawH > 0
    val h = math.abs(rawH)
    val bpp = b.getShort(28)
    require(bpp == 24 && b.getInt(30) == 0, s"unsupported BMP: bpp=$bpp")
    val stride = bmpStride(w)
    require(bytes.length >= dataOffset + stride * h, "truncated BMP")
    val out = new Array[Int](w * h * 3)
    var fileRow = 0
    while (fileRow < h) {
      val y = if (bottomUp) h - 1 - fileRow else fileRow
      val rowOff = dataOffset + fileRow * stride
      var x = 0
      while (x < w) {
        val base = (y * w + x) * 3
        out(base) = bytes(rowOff + 3 * x + 2) & 0xff     // R
        out(base + 1) = bytes(rowOff + 3 * x + 1) & 0xff // G
        out(base + 2) = bytes(rowOff + 3 * x) & 0xff     // B
        x += 1
      }
      fileRow += 1
    }
    (w, h, out)
  }

  /** Box-average downscale by `factor` on logical RGB values (integer
    * division, the deterministic resize), re-encoded as BMP. Dims must be
    * divisible by `factor`. */
  def resizeBmp(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val (w, h, px) = decodeBmp(bytes)
    require(w % factor == 0 && h % factor == 0,
      s"dims ${w}x$h not divisible by $factor")
    val (ow, oh) = (w / factor, h / factor)
    encodeBmp(ow, oh, { k =>
      val c = k % 3; val x = (k / 3) % ow; val y = (k / 3) / ow
      var sum = 0
      var dy = 0
      while (dy < factor) {
        var dx = 0
        while (dx < factor) {
          sum += px(((y * factor + dy) * w + (x * factor + dx)) * 3 + c)
          dx += 1
        }
        dy += 1
      }
      sum / (factor * factor)
    })
  }

  // ---- WAV (RIFF PCM, 16-bit LE mono) -------------------------------

  /** Encode 16-bit mono PCM samples (`sample(i)` in [-32768, 32767]). */
  def encodeWav(nSamples: Int, sampleRate: Int, sample: Int => Int): Array[Byte] = {
    val dataLen = 2 * nSamples
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                                      // PCM
      .putShort(1)                                      // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)                           // byte rate
      .putShort(2)                                      // block align
      .putShort(16)                                     // bits/sample
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) { b.putShort(sample(i).toShort); i += 1 }
    b.array()
  }

  /** Decode RIFF PCM to `(sampleRate, samples)`. Walks the chunk list (a
    * real writer may insert LIST/fact chunks between fmt and data). */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Int]) = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV payload")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var rate = -1
    var samples: Array[Int] = null
    while (off + 8 <= bytes.length && (rate < 0 || samples == null)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = b.getInt(off + 4)
      id match {
        case "fmt " =>
          require(b.getShort(off + 8) == 1, "not PCM")
          require(b.getShort(off + 10) == 1, "not mono")
          require(b.getShort(off + 22) == 16, "not 16-bit")
          rate = b.getInt(off + 12)
        case "data" =>
          val n = len / 2
          samples = new Array[Int](n)
          var i = 0
          while (i < n) { samples(i) = b.getShort(off + 8 + 2 * i).toInt; i += 1 }
        case _ => ()                                    // skip foreign chunk
      }
      off += 8 + len + (len & 1)                        // chunks are word-aligned
    }
    require(rate > 0 && samples != null, "missing fmt/data chunk")
    (rate, samples)
  }

  // ---- PNG (8-bit truecolor ± alpha, zlib in the JDK) ----------------
  //
  // The format real corpora actually carry. Pure JVM: DEFLATE via
  // `java.util.zip.{Deflater, Inflater}`, chunk CRCs via
  // `java.util.zip.CRC32` — no external libraries (PNG spec, RFC 2083).
  // The encoder writes color type 2 (RGB), bit depth 8, non-interlaced,
  // cycling the per-scanline filter y % 5 — a valid stream that exercises
  // ALL five standard filters, so the decoder's unfiltering (None/Sub/Up/
  // Average/Paeth reconstruction) is proven by every round-trip, not just
  // the trivial filter-0 path. The decoder additionally accepts color
  // type 6 (RGBA — alpha participates in filtering, then drops from the
  // logical RGB output) and skips ancillary chunks.

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == PngSig(i))

  /** One chunk: length + type + data + CRC32(type ++ data). */
  private[graft] def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    val b = ByteBuffer.allocate(12 + data.length)
    b.putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
    b.array()
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(comp: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(comp)
    val out = new Array[Byte](expect)
    var off = 0
    while (off < expect && !inf.finished()) {
      val n = inf.inflate(out, off, expect - off)
      require(n > 0 || !inf.needsInput, "truncated PNG stream")
      off += n
    }
    inf.end()
    require(off == expect, s"PNG stream: got $off of $expect bytes")
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an 8-bit truecolor PNG from logical top-down RGB values
    * (`pix(i)` as in [[encodeBmp]]). Scanline y uses filter y % 5. */
  def encodePng(w: Int, h: Int, pix: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val stride = 3 * w
    val raw = new Array[Byte]((1 + stride) * h)
    var y = 0
    while (y < h) {
      val ft = y % 5
      val rowOff = y * (1 + stride)
      raw(rowOff) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = pix(y * stride + i)
        val a = if (i >= 3) pix(y * stride + i - 3) else 0
        val b = if (y > 0) pix((y - 1) * stride + i) else 0
        val c = if (y > 0 && i >= 3) pix((y - 1) * stride + i - 3) else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw(rowOff + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    out.write(pngChunk("IHDR", ihdr))
    out.write(pngChunk("IDAT", deflate(raw)))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Decode an 8-bit truecolor (±alpha) non-interlaced PNG to
    * `(w, h, logical top-down RGB)` — full 5-filter reconstruction;
    * ancillary chunks skipped; IDAT segments concatenated; alpha (color
    * type 6) participates in unfiltering and is then dropped. */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(isPng(bytes), "not a PNG payload")
    val bb = ByteBuffer.wrap(bytes)
    var pos = 8
    var w = 0; var h = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = bb.getInt(pos)
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      typ match {
        case "IHDR" =>
          w = bb.getInt(dataOff); h = bb.getInt(dataOff + 4)
          val bitDepth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          val interlace = bytes(dataOff + 12) & 0xff
          require(bitDepth == 8, s"unsupported PNG bit depth $bitDepth")
          require(colorType == 2 || colorType == 6,
            s"unsupported PNG color type $colorType (truecolor ± alpha only)")
          require(interlace == 0, "interlaced PNG not supported")
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => done = true
        case _ => () // ancillary (tEXt, gAMA, …): skip
      }
      pos = dataOff + len + 4 // skip CRC
    }
    require(w > 0 && h > 0 && idat.size() > 0, "missing IHDR/IDAT")
    val bpp = if (colorType == 6) 4 else 3
    val stride = bpp * w
    val raw = inflate(idat.toByteArray, (1 + stride) * h)
    val out = new Array[Int](w * h * 3)
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + stride)
      val ft = raw(rowOff) & 0xff
      require(ft <= 4, s"bad PNG filter $ft")
      var i = 0
      while (i < stride) {
        val x = raw(rowOff + 1 + i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b = prev(i)
        val c = if (i >= bpp) prev(i - bpp) else 0
        cur(i) = (ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
        }) & 0xff
        i += 1
      }
      var px = 0
      while (px < w) {
        val base = (y * w + px) * 3
        out(base) = cur(px * bpp)
        out(base + 1) = cur(px * bpp + 1)
        out(base + 2) = cur(px * bpp + 2)
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    (w, h, out)
  }

  // ---- JPEG (baseline sequential DCT, ITU-T T.81) --------------------
  //
  // The format web-scale multimodal corpora actually carry. Pure JVM, no
  // libraries: marker parse (DQT/DHT/SOF0/DRI/SOS), canonical Huffman
  // decode, run-length AC, dequantization, separable IDCT, nearest-
  // neighbor chroma upsampling for any (h,v) ∈ {1,2} sampling (4:4:4,
  // 4:2:2, 4:2:0), restart markers, fixed-point YCbCr→RGB. The encoder
  // writes BLOCK-CONSTANT images (DC-only coefficients, unit quant
  // tables): a constant 8×8 block round-trips the DCT EXACTLY (DC = 8·s,
  // IDCT of a DC-only block is the constant DC/8), which is what lets the
  // lossy format carry closed-form integer oracles. Huffman tables are
  // the T.81 Annex K typical tables.

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff

  // ---- "GVID" clip container (multi-frame video payloads) ---------------
  //
  // The minimal MJPEG-style shape a frame-sampler needs: magic "GVID",
  // int32 frame count, int32 per-frame byte lengths (the seek index),
  // then the frames — baseline JPEGs — back to back. The INDEX is the
  // point: sampling every k-th frame slices and decodes ONLY those
  // frames; skipped frames cost zero decode work. All ints big-endian.

  def encodeClip(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeBytes("GVID")
    d.writeInt(frames.size)
    frames.foreach(f => d.writeInt(f.length))
    frames.foreach(d.write)
    bos.toByteArray
  }

  def isClip(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes(0) == 'G' && bytes(1) == 'V' &&
      bytes(2) == 'I' && bytes(3) == 'D'

  private def clipInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  def clipFrameCount(bytes: Array[Byte]): Int = {
    require(isClip(bytes), "not a GVID clip")
    clipInt(bytes, 4)
  }

  /** Slice frame `i` out of a clip via the header index — no other frame
    * is touched, let alone decoded. */
  def clipFrame(bytes: Array[Byte], i: Int): Array[Byte] = {
    val n = clipFrameCount(bytes)
    require(i >= 0 && i < n, s"frame $i out of 0..${n - 1}")
    var off = 8 + 4 * n
    var k = 0
    while (k < i) { off += clipInt(bytes, 8 + 4 * k); k += 1 }
    java.util.Arrays.copyOfRange(bytes, off, off + clipInt(bytes, 8 + 4 * i))
  }

  // T.81 Annex K.3.3: typical Huffman tables — (bits per length 1..16, values)
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val DcChrBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChrBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Zig-zag order: index in scan order → (row·8 + col). */
  private val ZigZag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman encode table: symbol → (code, length). */
  private def buildEncTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) { out(vals(k)) = (code, len); code += 1; k += 1; i += 1 }
      code <<= 1
    }
    out.toMap
  }

  /** Canonical Huffman decode table: (firstCode, firstIndex) per length. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        if (bits(len) == 0) { maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
  }

  private final class BitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); nbits += len
      while (nbits >= 8) {
        val b = ((acc >> (nbits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s (spec)
      val b = (((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xff).toInt
      out.write(b); if (b == 0xff) out.write(0x00)
      nbits = 0; acc = 0
    }
  }

  /** DC difference → (category, appended bits). */
  private def dcBits(diff: Int): (Int, Int) = {
    var size = 0; var v = math.abs(diff)
    while (v != 0) { size += 1; v >>= 1 }
    val bits = if (diff >= 0) diff else diff + (1 << size) - 1
    (size, bits)
  }

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + payload.length)
    b.put(0xff.toByte).put(marker.toByte)
      .putShort((payload.length + 2).toShort).put(payload)
    b.array()
  }

  /** Encode a BLOCK-CONSTANT baseline JPEG: every 8×8 block of component
    * `c` holds the constant `blockVal(bx, by, c)` ∈ [0, 255]. With unit
    * quant tables a constant block is DC-only and round-trips EXACTLY —
    * closed-form oracles survive the lossy format. `gray = true` writes
    * one component; otherwise 4:2:0 YCbCr where each chroma block covers
    * a 16×16 macroblock (blockVal receives macroblock coords for c=1,2).
    * Dimensions must be multiples of 8 (gray) / 16 (color). */
  def encodeJpegBlocks(w: Int, h: Int, gray: Boolean,
                       blockVal: (Int, Int, Int) => Int): Array[Byte] = {
    val mcu = if (gray) 8 else 16
    require(w > 0 && h > 0 && w % mcu == 0 && h % mcu == 0,
      s"dims ${w}x$h must be multiples of $mcu")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    // DQT: table 0 (and 1 for color), all ones — lossless for DC-only
    val unitQ = Array.fill(64)(1.toByte)
    out.write(seg(0xdb, (0.toByte +: unitQ).toArray))
    if (!gray) out.write(seg(0xdb, (1.toByte +: unitQ).toArray))
    // SOF0
    val nComp = if (gray) 1 else 3
    val sof = ByteBuffer.allocate(6 + 3 * nComp)
    sof.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(nComp.toByte)
    sof.put(1.toByte).put(if (gray) 0x11.toByte else 0x22.toByte).put(0.toByte)
    if (!gray) {
      sof.put(2.toByte).put(0x11.toByte).put(1.toByte)
      sof.put(3.toByte).put(0x11.toByte).put(1.toByte)
    }
    out.write(seg(0xc0, sof.array()))
    // DHT: DC/AC luminance (+ chrominance for color)
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
      (((cls << 4) | id).toByte +: (bits.drop(1).map(_.toByte) ++
        vals.map(_.toByte))).toArray
    out.write(seg(0xc4, dht(0, 0, DcLumBits, DcLumVals)))
    out.write(seg(0xc4, dht(1, 0, AcLumBits, AcLumVals)))
    if (!gray) {
      out.write(seg(0xc4, dht(0, 1, DcChrBits, DcChrVals)))
      out.write(seg(0xc4, dht(1, 1, AcChrBits, AcChrVals)))
    }
    // SOS
    val sos = ByteBuffer.allocate(4 + 2 * nComp)
    sos.put(nComp.toByte)
    sos.put(1.toByte).put(0x00.toByte)
    if (!gray) { sos.put(2.toByte).put(0x11.toByte); sos.put(3.toByte).put(0x11.toByte) }
    sos.put(0.toByte).put(63.toByte).put(0.toByte)
    out.write(seg(0xda, sos.array()))
    // entropy-coded data: per MCU, DC-only blocks
    val dcLum = buildEncTable(DcLumBits, DcLumVals)
    val dcChr = buildEncTable(DcChrBits, DcChrVals)
    val acLum = buildEncTable(AcLumBits, AcLumVals)
    val acChr = buildEncTable(AcChrBits, AcChrVals)
    val bw = new BitWriter
    val pred = new Array[Int](3)
    def writeBlock(comp: Int, v: Int): Unit = {
      val dc = 8 * (v - 128)
      val (size, bits) = dcBits(dc - pred(comp))
      pred(comp) = dc
      val (dTab, aTab) = if (comp == 0) (dcLum, acLum) else (dcChr, acChr)
      val (c0, l0) = dTab(size)
      bw.put(c0, l0)
      if (size > 0) bw.put(bits, size)
      val (ce, le) = aTab(0x00) // EOB: all ACs zero
      bw.put(ce, le)
    }
    val mcusX = w / mcu; val mcusY = h / mcu
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (gray) writeBlock(0, blockVal(mx, my, 0))
        else {
          // 4 luma blocks (2×2 inside the macroblock), then Cb, Cr
          var by = 0
          while (by < 2) {
            var bx = 0
            while (bx < 2) {
              writeBlock(0, blockVal(mx * 2 + bx, my * 2 + by, 0)); bx += 1
            }
            by += 1
          }
          writeBlock(1, blockVal(mx, my, 1))
          writeBlock(2, blockVal(mx, my, 2))
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(bw.out.toByteArray)
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  /** TEST/fixture helper: one-block 8×8 grayscale JPEG from EXPLICIT
    * zig-zag coefficients (unit quant tables) — lets specs drive the
    * AC run-length / ZRL / zigzag / IDCT paths with hand-chosen spectra
    * the DC-only corpus encoder can't produce. */
  def encodeJpegCoeffBlock8x8(zz: Array[Int]): Array[Byte] = {
    require(zz.length == 64, "64 zig-zag coefficients required")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte))
    out.write(seg(0xdb, (0.toByte +: Array.fill(64)(1.toByte)).toArray))
    val sof = ByteBuffer.allocate(9)
    sof.put(8.toByte).putShort(8.toShort).putShort(8.toShort).put(1.toByte)
      .put(1.toByte).put(0x11.toByte).put(0.toByte)
    out.write(seg(0xc0, sof.array()))
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
      ((cls << 4).toByte +: (bits.drop(1).map(_.toByte) ++ vals.map(_.toByte))).toArray
    out.write(seg(0xc4, dht(0, DcLumBits, DcLumVals)))
    out.write(seg(0xc4, dht(1, AcLumBits, AcLumVals)))
    out.write(seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)))
    val dcTab = buildEncTable(DcLumBits, DcLumVals)
    val acTab = buildEncTable(AcLumBits, AcLumVals)
    val bw = new BitWriter
    val (dSize, dBits) = dcBits(zz(0))
    val (dc, dl) = dcTab(dSize)
    bw.put(dc, dl)
    if (dSize > 0) bw.put(dBits, dSize)
    var k = 1
    var run = 0
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run >= 16) { val (zc, zl) = acTab(0xf0); bw.put(zc, zl); run -= 16 }
        val (size, bits) = dcBits(zz(k))
        val (ac, al) = acTab((run << 4) | size)
        bw.put(ac, al); bw.put(bits, size)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = acTab(0x00); bw.put(ec, el) }
    bw.flush()
    out.write(bw.out.toByteArray)
    out.write(Array(0xff, 0xd9).map(_.toByte))
    out.toByteArray
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def align(): Unit = { acc = 0; nbits = 0 }
    /** Next bit; handles 0xFF00 stuffing. RST markers are consumed by the
      * caller via [[atMarker]]/[[skipMarker]]. */
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "truncated JPEG stream")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val next = if (pos < bytes.length) bytes(pos) & 0xff else -1
          require(next == 0x00, s"unexpected marker 0xff$next%02x in scan")
          pos += 1
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Is the (byte-aligned) stream at a marker (0xFF xx, xx != 0)? */
    def atMarker: Boolean =
      pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) != 0x00
    def marker: Int = bytes(pos + 1) & 0xff
    def skipMarker(): Unit = { pos += 2; align() }
  }

  private def huffDecode(br: BitReader, t: HuffTable): Int = {
    var code = br.bit()
    var len = 1
    while (len <= 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
      code = (code << 1) | br.bit(); len += 1
    }
    require(len <= 16, "bad JPEG Huffman code")
    t.values(t.valPtr(len) + code - t.minCode(len))
  }

  /** Extend `v` (size-bit magnitude) to its signed value (T.81 F.2.2.1). */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  /** Separable double-precision IDCT (exact for DC-only blocks after the
    * final rounding; within ±1 of the reference for general blocks, the
    * T.81 accuracy class). Input natural order, output row-major. */
  private def idct8x8(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    val cosT = idctCos
    // rows of coefficients → columns pass, then rows pass
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) 0.70710678118654752440 else 1.0
            val cv = if (v == 0) 0.70710678118654752440 else 1.0
            s += cu * cv * in(v * 8 + u) * cosT(x)(u) * cosT(y)(v)
            v += 1
          }
          u += 1
        }
        tmp(y * 8 + x) = s / 4.0
        x += 1
      }
      y += 1
    }
    tmp.map(d => math.round(d).toInt)
  }

  private lazy val idctCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))

  /** Decode a baseline sequential JPEG to `(w, h, logical top-down RGB)`.
    * Supports 1-component grayscale and 3-component YCbCr with sampling
    * factors (h,v) ∈ {1,2} (4:4:4 / 4:2:2 / 4:2:0), restart intervals,
    * multiple DQT/DHT segments, byte stuffing, ancillary-marker skip. */
  def decodeJpeg(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(isJpeg(bytes), "not a JPEG payload")
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var w = 0; var h = 0
    // per component: (id, hSamp, vSamp, quantId)
    var comps: Array[(Int, Int, Int, Int)] = null
    var restartInterval = 0
    var scanStart = -1
    var scanTabs: Array[(Int, Int)] = null // per component (dcTab, acTab)
    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    var running = true
    while (running) {
      require(pos + 4 <= bytes.length, "truncated JPEG before SOS")
      require((bytes(pos) & 0xff) == 0xff, s"expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      val len = u16(pos + 2)
      val data = pos + 4
      m match {
        case 0xdb => // DQT: one or more tables
          var p = data
          while (p < data + len - 2) {
            val pq = (bytes(p) & 0xf0) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0, "16-bit quant tables not supported (baseline)")
            quant(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = data
          while (p < data + len - 2) {
            val cls = (bytes(p) & 0xf0) >> 4
            val id = bytes(p) & 0x0f
            val bits = 0 +: (1 to 16).map(i => bytes(p + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
            val t = new HuffTable(bits.toArray, vals)
            if (cls == 0) dcTabs(id) = t else acTabs(id) = t
            p += 17 + n
          }
        case 0xc0 | 0xc1 => // SOF0/1 (baseline / extended sequential)
          require((bytes(data) & 0xff) == 8, "only 8-bit precision supported")
          h = u16(data + 1); w = u16(data + 3)
          val nc = bytes(data + 5) & 0xff
          require(nc == 1 || nc == 3, s"unsupported component count $nc")
          comps = Array.tabulate(nc) { i =>
            val o = data + 6 + 3 * i
            ((bytes(o) & 0xff), (bytes(o + 1) & 0xf0) >> 4,
              bytes(o + 1) & 0x0f, bytes(o + 2) & 0xff)
          }
        case 0xc2 => throw new IllegalArgumentException(
          "progressive JPEG not supported (baseline sequential only)")
        case 0xdd => restartInterval = u16(data)
        case 0xda => // SOS
          val ns = bytes(data) & 0xff
          require(comps != null && ns == comps.length,
            "SOS component count mismatch")
          scanTabs = Array.tabulate(ns) { i =>
            val td = (bytes(data + 2 + 2 * i) & 0xf0) >> 4
            val ta = bytes(data + 2 + 2 * i) & 0x0f
            (td, ta)
          }
          scanStart = data + 1 + 2 * ns + 3
          running = false
        case 0xd9 => throw new IllegalArgumentException("EOI before SOS")
        case _ => () // APPn/COM/...: skip
      }
      if (running) pos = data + len - 2
    }
    require(w > 0 && h > 0 && scanStart > 0, "missing SOF/SOS")
    val hmax = comps.map(_._2).max
    val vmax = comps.map(_._3).max
    require(comps.forall(c => (c._2 == 1 || c._2 == 2) &&
      (c._3 == 1 || c._3 == 2)), "sampling factors must be 1 or 2")
    val mcuW = 8 * hmax; val mcuH = 8 * vmax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // per-component planes at sampled resolution
    val planeW = comps.map(c => mcusX * c._2 * 8)
    val planeH = comps.map(c => mcusY * c._3 * 8)
    val planes = comps.indices.map(i =>
      new Array[Int](planeW(i) * planeH(i))).toArray
    val br = new BitReader(bytes, scanStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    var mcuCount = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuCount > 0 &&
            mcuCount % restartInterval == 0) {
          br.align()
          require(br.atMarker && br.marker >= 0xd0 && br.marker <= 0xd7,
            "expected RST marker")
          br.skipMarker()
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val (_, hs, vs, tq) = comps(ci)
          val q = quant(tq)
          val dcT = dcTabs(scanTabs(ci)._1)
          val acT = acTabs(scanTabs(ci)._2)
          var by = 0
          while (by < vs) {
            var bx = 0
            while (bx < hs) {
              java.util.Arrays.fill(coef, 0)
              val s = huffDecode(br, dcT)
              pred(ci) += extend(br.bits(s), s)
              coef(0) = pred(ci) * q(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = huffDecode(br, acT)
                val r = rs >> 4; val size = rs & 0x0f
                if (size == 0) {
                  if (r == 15) k += 16 else eob = true // ZRL / EOB
                } else {
                  k += r
                  require(k < 64, "AC index overflow")
                  coef(ZigZag(k)) = extend(br.bits(size), size) * q(k)
                  k += 1
                }
              }
              val px = idct8x8(coef)
              val baseX = (mx * hs + bx) * 8
              val baseY = (my * vs + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  val v = px(yy * 8 + xx) + 128
                  planes(ci)((baseY + yy) * planeW(ci) + baseX + xx) =
                    if (v < 0) 0 else if (v > 255) 255 else v
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcuCount += 1
        mx += 1
      }
      my += 1
    }
    // upsample + color convert
    val out = new Array[Int](w * h * 3)
    def sampleOf(ci: Int, x: Int, y: Int): Int = {
      val (_, hs, vs, _) = comps(ci)
      val sx = x * hs / hmax
      val sy = y * vs / vmax
      planes(ci)(sy * planeW(ci) + sx)
    }
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        val base = (yy * w + xx) * 3
        if (comps.length == 1) {
          val g = sampleOf(0, xx, yy)
          out(base) = g; out(base + 1) = g; out(base + 2) = g
        } else {
          val yv = sampleOf(0, xx, yy)
          val cb = sampleOf(1, xx, yy) - 128
          val cr = sampleOf(2, xx, yy) - 128
          // fixed-point ITU-R BT.601 (rounded 16-bit scale)
          def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
          out(base) = clamp(yv + ((91881 * cr + 32768) >> 16))
          out(base + 1) = clamp(yv - ((22554 * cb + 46802 * cr + 32768) >> 16))
          out(base + 2) = clamp(yv + ((116130 * cb + 32768) >> 16))
        }
        xx += 1
      }
      yy += 1
    }
    (w, h, out)
  }
}
