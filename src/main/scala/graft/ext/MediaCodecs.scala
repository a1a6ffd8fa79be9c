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
}
