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
}
