package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared helpers for interpreted eval and generated code. */
object TextNorm {

  /** `trim(regexp_replace(lower(s), "[^a-z0-9]+", " "))` in one pass with
    * zero regex machinery: lowercase (same `UTF8String.toLowerCase` the
    * built-in `lower` uses), then a single scan that keeps `[a-z0-9]`,
    * collapses every non-alnum run to one interior space, and drops
    * leading/trailing runs. Byte-identical output to the regex chain
    * (equivalence is spec-gated), ~3× cheaper on the text hot path.
    */
  def normAlnum(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase.toString
    val sb = new java.lang.StringBuilder(lower.length)
    var pendingSpace = false
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Gram of ≤7 bytes packed exactly into a long: data bytes big-endian in
    * the low 56 bits, byte length in the top 8 — distinct grams (including
    * the degenerate shorter-than-k gram of a short string) always pack to
    * distinct longs, so set operations on packs are EXACT, not hashed. */
  def pack(bytes: Array[Byte], from: Int, len: Int): Long = {
    var d = 0L
    var i = 0
    while (i < len) { d = (d << 8) | (bytes(from + i) & 0xffL); i += 1 }
    d | (len.toLong << 56)
  }

  /** One-pass n-gram statistics of an ASCII string vs a pre-sorted packed
    * probe gram set: returns `(nDistinctGrams << 32) | nIntersectProbe`.
    * Gram semantics match `transform(sequence(1, greatest(len-k+1, 1)),
    * i -> substr(s, i, k))` for ASCII input (bytes == characters): every
    * k-byte window, or the whole string when shorter than k. Per row this
    * allocates ONE long[] and sorts it — no per-gram strings, no per-row
    * hash sets, no array columns.
    */
  def ngramStats(s: UTF8String, probeSorted: Array[Long], k: Int): Long = {
    val b = s.getBytes
    val n = b.length
    val count = if (n >= k) n - k + 1 else 1
    val grams = new Array[Long](count)
    if (n < k) grams(0) = pack(b, 0, n)
    else {
      var i = 0
      while (i < count) { grams(i) = pack(b, i, k); i += 1 }
    }
    java.util.Arrays.sort(grams)
    var distinct = 0
    var inter = 0
    var i = 0
    while (i < count) {
      if (i == 0 || grams(i) != grams(i - 1)) {
        distinct += 1
        if (java.util.Arrays.binarySearch(probeSorted, grams(i)) >= 0) inter += 1
      }
      i += 1
    }
    (distinct.toLong << 32) | inter.toLong
  }
}

/** MinHash helper shared by interpreted eval and generated code. */
object MinhashImpl {

  /** MinHash signature of the character `shingleK`-shingles (stride
    * `stride`) of an ASCII string: `numHashes` lanes, lane `4s + j` being
    * the min over shingles of the j-th unsigned-32-bit big-endian slice of
    * `md5(concat(s, '|', shingle))`. Numerically IDENTICAL to the
    * expression pipeline `TextOps.shingles` → `TextOps.minhashSig` (and
    * to the DuckDB oracle formulation), but digests each window IN PLACE —
    * no shingle array, no per-shingle concat/UTF8String allocations.
    * Window semantics match `sequence(1, greatest(len-k+1, 1), stride)` +
    * `substr`: windows at 0, stride, 2·stride … strictly below
    * max(len-k+1, 1), each min(k, len-pos) bytes long.
    */
  def sig(s: UTF8String, numHashes: Int, shingleK: Int, stride: Int): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val nSalts = numHashes / 4
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = MinhashImpl.digest.get()
    val limit = math.max(n - shingleK + 1, 1)
    var pos = 0
    while (pos < limit) {
      val len = math.min(shingleK, n - pos) max 0
      var salt = 0
      while (salt < nSalts) {
        md.reset()
        // salt digits: single ASCII char per salt index (nSalts <= 10)
        md.update(('0' + salt).toByte)
        md.update('|'.toByte)
        md.update(b, pos, len)
        val h = md.digest()
        var j = 0
        while (j < 4) {
          var v = 0L
          var i = 4 * j
          while (i < 4 * j + 4) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
          val lane = 4 * salt + j
          if (v < mins(lane)) mins(lane) = v
          j += 1
        }
        salt += 1
      }
      pos += stride
    }
    new GenericArrayData(mins)
  }

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** Native expression: `minhash_sig(text, numHashes, shingleK, stride)` —
  * the whole shingle→salted-md5→min pipeline in one pass (see
  * [[MinhashImpl.sig]]). `numHashes` must be a multiple of 4 (4 lanes per
  * md5 digest) and at most 40 (salt charset); text must be ASCII (e.g.
  * `norm_alnum` output). Equivalence to the expression pipeline is
  * spec-gated in `FunctionsSpec`.
  */
case class MinhashSig(first: Expression, second: Expression,
                      third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (StringType, IntegerType, IntegerType, IntegerType)
          if second.foldable && third.foldable && fourth.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckFailure(
          "minhash_sig requires foldable (constant) numHashes/shingleK/stride")
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires (string, int, int, int), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "minhash_sig"

  @transient private lazy val numHashes: Int = {
    val v = second.eval(null).asInstanceOf[Int]
    require(v > 0 && v % 4 == 0 && v <= 40,
      s"minhash_sig numHashes must be a positive multiple of 4 <= 40, got $v")
    v
  }
  @transient private lazy val shingleK: Int = {
    val v = third.eval(null).asInstanceOf[Int]
    require(v >= 1, s"minhash_sig shingleK must be >= 1, got $v"); v
  }
  @transient private lazy val stride: Int = {
    val v = fourth.eval(null).asInstanceOf[Int]
    require(v >= 1, s"minhash_sig stride must be >= 1, got $v"); v
  }

  // only the text child is evaluated per row; the knobs are constants
  override def eval(input: InternalRow): Any = {
    val t = first.eval(input)
    if (t == null) null
    else MinhashImpl.sig(t.asInstanceOf[UTF8String], numHashes, shingleK, stride)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val textGen = first.genCode(ctx)
    val code =
      code"""
        ${textGen.code}
        boolean ${ev.isNull} = ${textGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.MinhashImpl.sig(
            ${textGen.value}, $numHashes, $shingleK, $stride);
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): MinhashSig =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** Native expression: single-pass latin-alnum normalization (SQL name
  * `norm_alnum`). Replaces the `trim(regexp_replace(lower(x), ...))` chain
  * on the text-curation hot path — same output, no per-row regex, full
  * whole-stage codegen.
  */
case class NormAlnum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"norm_alnum requires string input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_alnum"

  protected override def nullSafeEval(input: Any): Any =
    TextNorm.normAlnum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normAlnum($c)")

  override protected def withNewChildInternal(newChild: Expression): NormAlnum =
    copy(child = newChild)
}

/** Native expression: `ngram_stats(text, probe, k)` — distinct-gram count
  * and probe-intersection size of the character k-grams of `text`, packed
  * as `(distinct << 32) | intersect`.
  *
  * Replaces the `array_distinct(transform(...substr...))` +
  * `array_intersect(probe)` pipeline for n-gram Jaccard scoring: the
  * built-in chain materializes one string array per row and rebuilds the
  * probe hash set on every row; this computes both counts in one scan over
  * the string with a single long[] allocation, and packs the CONSTANT
  * probe (which must be foldable) once per task into a sorted long[].
  *
  * Contract: `text` must be ASCII (e.g. `norm_alnum` output) so byte
  * windows equal `substr` character windows, and `1 <= k <= 7` so a gram
  * packs exactly into a long. Gram semantics (incl. the whole-string gram
  * when `len < k`) match `transform(sequence(1, greatest(len-k+1, 1), 1),
  * i -> substr(text, i, k))` — spec-gated in `FunctionsSpec`.
  */
case class NgramStats(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckFailure(
          "ngram_stats requires foldable (constant) probe array and k")
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"ngram_stats requires (string, array<string>, int), got ($f, $s, $t)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "ngram_stats"

  @transient private lazy val k: Int = {
    val v = third.eval(null).asInstanceOf[Int]
    require(v >= 1 && v <= 7, s"ngram_stats k must be in [1,7], got $v")
    v
  }

  /** Probe grams packed+sorted once per (deserialized) instance — i.e. once
    * per task; nulls ignored; grams longer than 7 bytes rejected. */
  @transient private lazy val probeSorted: Array[Long] = {
    val arr = second.eval(null).asInstanceOf[ArrayData]
    val out = new Array[Long](arr.numElements())
    var n = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val b = arr.getUTF8String(i).getBytes
        require(b.length <= 7, "ngram_stats probe grams must be <= 7 bytes")
        out(n) = TextNorm.pack(b, 0, b.length)
        n += 1
      }
      i += 1
    }
    val trimmed = java.util.Arrays.copyOf(out, n)
    java.util.Arrays.sort(trimmed)
    trimmed
  }

  // only the text child is evaluated per row; probe and k are constants
  override def eval(input: InternalRow): Any = {
    val t = first.eval(input)
    if (t == null) null
    else TextNorm.ngramStats(t.asInstanceOf[UTF8String], probeSorted, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val textGen = first.genCode(ctx)
    val probeRef = ctx.addReferenceObj("probeSorted", probeSorted, "long[]")
    val code =
      code"""
        ${textGen.code}
        boolean ${ev.isNull} = ${textGen.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.TextNorm.ngramStats(${textGen.value}, $probeRef, $k);
        }"""
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NgramStats =
    copy(first = newFirst, second = newSecond, third = newThird)
}
