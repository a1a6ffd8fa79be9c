package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for LLM training-data curation at scale
  * (SURVEY.md §2.9). Everything is a pure column expression (whole-stage
  * codegen, no UDFs, no shuffles beyond the declared groupBys), and every
  * hash is derived from md5 hex — the one hash family Spark and DuckDB
  * both expose byte-identically, which keeps these operators
  * oracle-checkable.
  */
object TextOps {

  /** 60-bit deterministic hash: first 15 hex digits of md5, as a long.
    * DuckDB mirror: `('0x' || substr(md5(s), 1, 15))::BIGINT`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Lowercased, latin-alnum-normalized text, single-spaced. */
  def norm(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Whitespace tokens of normalized text. */
  def tokens(text: Column): Column = split(norm(text), " ")

  /** Character k-shingles at the given stride, as an array column.
    * Stride > 1 bounds cost at 100 TB (shingles overlap as long as
    * stride < k, preserving near-dup sensitivity). */
  def shingles(normColName: String, k: Int, stride: Int): Column = {
    val c = normColName
    expr(s"transform(sequence(1, greatest(length($c) - ${k - 1}, 1), $stride)," +
      s" i -> substr($c, i, $k))")
  }

  /** MinHash signature: for each of `k` salted hash functions, the min
    * 60-bit hash over the shingle set. Returns an array<long> of length k.
    * Salting re-hashes (salt || '|' || shingle) — no multiply-mod families,
    * so the same construction is expressible in oracle SQL. */
  def minhashSig(shinglesColName: String, k: Int): Column = {
    val s = shinglesColName
    val mins = (0 until k).map(i =>
      s"array_min(transform($s, x -> cast(conv(substr(md5(cast(concat('$i|', x) as binary)), 1, 15), 16, 10) as bigint)))")
    expr(s"array(${mins.mkString(", ")})")
  }

  /** 16-bit SimHash over the token multiset: bit b is set iff tokens whose
    * hash has bit b outnumber those without (majority vote). */
  def simhash16(tokensColName: String): Column = {
    val t = tokensColName
    val hs = s"transform($t, x -> cast(conv(substr(md5(cast(x as binary)), 1, 15), 16, 10) as bigint))"
    val bits = (0 until 16).map { b =>
      s"(case when 2 * size(filter($hs, h -> (shiftright(h, $b) & 1) = 1)) >= size($t) " +
        s"then ${1 << b} else 0 end)"
    }
    expr(s"(${bits.mkString(" + ")})").cast("int")
  }

  /** Order-sensitive document fingerprint: positionally-weighted token-hash
    * sum, mod 1000003 (rolling-hash-family; bounded so the sum never
    * overflows a long). */
  def fingerprint(tokensColName: String): Column = {
    val t = tokensColName
    expr(s"aggregate(zip_with($t, sequence(0, size($t) - 1), (x, i) -> " +
      "(cast(conv(substr(md5(cast(x as binary)), 1, 15), 16, 10) as bigint) % 1000003)" +
      " * ((i % 97) + 1)), cast(0 as bigint), (acc, v) -> acc + v) % 1000003")
  }

  /** BPE-ish token count: latin words, single digits, single other glyphs. */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  // ---- language ID (n-gram/stopword heuristic) -------------------------

  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is", "of", "to"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "y", "es", "las"))

  private def stopScore(tokensColName: String, words: Seq[String]): Column = {
    val t = tokensColName
    val set = words.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter($t, x -> x in ($set)))")
  }

  /** Heuristic language ID: CJK presence → zh; otherwise the stopword
    * profile with the strictly highest hit count, ties → en. */
  def langId(text: Column, tokensColName: String): Column = {
    val sEn = stopScore(tokensColName, Stopwords("en"))
    val sDe = stopScore(tokensColName, Stopwords("de"))
    val sFr = stopScore(tokensColName, Stopwords("fr"))
    val sEs = stopScore(tokensColName, Stopwords("es"))
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(sDe > greatest(sEn, sFr, sEs), "de")
      .when(sFr > greatest(sEn, sDe, sEs), "fr")
      .when(sEs > greatest(sEn, sDe, sFr), "es")
      .otherwise("en")
  }

  /** Quality score in [0,1]: length band + low punctuation + stopword
    * presence + sane mean word length (the classic cheap filters). */
  def qualityParts(text: Column, tokensColName: String): (Column, Column, Column, Column) = {
    val nTok = size(col(tokensColName))
    val punct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val punctRatio = punct.cast("double") / greatest(length(text), lit(1)).cast("double")
    val stopRatio = stopScore(tokensColName, Stopwords.values.flatten.toSeq).cast("double") /
      greatest(nTok, lit(1)).cast("double")
    val meanLen = length(regexp_replace(norm(text), " ", "")).cast("double") /
      greatest(nTok, lit(1)).cast("double")
    (nTok.cast("long"), punctRatio, stopRatio, meanLen)
  }

  def qualityScore(text: Column, tokensColName: String): Column = {
    val (nTok, punctRatio, _, meanLen) = qualityParts(text, tokensColName)
    val lenOk = when(nTok >= 10 && nTok <= 1000, 0.4).otherwise(0.0)
    val punctOk = when(punctRatio < 0.1, 0.3).otherwise(0.0)
    val wordOk = when(meanLen >= 2.5 && meanLen <= 9.5, 0.3).otherwise(0.0)
    lenOk + punctOk + wordOk
  }
}
