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
    call_function("md5prefix64", c.cast("binary"))

  /** Lowercased, latin-alnum-normalized text, single-spaced. Native
    * single-pass expression; output byte-identical to
    * `trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))` (the DuckDB
    * oracle formulation, equivalence spec-gated in `FunctionsSpec`) with
    * no per-row regex. */
  def norm(text: Column): Column =
    call_function("norm_alnum", text)

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

  /** MinHash signature: `k` hash lanes, each the min over the shingle set.
    * Lanes are 32-bit slices of ceil(k/4) salted md5s — one md5 per salt
    * per shingle instead of one per lane (4× fewer digests; the lambda
    * variable `m` guarantees single evaluation) — folded to the k mins in
    * ONE pass via aggregate + zip_with(least). Same slicing is expressible
    * in oracle SQL: `('0x'||substr(md5((k/4)||'|'||s), 1+8*(k%4), 8))::BIGINT`. */
  def minhashSig(shinglesColName: String, k: Int): Column = {
    require(k % 4 == 0, "k must be a multiple of 4 (4 lanes per md5)")
    val s = shinglesColName
    val nSalts = k / 4
    val salts = (0 until nSalts).map(i => s"'$i'").mkString(", ")
    val perShingle =
      s"""flatten(transform(array($salts),
         |  si -> md5lanes4(cast(concat(si, '|', x) as binary))))""".stripMargin
    val init = Seq.fill(k)(Long.MaxValue.toString + "L").mkString(", ")
    expr(
      s"""aggregate(
         |  transform($s, x -> $perShingle),
         |  array($init),
         |  (acc, h) -> zip_with(acc, h, (a, b) -> least(a, b)))""".stripMargin)
  }

  /** Word n-grams over a tokens-array column, space-joined ("a b c").
    * Empty when the doc has fewer than n tokens (guarded — Spark's
    * `sequence(1, 0)` would otherwise count DOWN). Per-row expression:
    * no shuffle, cost linear in document length. */
  def wordNgrams(tokensColName: String, n: Int): Column = {
    val t = tokensColName
    expr(s"if(size($t) < $n, array()," +
      s" transform(sequence(1, size($t) - ${n - 1})," +
      s" i -> concat_ws(' ', slice($t, i, $n))))")
  }

  /** Gopher-style repetition signal #1: fraction of tokens that repeat an
    * earlier token (1 − distinct/total). 0 for empty docs. */
  def dupTokenRatio(tokensColName: String): Column = {
    val t = tokensColName
    expr(s"1.0d - size(array_distinct($t)) /" +
      s" cast(greatest(size($t), 1) as double)")
  }

  /** Gopher-style repetition signal #2: frequency share of the single most
    * common n-gram (boilerplate detector). NULL when the doc has no grams
    * (mirrors SQL `list_max([])`; AVG skips it identically in both
    * engines). Runs through the NATIVE `top_gram_share` expression
    * ([[graft.functions.TopGramShare]] — one hash-counting pass, O(total)
    * instead of the portable chain's O(distinct·total); equivalence
    * spec-pinned, so the DuckDB oracle contract is unchanged). */
  def topNgramShare(gramsColName: String): Column =
    call_function("top_gram_share", col(gramsColName))

  /** Token-hash array (materialize once; [[simhash16]] reads it 16×). */
  def tokenHashes(tokensColName: String): Column =
    expr(s"transform($tokensColName, x -> md5prefix64(cast(x as binary)))")

  /** 16-bit SimHash over a PRE-COMPUTED token-hash array column: bit b is
    * set iff tokens whose hash has bit b outnumber those without (majority
    * vote). Takes the hash array — not the tokens — so the md5 pass runs
    * once, not 16 times. Runs through the NATIVE `simhash16` expression
    * ([[graft.functions.Simhash16Expr]] — one pass accumulating all 16
    * bit counts instead of 16 filter passes; equivalence spec-pinned). */
  def simhash16(hashesColName: String): Column =
    call_function("simhash16", col(hashesColName))

  /** Order-sensitive document fingerprint: positionally-weighted token-hash
    * sum, mod 1000003 (rolling-hash-family; bounded so the sum never
    * overflows a long). */
  def fingerprint(tokensColName: String): Column = {
    val t = tokensColName
    expr(s"aggregate(zip_with($t, sequence(0, size($t) - 1), (x, i) -> " +
      "(md5prefix64(cast(x as binary)) % 1000003)" +
      " * ((i % 97) + 1)), cast(0 as bigint), (acc, v) -> acc + v) % 1000003")
  }

  /** PII scrubbing for release-able corpora: email addresses and long
    * digit runs (phone-shaped) replace with typed tags. Patterns are
    * deliberately RE2-compatible so the SAME regex runs in Spark (Java
    * regex) and the DuckDB oracle — the full redacted text is
    * fingerprint-checked, not just counted. Emails redact FIRST so their
    * local-part digits can't half-match as phones. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{7,}"
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

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
