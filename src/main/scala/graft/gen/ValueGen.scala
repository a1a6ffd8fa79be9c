package graft.gen

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, retry-safe value generation as pure column expressions.
  *
  * The reference's `ValueGenerator` (reference `ValueGenerator.java:11-97`)
  * is a single-threaded seeded `java.util.Random` plus a monotonic id
  * counter — order-dependent mutable state that cannot survive distributed
  * execution or task retries. Here every value is a pure function of
  * `(row id, seed, column tag)` via `xxhash64`, so any executor computes the
  * same value for the same row on any attempt (SURVEY.md §7.4 risk 2).
  * Exact bit-parity with `java.util.Random` is deliberately NOT reproduced
  * (the oracle checks query results, not file bytes); the *distributional*
  * quirks that are observable in data ARE reproduced:
  *   - February always has 28 days (no leap years), `ValueGenerator.java:53-54`
  *   - hour is uniform in [0,22] — `nextInt(23)` bug, `ValueGenerator.java:64`
  */
object ValueGen {

  val DefaultSeed = 42L // reference `IcebergTableGenerator.java:67`

  /** 64-bit deterministic hash of (seed, tag, id). */
  def hash(id: Column, seed: Long, tag: String): Column =
    xxhash64(lit(seed), lit(tag), id)

  /** Uniform int in [min, max) (ref `intRange`, `ValueGenerator.java:73-76`). */
  def intRange(id: Column, seed: Long, tag: String, min: Int, max: Int): Column = {
    require(max > min, "max must be > min")
    (pmod(hash(id, seed, tag), lit(max.toLong - min)) + min).cast("int")
  }

  /** Uniform double in [min, max) (ref `doubleRange`, `ValueGenerator.java:78-81`). */
  def doubleRange(id: Column, seed: Long, tag: String, min: Double, max: Double): Column = {
    // 2^52 buckets of hash → uniform [0,1) with full double precision
    val unit = pmod(hash(id, seed, tag), lit(1L << 52)).cast("double") / lit((1L << 52).toDouble)
    unit * (max - min) + min
  }

  /** Uniform choice from a fixed list (ref `select`, `ValueGenerator.java:32-34`). */
  def select(id: Column, seed: Long, tag: String, choices: Seq[String]): Column =
    element_at(array(choices.map(lit): _*),
      (pmod(hash(id, seed, tag), lit(choices.size.toLong)) + 1).cast("int"))

  /** Uniform char in [min, max) (ref `charRange`, `ValueGenerator.java:83-86`). */
  def charRange(id: Column, seed: Long, tag: String, min: Char, max: Char): Column =
    chr(intRange(id, seed, tag, min.toInt, max.toInt))

  /** Lexicographically-bounded random string (ref `stringRange`,
    * `ValueGenerator.java:88-97`; unused by any scenario — kept for parity). */
  def stringRange(id: Column, seed: Long, tag: String,
                  min: String, max: String, len: Int): Column = {
    val chars = (0 until len).map { i =>
      val cmin = if (i < min.length) min.charAt(i) else 'a'
      val cmax = if (i < max.length) max.charAt(i) else 'z'
      charRange(id, seed, s"$tag.$i", cmin, cmax)
    }
    concat(chars: _*)
  }

  /** Random timestamp (no zone) within `year`, reproducing the reference's
    * month-length table — Feb fixed at 28 — and the hour∈[0,22] quirk
    * (ref `timestamp(int)`, `ValueGenerator.java:40-67`).
    */
  def timestampInYear(id: Column, seed: Long, tag: String, year: Column): Column = {
    val month = intRange(id, seed, s"$tag.month", 1, 13)
    val ndays = when(month.isin(1, 3, 5, 7, 8, 10, 12), 31)
      .when(month === 2, 28)
      .otherwise(30)
    val day = (pmod(hash(id, seed, s"$tag.day"), ndays.cast("long")) + 1).cast("int")
    val hour = intRange(id, seed, s"$tag.hour", 0, 23)   // quirk: never 23
    val minute = intRange(id, seed, s"$tag.min", 0, 60)
    val sec = intRange(id, seed, s"$tag.sec", 0, 60)
    call_function("make_timestamp_ntz", year, month, day, hour, minute, sec)
  }

  /** No-arg `timestamp()` quirk: year uniform in [1, currentYear − 10]
    * (ref `ValueGenerator.java:36-38`, `nextInt(now.getYear() - 10) + 1` —
    * so year 1 CE is a legal order date). Unused by any reference scenario;
    * implemented for §2.6 completeness. `currentYear` is injectable so the
    * generated data stays deterministic across wall-clock years.
    */
  def timestampAnyYear(id: Column, seed: Long, tag: String,
                       currentYear: Int = java.time.Year.now.getValue): Column = {
    val year = intRange(id, seed, s"$tag.year", 1, currentYear - 10 + 1)
    timestampInYear(id, seed, tag, year)
  }

  /** Random date within `year` (ref `date(int)`, `ValueGenerator.java:69-71`). */
  def dateInYear(id: Column, seed: Long, tag: String, year: Column): Column =
    timestampInYear(id, seed, tag, year).cast("date")
}
