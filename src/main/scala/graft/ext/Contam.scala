package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for LLM training corpora: flag
  * training documents whose word n-grams overlap a held-out benchmark/eval
  * set (the standard pre-training decontamination pass — n-gram collision
  * against eval suites).
  *
  * Scale shape: the benchmark side is eval-suite sized (thousands of docs,
  * not terabytes) so its distinct gram set BROADCASTS; the corpus side
  * explodes each document's distinct grams and probes the broadcast hash
  * relation — O(corpus grams) lookups, no shuffle of text. The per-doc
  * rollup keys on the document id; grams of one document are produced
  * colocated by the explode, so partial aggregation collapses to ~one row
  * per doc before the exchange.
  */
object Contam {

  /** Distinct word `n`-grams of a normalized text column, EXPLODED to one
    * row per gram. The gram expression feeds explode() inline — never
    * materialized as its own attribute first — because Catalyst's
    * InferFiltersFromGenerate would otherwise synthesize a
    * `size(grams) > 0` pre-filter, substitute the full gram pipeline into
    * it through the projection, and push it to the scan: the lambda-heavy
    * (interpreted) tokenize+gram+distinct chain then runs 3× per row.
    * Measured 4.6 s → 0.7 s at sf0.1 for [[ngramOverlap]]. Docs with
    * fewer than n tokens vanish at the explode (empty array ⇒ no rows). */
  private def docGrams(df: DataFrame, textCol: String, idCol: String,
                       n: Int): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("_t"))
      .select(col(idCol),
        explode(array_distinct(TextOps.wordNgrams("_t", n))).as("_g"))

  /** Per-document contamination against a benchmark set: the fraction of
    * the doc's distinct word n-grams that appear anywhere in the benchmark.
    * Documents with fewer than n tokens (no grams) are dropped — they can
    * never collide. Returns (idCol, n_grams, n_hit, contam ∈ [0,1]). */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame,
                   textCol: String, idCol: String, n: Int): DataFrame = {
    // both sides probe on xxhash64 of the gram, not the gram string: the
    // broadcast relation carries 8-byte longs instead of ~n-word strings
    // and every probe is an integer compare. A cross-side collision
    // (corpus gram hashing onto a DIFFERENT bench gram) needs ~2^64/
    // (|bench|·|corpus|) luck — immaterial against the 2^-60 the md5-based
    // dedup family already accepts.
    val bg = docGrams(bench, textCol, idCol, n)
      .select(xxhash64(col("_g")).as("_gh")).distinct()
      .withColumn("_hit", lit(1))
    docGrams(corpus, textCol, idCol, n)
      .select(col(idCol), xxhash64(col("_g")).as("_gh"))
      .join(broadcast(bg), Seq("_gh"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0))).as("n_hit"))
      .withColumn("contam",
        round(col("n_hit") / col("n_grams").cast("double"), 4))
  }

  /** Verbatim multi-needle decontamination through a broadcast
    * AHO-CORASICK automaton: ONE forward pass over each document finds
    * every needle occurrence — O(|text| + hits) per doc regardless of the
    * needle count, where the per-needle `contains` probe
    * (the `contam_exact_substr` formulation) pays O(|text| · |needles|).
    * The needle set is eval-suite sized BY CONTRACT (that bound is what
    * makes the driver-side build + broadcast sound — same contract as
    * [[ngramOverlap]]'s broadcast gram set). Returns one (docIdCol,
    * needle_id) row per (document, matched needle) pair. */
  def exactSubstringsAC(corpus: DataFrame, needles: DataFrame,
                        textCol: String, docIdCol: String,
                        needleIdCol: String, needleCol: String): DataFrame = {
    import org.apache.spark.sql.{Row, SparkSession}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val pats = needles.select(col(needleIdCol), col(needleCol)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ac = AhoCorasick.build(pats)
    val bc = corpus.sparkSession.sparkContext.broadcast(ac)
    val out = StructType(Seq(StructField(docIdCol, LongType),
      StructField("needle_id", LongType)))
    val enc = RowEncoder.encoderFor(out)
    corpus.select(col(docIdCol), col(textCol)).mapPartitions { it =>
      it.flatMap { r =>
        bc.value.matchedIds(r.getString(1)).map(nid => Row(r.getLong(0), nid))
      }
    }(enc)
  }
}

/** Classic Aho–Corasick multi-pattern matcher (goto/fail/output automaton),
  * built once on the driver from an eval-scale pattern set and broadcast;
  * node count = total pattern characters, transitions as per-node hash
  * maps (patterns are text, the alphabet is sparse). */
final class AhoCorasick private (
    next: Array[scala.collection.mutable.HashMap[Char, Int]],
    fail: Array[Int],
    out: Array[List[Int]],
    patIds: Array[Long]) extends Serializable {

  /** Distinct pattern ids occurring anywhere in `text` — one forward scan,
    * following fail links on mismatch (amortized O(|text|)). */
  def matchedIds(text: String): Iterator[Long] = {
    val found = scala.collection.mutable.LongMap.empty[Unit]
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (state != 0 && !next(state).contains(c)) state = fail(state)
      state = next(state).getOrElse(c, 0)
      var v = out(state)
      while (v.nonEmpty) { found.update(patIds(v.head), ()); v = v.tail }
      i += 1
    }
    found.keysIterator
  }
}

object AhoCorasick {
  def build(patterns: Seq[(Long, String)]): AhoCorasick = {
    val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case ((_, p), pi) =>
      var v = 0
      p.foreach { c =>
        v = next(v).getOrElseUpdate(c, {
          next += scala.collection.mutable.HashMap.empty[Char, Int]
          ends += Nil
          next.length - 1
        })
      }
      ends(v) = pi :: ends(v)
    }
    // fail links + merged outputs, BFS order
    val fail = Array.fill(next.length)(0)
    val out = ends.toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach(queue += _)
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      next(v).foreach { case (c, u) =>
        var f = fail(v)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(u) = next(f).get(c).filter(_ != u).getOrElse(0)
        out(u) = out(u) ++ out(fail(u))
        queue += u
      }
    }
    new AhoCorasick(next.toArray, fail, out, patterns.map(_._1).toArray)
  }
}
