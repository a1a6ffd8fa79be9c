package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** MinHash+LSH dedup at corpus scale: 10^6 synthetic documents with 50k
  * PLANTED near-duplicate pairs (one word of forty changed — the
  * boilerplate-edit shape exact hashing misses), asserting planted-pair
  * recall and the spurious rate, with wall time reported. The sf-fixture
  * keys prove correctness against DuckDB; this proves the banded-LSH
  * plan (one shuffle on the band key, capped buckets, never all-pairs)
  * actually holds at a million documents.
  *
  * `SPARK_GRAFT_DEDUP_N` shrinks the corpus for local iteration; the
  * default is the full 1,000,000 (950k unique + 50k planted dups).
  */
class DedupScaleSpec extends SparkSpec {

  private val n: Long = sys.env.get("SPARK_GRAFT_DEDUP_N").map(_.toLong)
    .getOrElse(1000000L)
  private val nDups: Long = n / 20   // 5% planted near-dups
  private val nBase: Long = n - nDups

  /** 40 FIXED-WIDTH pseudo-words from a seed column; `flip` perturbs
    * word 0 only. Width matters: a variable-length word-0 edit would
    * shift every downstream character-shingle boundary and turn a
    * one-word change into a whole-document change — real boilerplate
    * edits don't do that, and neither should the fixture. */
  private def docExpr(seed: String, flip: String): String =
    s"""array_join(transform(sequence(0, 39),
       |  j -> lpad(conv(CAST(abs(hash(concat(CAST($seed AS STRING), '_',
       |         CAST(j AS STRING),
       |         CASE WHEN j = 0 THEN $flip ELSE '' END))) % 999983
       |       AS STRING), 10, 36), 5, 'z')), ' ')""".stripMargin

  test(s"MinHash LSH at $n docs: planted near-dup recall >= 0.98, " +
      "spurious rate < 1%, one banded shuffle") {
    val base = spark.range(0, nBase).toDF("id")
      .withColumn("text", expr(docExpr("id", "''")))
    // planted: doc (id - nBase) with word 0 flipped — 39/40 words shared
    val planted = spark.range(nBase, n).toDF("id")
      .withColumn("text", expr(docExpr(s"(id - ${nBase}L)", "'X'")))
    val docs = base.unionByName(planted)

    val t0 = System.nanoTime()
    val pairs = Dedup.minhashPairs(docs, "text", "id")
      .select("id_a", "id_b").localCheckpoint()
    val nPairs = pairs.count()
    val wallS = (System.nanoTime() - t0) / 1e9

    val plantedFound = pairs
      .where(col("id_b") - col("id_a") === nBase && col("id_a") < nDups)
      .count()
    val recall = plantedFound.toDouble / nDups
    val spurious = nPairs - plantedFound
    println(f"DEDUPSCALE n=$n wall=${wallS}%.1f pairs=$nPairs " +
      f"planted_recall=${recall}%.4f spurious=$spurious")
    info(f"DEDUP-SCALE n=$n wall=${wallS}%.1f s, $nPairs pairs, " +
      f"recall=${recall}%.4f, spurious=$spurious")
    assert(recall >= 0.98, f"planted near-dup recall $recall%.4f below 0.98")
    assert(spurious < n / 100,
      s"$spurious spurious pairs — LSH banding is over-merging")
  }
}
