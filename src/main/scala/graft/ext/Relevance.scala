package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relevance and language-model scoring for training-data curation
  * (SURVEY.md §2.9 extension surface): TF-IDF keyword extraction, BM25
  * retrieval, and an n-gram LM negative-log-likelihood score — the
  * "perplexity filter" stage of a CCNet-style pipeline.
  *
  * Scale shapes:
  *   - corpus statistics (N, avgdl, vocabulary size) are one-row aggregates
  *     joined back by broadcast — never a driver collect;
  *   - document-frequency / n-gram count tables shuffle only (term, count)
  *     pairs and join back to the exploded corpus on the term key, where
  *     Spark's AQE broadcasts them whenever they fit (at 31-term synthetic
  *     vocab they always do; at web-corpus vocab the join degrades
  *     gracefully to a hash shuffle on the term key — the correct shape);
  *   - per-document ranking is a window partitioned by doc, after scores
  *     are already aggregated — no data-scale single-partition window.
  *
  * Float determinism (oracle-compat): every score is computed from integer
  * counts via `ln` on identical rationals in Spark and DuckDB, rounded
  * before ranking so an ulp of libm difference cannot flip an order.
  */
object Relevance {

  /** Exploded (doc, term) pairs of the normalized corpus. */
  private def terms(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")

  /** Top-`k` TF-IDF terms per document.
    *
    * idf = ln((N+1)/(df+1)) (smoothed); score = tf · idf, rounded to 6
    * decimals BEFORE the per-doc rank so cross-engine ordering is stable.
    * Returns (idCol, term, tf, score) — `k` rows per surviving document.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val t = terms(docs, idCol, textCol)
    val tf = t.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
    val w = Window.partitionBy(idCol).orderBy(desc("score"), col("term"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"))
  }

  /** Okapi BM25 retrieval: score every document against the fixed bag of
    * `queryTerms`, return the top-`k` (score desc, id asc).
    *
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)); per-term contribution
    * idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)). Contributions are
    * rounded to 6 decimals, the 3-term sum to 5 — the double-rounding that
    * makes a cross-engine FP sum order-proof.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val t = terms(docs, idCol, textCol)
    val dl = t.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val tf = t.where(col("term").isin(queryTerms: _*))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = tf.join(df, "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("c", round(
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6))
    contrib.groupBy(idCol)
      .agg(round(sum(col("c")), 5).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Word-bigram LM negative log-likelihood per document — the shape of a
    * perplexity quality filter: train add-k-smoothed bigram counts on the
    * corpus itself, score each document by the mean −ln P(w₂|w₁) of its
    * bigrams. P(w₂|w₁) = (c(w₁w₂) + α)/(c(w₁) + α·V).
    *
    * At web scale the bigram table is the one large intermediate; it joins
    * back to the exploded corpus on the bigram key (hash shuffle, or
    * broadcast when it fits — AQE decides). Returns
    * (idCol, n_bigrams, avg_nll) for every doc with ≥ 1 bigram.
    */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                alpha: Double = 0.5): DataFrame = {
    val toks = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
    // Spark array subscripts are 0-based: bigram i joins token i-1 and i.
    // The size()>=2 pre-filter matters: Spark's sequence(1, 0) is the
    // DESCENDING [1, 0], not empty, so single-token docs would otherwise
    // fabricate null bigrams.
    val bg = toks.where(size(col("_toks")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(_toks) - 1), i -> " +
          "struct(_toks[i - 1] as w1, concat(_toks[i - 1], ' ', _toks[i]) as big))"))
        .as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.big").as("big"))
    // the bigram-count table is the trained LM — materialize it once
    // (distinct-bigram scale, vastly smaller than the exploded corpus; the
    // eager cut is what actually stops Catalyst re-deriving it per
    // consumer, since plain DataFrame reuse duplicates the subtree and
    // runtime exchange reuse does not collapse it — verified in the final
    // adaptive plan)
    val c2 = bg.groupBy("big").agg(count(lit(1)).as("c2")).localCheckpoint()
    // the context counts and vocabulary are DERIVED from the bigram-count
    // table (c1(w1) = Σ c2 over bigrams starting with w1 — w1 is the
    // bigram's first space-delimited token; V = |c1|) instead of two more
    // full-width passes + shuffles over the tokenize/explode subtree
    // (guide §1.2: remove unnecessary passes over the data)
    val c1 = c2.groupBy(substring_index(col("big"), " ", 1).as("w1"))
      .agg(sum("c2").as("c1"))
    val v = c1.agg(count(lit(1)).as("v"))
    bg.join(c2, "big").join(c1, "w1")
      .crossJoin(broadcast(v))
      .withColumn("nll",
        -log((col("c2") + lit(alpha)) / (col("c1") + lit(alpha) * col("v"))))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), round(avg("nll"), 6).as("avg_nll"))
  }
}
