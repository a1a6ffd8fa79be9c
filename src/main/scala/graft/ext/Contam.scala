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

  /** Distinct word `n`-grams of a normalized text column. */
  private def docGrams(df: DataFrame, textCol: String, idCol: String,
                       n: Int): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("_t"))
      .select(col(idCol),
        array_distinct(TextOps.wordNgrams("_t", n)).as("_gs"))

  /** Per-document contamination against a benchmark set: the fraction of
    * the doc's distinct word n-grams that appear anywhere in the benchmark.
    * Documents with fewer than n tokens (no grams) are dropped — they can
    * never collide. Returns (idCol, n_grams, n_hit, contam ∈ [0,1]). */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame,
                   textCol: String, idCol: String, n: Int): DataFrame = {
    val bg = docGrams(bench, textCol, idCol, n)
      .select(explode(col("_gs")).as("_g")).distinct()
      .withColumn("_hit", lit(1))
    docGrams(corpus, textCol, idCol, n)
      .where(size(col("_gs")) > 0)
      .select(col(idCol), explode(col("_gs")).as("_g"))
      .join(broadcast(bg), Seq("_g"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0))).as("n_hit"))
      .withColumn("contam",
        round(col("n_hit") / col("n_grams").cast("double"), 4))
  }
}
