package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Ops

/** Corpus-curation operators a training-data pipeline runs after dedup and
  * quality filtering (SURVEY.md §2.9 extension surface): deterministic
  * splits, stratified sampling, token-budget packing, vocabulary stats.
  *
  * Every operator is a pure function of row ids via the md5-prefix hash
  * ([[TextOps.hash60]]) — the one hash family Spark and DuckDB share
  * bit-for-bit — so assignments are reproducible across engines, retries,
  * and cluster sizes, and every query key stays oracle-checkable. Nothing
  * here shuffles more than (key, id)-width rows or collects more than
  * metadata-scale summaries.
  */
object Curation {

  /** Deterministic percentage-band split: `md5prefix64(id) % 100` lands in
    * a band (e.g. train [0,80), val [80,90), test [90,100)). Row-stable
    * (pure function of the id — adding or removing other rows never moves
    * an assignment), skew-free, and portable: the same expression yields
    * the same split in any md5-capable engine. `bands` are (name,
    * upperBoundExclusive) pairs in ascending order; the last band absorbs
    * the remainder.
    */
  def hashSplit(df: DataFrame, idCol: String, bands: Seq[(String, Int)]): DataFrame = {
    val ubs = bands.map(_._2)
    require(bands.nonEmpty && ubs.zip(ubs.tail).forall { case (a, b) => a < b } &&
      ubs.head > 0 && ubs.last <= 100,
      "bands must be STRICTLY ascending (name, upperBoundExclusive) pairs in (0, 100]" +
        s" — a duplicate or out-of-range bound makes a band silently empty: $bands")
    val bucket = TextOps.hash60(col(idCol).cast("string")) % 100
    val split = bands.init.foldRight(lit(bands.last._1): Column) {
      case ((name, ub), rest) => when(bucket < ub, name).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Deterministic per-stratum downsampling: a row survives iff
    * `md5prefix64(id) % 1000 < permille(stratum)`. The per-stratum rates
    * rebalance a skewed corpus (e.g. cap the dominant language) without a
    * shuffle — selection is a pure row-local predicate, and expected kept
    * counts are rate × stratum size. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       permille: Map[String, Int], defaultPermille: Int): DataFrame = {
    val bucket = TextOps.hash60(col(idCol).cast("string")) % 1000
    val rate = permille.foldLeft(lit(defaultPermille): Column) {
      case (rest, (stratum, p)) => when(col(strataCol) === stratum, p).otherwise(rest)
    }
    df.where(bucket < rate)
  }

  /** Token-budget packing: docs in `orderCol` order are laid head-to-tail
    * by whitespace-token count and binned by STARTING offset —
    * `bin = (runningTotal − tokens) div budget` — so bin boundaries are a
    * pure function of the global running total (documents stay whole; a
    * doc that straddles a boundary belongs to the bin it starts in, which
    * may overrun the budget by at most one document — the standard
    * streaming-concatenation chunking used to fill fixed-length training
    * sequences). The running total is [[Ops.bucketedRunningTotal]] — NO
    * single-partition window at data scale. */
  def packByTokenBudget(df: DataFrame, textCol: String, orderCol: String,
                        budget: Long): DataFrame = {
    val toks = df.select(col(orderCol),
      size(TextOps.tokens(col(textCol))).cast("long").as("_toks"))
    Ops.bucketedRunningTotal(toks, col(orderCol), col("_toks"),
        bucketSize = 1000L, totalName = "_cum")
      // integer `div`, not floor-of-double-divide: the running total at
      // corpus scale exceeds 2^53, where double arithmetic misassigns bins
      .withColumn("bin", expr(s"(_cum - _toks) div $budget"))
  }

  /** Token-window document chunking — the step that turns curated documents
    * into model-ready sequences. Each document becomes `1 + ceil(max(L -
    * chunkTokens, 0) / stride)` chunks (`stride = chunkTokens - overlap`);
    * chunk `i` covers normalized tokens `[i*stride, i*stride + chunkTokens)`,
    * so consecutive chunks share `overlap` tokens and every token lands in
    * at least one chunk (coverage + overlap are spec-gated). Output rows:
    * `(idCol, chunk_idx, chunk_id, n_tokens, chunk_text)` with the stable id
    * `"<doc>#<idx>"` — re-running over a grown corpus never renames an
    * existing chunk.
    *
    * Scale shape: one narrow projection per row (`transform`/`slice`) plus a
    * `Generate` — zero shuffles, zero state; output size is bounded by
    * `chunkTokens / stride ×` the corpus, chosen by the caller. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): got $overlap vs $chunkTokens")
    val stride = chunkTokens - overlap
    df.withColumn("_toks", TextOps.tokens(col(textCol)))
      .withColumn("_nc",
        expr(s"1 + greatest(0, (size(_toks) - $chunkTokens + $stride - 1) div $stride)"))
      .select(col(idCol),
        explode(expr("sequence(0, _nc - 1)")).as("_ci"),
        col("_toks"))
      .select(col(idCol),
        col("_ci").cast("long").as("chunk_idx"),
        concat(col(idCol).cast("string"), lit("#"),
          col("_ci").cast("string")).as("chunk_id"),
        expr(s"size(slice(_toks, _ci * $stride + 1, $chunkTokens))")
          .cast("long").as("n_tokens"),
        expr(s"array_join(slice(_toks, _ci * $stride + 1, $chunkTokens), ' ')")
          .as("chunk_text"))
  }

  /** Exact corpus-wide top-k terms by raw occurrence count (every token
    * counts, however the occurrences distribute over documents).
    * Tokens partially aggregate BEFORE the shuffle (map-side combine over
    * each partition's vocabulary — shuffle volume is distinct-terms, not
    * total-tokens) and the top-k is `TakeOrderedAndProject`, never a
    * global sort. */
  def freqTerms(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("term"))
      .limit(k)

  /** Bounded-memory approximate top-k terms — the 100 TB sibling of
    * [[freqTerms]]: at web-corpus scale the distinct vocabulary itself is
    * huge, so even a map-side-combined exact top-k shuffles billions of
    * (term, count) rows. Implemented on the NATIVE Misra–Gries aggregate
    * ([[graft.functions.MisraGriesAgg]], SQL `misra_gries`): Spark runs it
    * with map-side partial aggregation and the shuffle carries one
    * ≤`capacity`-entry SERIALIZED SKETCH per map task — independent of
    * vocabulary size, and composable with `groupBy` keys (per-source heavy
    * hitters in the same pass). Counts are lower bounds; a true heavy
    * hitter (frequency > totalTokens / capacity) always surfaces, and
    * `capacity` ≥ the vocabulary degrades to exact — both spec-gated. */
  def approxFreqTerms(df: DataFrame, textCol: String, k: Int,
                      capacity: Int = 4096): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(explode(TextOps.tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .agg(call_function("misra_gries", col("term"), lit(capacity)).as("_sk"))
      .select(explode(col("_sk")).as("_e"))
      .select(col("_e.term").as("term"), col("_e.cnt_lb").as("cnt_est"))
      .orderBy(desc("cnt_est"), col("term"))
      .limit(k)
  }

  /** Data-mixture reweighting: per-source sampling weights that reshape
    * the corpus's ACTUAL token share toward a TARGET share — the mixture
    * step of LLM pre-training (upweight curated sources, downweight
    * crawl). `weight = targetShare / actualTokenShare`, so the expected
    * token mass of a source after weight-proportional sampling is exactly
    * its target share (`weight · tokens = target · totalTokens`).
    *
    * Returns `(srcCol, n_docs, tokens, token_share, target_share,
    * weight)`. Sources missing from `targets` get weight 0 (excluded from
    * the mixture — make the exclusion explicit, never silent).
    *
    * Scale: ONE groupBy shuffle carrying (source, count, token-sum); the
    * share normalization is a window over the AGGREGATED frame —
    * |sources| rows, thousands at most, metadata-scale by construction.
    */
  def mixWeights(df: DataFrame, textCol: String, srcCol: String,
                 targets: Map[String, Double]): DataFrame = {
    val per = df
      .select(col(srcCol), size(TextOps.tokens(col(textCol))).cast("long").as("_t"))
      .groupBy(srcCol)
      .agg(count(lit(1)).as("n_docs"), sum("_t").as("tokens"))
    val tgt = targets.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (k, v)) => when(col(srcCol) === k, lit(v)).otherwise(acc)
    }
    per
      .withColumn("token_share", col("tokens") /
        sum(col("tokens")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("target_share", tgt)
      .withColumn("weight", col("target_share") / col("token_share"))
  }
}
