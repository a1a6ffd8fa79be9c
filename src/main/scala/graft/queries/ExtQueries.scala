package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Contam, Curation, CuratePipeline, Dedup, Similarity, TextOps}
import Q._

/** LLM-training-data pipeline operators (SURVEY.md §2.9) as declared,
  * oracle-checked queries over `/root/testdata` `documents` / `embeddings` /
  * `events`.
  *
  * The test corpus has no natural duplicates, so the dedup queries plant
  * deterministic ones (exact copies / lightly-perturbed copies / copied
  * vectors under shifted ids) with constructions that are expressible in
  * both engines — the oracle then checks the full pipeline: corpus
  * synthesis → candidate generation → verification.
  *
  * Hashing is md5-hex-prefix based throughout (`TextOps.hash60`) — the one
  * hash family Spark and DuckDB share bit-for-bit.
  */
object ExtQueries {

  private def docs(s: SparkSession, d: String) = tbl(s, d, "documents")
  private def embs(s: SparkSession, d: String) = tbl(s, d, "embeddings")
  /** Type-adaptive events read — see [[Q.events]] for the encoding story. */
  private[queries] def eventsWithTs(s: SparkSession, d: String): DataFrame =
    Q.events(s, d)
  private def evts(s: SparkSession, d: String): DataFrame = eventsWithTs(s, d)

  /** Stage micro-batch feed FILES for a file-source stream: each frame is
    * written as ONE parquet file (a distributed write job — nothing is
    * ever materialized on the driver) into a fresh directory, with
    * strictly increasing names and modification times. A
    * `readStream.parquet(dir)` with `maxFilesPerTrigger=1` then replays
    * exactly these micro-batches in order — the production shape (a file
    * drop-box / object-store prefix), replacing the old MemoryStream
    * feeds whose driver-side collects were flagged as the one
    * non-distributed step in the declared streaming keys. */
  /** Feed directories staged ONCE per JVM per (key, corpus): a drop-box
    * exists once in production — rebuilding it on every query run charged
    * each bench invocation the staging write jobs AND the splitting
    * aggregations. The thunk (quantile split + writes) only runs on the
    * first request; the corpus file's mtime keys invalidation when the
    * driver regenerates /root/testdata between rounds. */
  private val feedCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def stagedFeed(key: String, d: String)(batches: => Seq[DataFrame]): String = {
    val mtime = try java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(d, "events.parquet")).toMillis catch { case _: Exception => 0L }
    feedCache.computeIfAbsent(s"$key:$d:$mtime", _ => stageBatchFiles(batches))
  }

  private def stageBatchFiles(batches: Seq[DataFrame]): String = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    def ls(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq finally s.close()
    }
    val dir = Files.createTempDirectory("graft-stream-feed")
    batches.zipWithIndex.foreach { case (df, i) =>
      val staging = Files.createTempDirectory("graft-stream-stage")
      df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = ls(staging)
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val tgt = dir.resolve(f"batch-$i%03d.parquet")
      Files.move(part, tgt)
      Files.setLastModifiedTime(tgt, java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L + i * 60000L))
      ls(staging).foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(staging)
    }
    dir.toString
  }

  /** Run `body` (which starts and fully drains a streaming query) under a
    * reduced `spark.sql.shuffle.partitions`, restoring the session setting
    * after — streaming state partitions are fixed at query start, and at
    * bench volumes per-partition state-store overhead dominates. */
  private def withStreamShuffle[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** Recall-contract row for ANN keys: `(exact_id_sum, exact_cos_sum_e4,
    * recall_floor_met)`. The exact top-k's id-sum and 1e-4-scaled
    * cosine-sum are recomputed brute-force by the DuckDB oracle (so the
    * denominator of the recall claim is itself oracle-checked); the flag
    * asserts the approximate answer found ≥ `floorHits` of the exact
    * top-k. */
  private def recallRow(approx: DataFrame, exact: DataFrame,
                        floorHits: Int): DataFrame = {
    val a = approx.select(col("vec_id").as("a_id"))
    exact.join(a, col("vec_id") === col("a_id"), "left")
      .agg(sum("vec_id").as("exact_id_sum"),
        sum(round(col("cos") * 10000).cast("long")).as("exact_cos_sum_e4"),
        (count(col("a_id")) >= floorHits).as("recall_floor_met"))
  }

  /** documents ∪ exact copies of every 10th doc under shifted ids. */
  private def dupCorpus(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    base.unionByName(base.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }

  /** documents ∪ lightly-perturbed copies of every 20th doc. */
  private def nearDupCorpus(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    base.unionByName(base.where(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zz qq xx")).as("text")))
  }

  /** embeddings ∪ exact copies of every 50th vector. */
  private def vecCorpus(s: SparkSession, d: String): DataFrame = {
    val base = embs(s, d).select(col("vec_id"), col("embedding"))
    base.unionByName(base.where(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
  }

  private def queryVec(s: SparkSession, d: String): Seq[Double] =
    embs(s, d).where(col("vec_id") === 0).head()
      .getSeq[Float](1).map(_.toDouble)

  /** IVF index built ONCE per sf dir and reused by every query invocation
    * (build-once/query-many — the round-2 per-query centroid rebuild is
    * gone; a spec pins that the query path scans only index files). The
    * cache key includes the source parquet's mtime, so regenerating the
    * dataset in-process invalidates the index instead of silently serving
    * stale cells; index temp dirs are removed on JVM exit. */
  private val ivfIndexes = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfIndex(s: SparkSession, d: String): String = {
    val src = java.nio.file.Paths.get(d, "embeddings.parquet")
    val stamp =
      if (java.nio.file.Files.exists(src))
        java.nio.file.Files.getLastModifiedTime(src).toMillis
      else 0L
    ivfIndexes.computeIfAbsent(s"$d@$stamp", _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-ivf")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        if (java.nio.file.Files.exists(dir))
          java.nio.file.Files.walk(dir)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))))
      Similarity.buildIvfIndex(embs(s, d), "embedding", "vec_id",
        nCentroids = 16, indexDir = dir.toString)
      dir.toString
    })
  }

  /** PQ index built once per sf dir (same lifecycle discipline and mtime
    * invalidation as [[ivfIndex]]). */
  private val pqIndexes = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def pqIndex(s: SparkSession, d: String): String = {
    val src = java.nio.file.Paths.get(d, "embeddings.parquet")
    val stamp =
      if (java.nio.file.Files.exists(src))
        java.nio.file.Files.getLastModifiedTime(src).toMillis
      else 0L
    pqIndexes.computeIfAbsent(s"$d@$stamp", _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-pq")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        if (java.nio.file.Files.exists(dir))
          java.nio.file.Files.walk(dir)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))))
      Similarity.buildPqIndex(embs(s, d), "embedding", "vec_id",
        dim = 64, nSub = 8, nCode = 16, indexDir = dir.toString)
      dir.toString
    })
  }

  /** IVF-PQ composed index built once per sf dir (same lifecycle discipline
    * and mtime invalidation as [[ivfIndex]]). */
  private val ivfPqIndexes = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ivfPqIndex(s: SparkSession, d: String): String = {
    val src = java.nio.file.Paths.get(d, "embeddings.parquet")
    val stamp =
      if (java.nio.file.Files.exists(src))
        java.nio.file.Files.getLastModifiedTime(src).toMillis
      else 0L
    ivfPqIndexes.computeIfAbsent(s"$d@$stamp", _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        if (java.nio.file.Files.exists(dir))
          java.nio.file.Files.walk(dir)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))))
      Similarity.buildIvfPqIndex(embs(s, d), "embedding", "vec_id",
        nCentroids = 16, dim = 64, nSub = 8, nCode = 16, indexDir = dir.toString)
      dir.toString
    })
  }

  private def probeNorm(s: SparkSession, d: String): String =
    docs(s, d).where(col("doc_id") === 0).head().getString(1)
      .toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  val queries: Map[String, QueryFn] = Map(
    // ---- dedup family --------------------------------------------------
    "dedup_exact" -> ((s, d) => {
      Dedup.exact(dupCorpus(s, d), "text", "doc_id")
        .agg(count(lit(1)).as("survivors"),
          sum(col("doc_id")).as("id_checksum"),
          sum(when(col("group_size") > 1, 1L).otherwise(0L)).as("dup_groups"))
    }),

    // continuous-ingest dedup: batch 2 (ids 40..79) dedups against the
    // persisted fingerprint store seeded by batch 1 (ids < 50) — the 10
    // overlapping docs drop via the store anti-join, 30 novel survive.
    // The store is a fresh graft table per invocation (re-runnable).
    "dedup_incremental" -> ((s, d) => {
      val store = new graft.table.GraftTableGenerator(s,
        java.nio.file.Files.createTempDirectory("inc-dedup").toString, "fp_store")
      store.create(graft.schema.GraftSchema.of(
        "fp" -> org.apache.spark.sql.types.LongType), Nil)
      val base = docs(s, d).select(col("doc_id"), col("text"))
      Dedup.incrementalExact(
        base.where(col("doc_id") < 50), "text", "doc_id", store)
      Dedup.incrementalExact(
        base.where(col("doc_id") >= 40 && col("doc_id") < 80), "text", "doc_id", store)
        .agg(count(lit(1)).as("cnt"),
          sum(col("doc_id")).cast("long").as("id_sum"))
    }),

    "dedup_minhash" -> ((s, d) => {
      Dedup.minhashPairs(nearDupCorpus(s, d), "text", "doc_id")
        .orderBy("id_a", "id_b")
    }),

    // chunk-granular exact-substring dedup: duplicated docs (the +1e6
    // copies) must keep ZERO chunks; originals keep all of theirs except
    // chunks repeated verbatim inside/across docs
    "dedup_passage" -> ((s, d) => {
      Dedup.passages(dupCorpus(s, d), "text", "doc_id", 8)
        .orderBy("doc_id")
    }),

    // pairs → clusters: 3 rounds of min-label propagation, exactly the
    // algorithm the oracle mirrors in chained CTEs
    "dedup_minhash_cluster" -> ((s, d) => {
      val corpus = nearDupCorpus(s, d)
      val pairs = Dedup.minhashPairs(corpus, "text", "doc_id")
      Dedup.clusterLabels(corpus.select("doc_id"), pairs, "doc_id", iters = 3)
        .agg(count_distinct(col("lbl")).as("n_clusters"),
          sum(when(col("lbl") =!= col("id"), 1L).otherwise(0L)).as("n_merged"),
          sum(when(col("lbl") === col("id"), col("id")).otherwise(0L))
            .as("survivor_checksum"))
    }),

    // the deduped corpus: keep the min-id survivor of every cluster; the
    // oracle fingerprints every surviving normalized text
    "dedup_survivors" -> ((s, d) => {
      val corpus = nearDupCorpus(s, d)
      val pairs = Dedup.minhashPairs(corpus, "text", "doc_id")
      val labels = Dedup.clusterLabels(corpus.select("doc_id"), pairs, "doc_id", 3)
      corpus.join(labels, corpus("doc_id") === labels("id"))
        .where(col("lbl") === col("id"))
        .agg(count(lit(1)).as("n_survivors"),
          sum(TextOps.hash60(TextOps.norm(col("text"))) % 1000003L).as("text_fp"))
    }),

    "dedup_simhash" -> ((s, d) => {
      Dedup.simhashBuckets(nearDupCorpus(s, d), "text", "doc_id")
        .orderBy("bucket_size")
    }),

    "dedup_ngram_jaccard" -> ((s, d) => {
      Dedup.ngramJaccardVsProbe(docs(s, d), "text", "doc_id", probeNorm(s, d), 4)
        .orderBy(desc("jaccard"), col("doc_id")).limit(10)
    }),

    "dedup_embed_cosine" -> ((s, d) => {
      Similarity.embedDupPairs(vecCorpus(s, d), "embedding", "vec_id",
        bits = 8, minCos = 0.999)
        .orderBy("id_a", "id_b")
    }),

    // SemDeDup-shaped semantic dedup: hash-sampled centroids, max-cosine
    // cell assignment, pairs verified within cells only — row-level
    // oracled (the DuckDB side recomputes centroids, assignment argmax,
    // and every surviving pair's cosine)
    "dedup_semantic" -> ((s, d) => {
      Similarity.semanticDupPairs(vecCorpus(s, d), "embedding", "vec_id",
        centroidSrc = embs(s, d), nCells = 64, minCos = 0.999)
        .orderBy("id_a", "id_b")
    }),

    // ---- similarity search --------------------------------------------
    "sim_topk_cosine" -> ((s, d) => {
      Similarity.topKCosine(embs(s, d), "embedding", "vec_id",
        queryVec(s, d), 10)
    }),

    // batch shape: 8 hash-sampled queries answered by ONE corpus scan,
    // two-level rank per query; row-level oracle (every (query, hit, cos))
    "sim_topk_batch" -> ((s, d) => {
      Similarity.topKCosineBatch(embs(s, d), "embedding", "vec_id",
        querySrc = embs(s, d), nQueries = 8, k = 10)
        .orderBy(col("q_id"), desc("cos"), col("vec_id"))
    }),

    // IVF scale path against the PERSISTED index (built once per sf dir) at
    // a realistic probe count. Approximate hit-lists are config-dependent,
    // so the ORACLE IS A RECALL CONTRACT: the row carries the exact top-10
    // (id-sum + 1e-4-scaled cosine-sum, which DuckDB recomputes brute-force)
    // plus a recall@10 ≥ 0.7 flag for the IVF answer (DuckDB asserts
    // `true`). An index regression dropping recall below the floor turns
    // the flag false → hash mismatch → red row. Exactness of the full
    // pipeline is separately oracled by the `_full` sibling (nProbe=all).
    "sim_topk_cosine_ivf" -> ((s, d) =>
      recallRow(
        Similarity.queryIvf(s, ivfIndex(s, d), "vec_id",
          queryVec(s, d), 10, nProbe = 8),
        Similarity.topKCosine(embs(s, d), "embedding", "vec_id",
          queryVec(s, d), 10),
        floorHits = 7)),

    // probe=all configuration: every cell is scanned, so the result is
    // exact and shares the brute-force oracle — proves the whole IVF
    // pipeline (centroid sample, broadcast assignment, persisted cell
    // partitioning) under the DuckDB hash-compare, not just rows-only.
    "sim_topk_cosine_ivf_full" -> ((s, d) => {
      Similarity.queryIvf(s, ivfIndex(s, d), "vec_id",
        queryVec(s, d), 10, nProbe = 16)
    }),

    // PQ ADC + exact re-rank against the persisted codes index; shortlist
    // spans the corpus here, so the result is exact and shares the
    // brute-force oracle (the ivf_full pattern) — realistic-shortlist
    // recall is spec-tested at sf0.001
    "sim_topk_pq_rerank" -> ((s, d) => {
      Similarity.queryPqRerank(embs(s, d), "embedding", "vec_id",
        pqIndex(s, d), queryVec(s, d), 10, shortlist = Int.MaxValue)
    }),

    // composed IVF-PQ (cell-partition pruning × code compression — the
    // FAISS IVFPQ shape) at realistic probes/shortlist: same recall
    // contract as sim_topk_cosine_ivf; exactness under the exact config is
    // the _full sibling + spec
    "sim_topk_ivfpq" -> ((s, d) =>
      recallRow(
        Similarity.queryIvfPq(embs(s, d), "embedding", "vec_id",
          ivfPqIndex(s, d), queryVec(s, d), 10, nProbe = 8, shortlist = 100),
        Similarity.topKCosine(embs(s, d), "embedding", "vec_id",
          queryVec(s, d), 10),
        floorHits = 7)),

    // every cell probed + corpus-wide shortlist ⇒ exact, brute-force
    // oracle — proves the composed pipeline (coarse assignment, trained
    // codebook, cell-partitioned codes, ADC, re-rank join) under the
    // DuckDB hash-compare
    "sim_topk_ivfpq_full" -> ((s, d) => {
      Similarity.queryIvfPq(embs(s, d), "embedding", "vec_id",
        ivfPqIndex(s, d), queryVec(s, d), 10, nProbe = 16,
        shortlist = Int.MaxValue)
    }),

    // PII redaction: every 10th doc gets a planted email + phone appended;
    // the scrub replaces both and the ORACLE CHECKS THE FULL REDACTED TEXT
    // via a per-doc hash fingerprint, not just match counts
    "pii_redact" -> ((s, d) => {
      val corpus = docs(s, d).select(col("doc_id"), col("lang"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact u"), col("doc_id"),
            lit("@example.com call +88005553535")))
          .otherwise(col("text")).as("t"))
      corpus
        // Column-API lit patterns: Spark SQL string literals would eat the
        // backslash escapes that the redaction itself uses
        .withColumn("emails",
          size(regexp_extract_all(col("t"), lit(TextOps.EmailRe), lit(0))).cast("long"))
        .withColumn("phones",
          size(regexp_extract_all(col("t"), lit(TextOps.PhoneRe), lit(0))).cast("long"))
        .withColumn("red", TextOps.redactPii(col("t")))
        .groupBy("lang")
        .agg(sum("emails").as("emails_found"), sum("phones").as("phones_found"),
          sum(TextOps.hash60(col("red")) % 1000003L).as("redacted_fp"))
        .orderBy("lang")
    }),

    // int8 embedding quantization: per-vector scale factors + code stats —
    // the full transform is checked (sum/extremes of every code vector)
    "embed_quantize_int8" -> ((s, d) => {
      Similarity.quantizeInt8(embs(s, d), "embedding", "vec_id")
        .select(col("vec_id"),
          round(col("_mn"), 4).as("vmin"), round(col("_mx"), 4).as("vmax"),
          expr("cast(aggregate(codes, 0L, (a, c) -> a + c) as bigint)").as("q_sum"),
          expr("array_min(codes)").as("q_min"), expr("array_max(codes)").as("q_max"))
        .orderBy("vec_id")
    }),

    // product quantization: 64-dim float → 8 codes from 16-codeword
    // hash-sampled codebooks — the FULL code assignment is oracle-checked
    // (argmin over broadcast codebooks, ties to the smallest code)
    "embed_pq" -> ((s, d) => {
      // codes projected as a '-'-joined string: the driver compare loads
      // both sides into pandas, which cannot hash a raw array<int> column
      Similarity.pqEncode(embs(s, d), "embedding", "vec_id",
          dim = 64, nSub = 8, nCode = 16)
        .select(col("vec_id"), array_join(col("codes"), "-").as("codes_str"))
        .orderBy("vec_id")
    }),

    // ---- text analysis -------------------------------------------------
    // benchmark decontamination: docs 0,50,100,… are the "benchmark"; the
    // rest of the corpus is scored by word-3-gram overlap against it —
    // top collisions surface for removal
    "contam_ngram" -> ((s, d) => {
      val all = docs(s, d)
      Contam.ngramOverlap(
          all.where(col("doc_id") % 50 =!= 0),
          all.where(col("doc_id") % 50 === 0),
          "text", "doc_id", n = 3)
        .orderBy(desc("contam"), col("doc_id")).limit(10)
    }),

    // Gopher-style repetition/boilerplate signals, rolled up per lang:
    // duplicate-token share and the frequency share of the top bigram —
    // pure per-row array expressions, no shuffle before the rollup
    "repetition_stats" -> ((s, d) => {
      docs(s, d)
        .withColumn("_t", TextOps.tokens(col("text")))
        .withColumn("_bg", TextOps.wordNgrams("_t", 2))
        .select(col("lang"), TextOps.dupTokenRatio("_t").as("dup"),
          TextOps.topNgramShare("_bg").as("topbg"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("dup"), 4).as("avg_dup_ratio"),
          round(avg("topbg"), 4).as("avg_top_bigram"))
        .orderBy("lang")
    }),

    "lang_id" -> ((s, d) => {
      docs(s, d)
        .withColumn("_toks", TextOps.tokens(col("text")))
        .select(col("lang"), TextOps.langId(col("text"), "_toks").as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "predicted")
    }),

    "text_quality_score" -> ((s, d) => {
      val df = docs(s, d).withColumn("_toks", TextOps.tokens(col("text")))
      val (nTok, punctRatio, stopRatio, meanLen) =
        TextOps.qualityParts(col("text"), "_toks")
      df.select(col("lang"), nTok.as("n_tok"), punctRatio.as("pr"),
          stopRatio.as("sr"), meanLen.as("ml"),
          TextOps.qualityScore(col("text"), "_toks").as("q"))
        .groupBy("lang")
        .agg(round(avg("n_tok"), 4).as("avg_tokens"),
          round(avg("pr"), 4).as("avg_punct_ratio"),
          round(avg("sr"), 4).as("avg_stop_ratio"),
          round(avg("ml"), 4).as("avg_word_len"),
          round(avg("q"), 4).as("avg_quality"))
        .orderBy("lang")
    }),

    "token_count" -> ((s, d) => {
      docs(s, d)
        .select(col("lang"), size(TextOps.tokens(col("text"))).cast("long").as("ws"),
          TextOps.bpeishCount(col("text")).cast("long").as("bpe"))
        .groupBy("lang")
        .agg(sum("ws").as("ws_tokens"), sum("bpe").as("bpeish_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")
    }),

    // ---- corpus curation (split / sample / pack / vocab) ---------------
    "split_train_test" -> ((s, d) => {
      Curation.hashSplit(docs(s, d), "doc_id",
          Seq(("train", 80), ("val", 90), ("test", 100)))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_checksum"))
        .orderBy("split")
    }),

    "sample_stratified" -> ((s, d) => {
      Curation.stratifiedSample(docs(s, d), "doc_id", "lang",
          Map("en" -> 100), defaultPermille = 500)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_checksum"))
        .orderBy("lang")
    }),

    "pack_token_budget" -> ((s, d) => {
      Curation.packByTokenBudget(docs(s, d), "text", "doc_id", budget = 2000L)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("_toks").as("bin_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("bin")
    }),

    // the composed flagship: quality gate → exact dedup → LSH near-dup
    // collapse → decontamination vs the held-out eval set → chunking →
    // split, over a corpus with planted junk / exact copies / near copies.
    // The oracle mirrors all six stages in one chained-CTE SQL.
    "curate_corpus" -> ((s, d) => {
      val base = docs(s, d).where(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), col("text"))
      val corpus = base
        .unionByName(base.where(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .unionByName(base.where(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" zz qq xx")).as("text")))
        .unionByName(base.where(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            substring(col("text"), 1, 20).as("text")))
      val bench = docs(s, d).where(col("doc_id") % 50 === 0)
        .select(col("doc_id"), col("text"))
      CuratePipeline.curate(corpus, bench, "doc_id", "text")
        .groupBy("split")
        .agg(count(lit(1)).as("n_chunks"),
          count_distinct(col("doc_id")).as("n_docs"),
          sum("n_tokens").as("tokens"),
          sum(TextOps.hash60(col("chunk_text")) % 1000003L).as("chunk_fp"))
        .orderBy("split")
    }),

    // token-window chunking: every doc → overlapping 32-token windows at
    // stride 24 (8-token overlap), stable "<doc>#<idx>" chunk ids —
    // row-level oracled (idx, id, token count, and the chunk text itself)
    "doc_chunk" -> ((s, d) => {
      Curation.chunkByTokens(docs(s, d), "doc_id", "text",
          chunkTokens = 32, overlap = 8)
        .orderBy("doc_id", "chunk_idx")
    }),

    "freq_terms" -> ((s, d) => {
      Curation.freqTerms(docs(s, d), "text", 20)
    }),

    // per-source heavy hitters through the NATIVE misra_gries aggregate
    // composing with groupBy (slack capacity ⇒ exact, hence oracled):
    // top-3 terms per source, deterministic ties (count desc, term)
    "freq_terms_by_source" -> ((s, d) => {
      val terms = docs(s, d).select(col("source"),
          explode(TextOps.tokens(col("text"))).as("term"))
        .where(col("term") =!= "")
      val sk = terms.groupBy("source")
        .agg(call_function("misra_gries", col("term"), lit(1 << 17)).as("sk"))
        .select(col("source"), explode(col("sk")).as("e"))
        .select(col("source"), col("e.term").as("term"), col("e.cnt_lb").as("cnt"))
      val w = Window.partitionBy("source").orderBy(desc("cnt"), col("term"))
      sk.withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
        .select("source", "term", "cnt").orderBy("source", "term")
    }),

    // mixture reweighting: src0..src4 target 10% of tokens each, the
    // other 15 sources split the remaining half — weight·tokens lands
    // every source exactly on its target share
    "mix_weights" -> ((s, d) => {
      val targets = ((0 until 5).map(i => s"src$i" -> 0.1) ++
        (5 until 20).map(i => s"src$i" -> 0.5 / 15)).toMap
      Curation.mixWeights(docs(s, d), "text", "source", targets)
        .select(col("source"), col("n_docs"), col("tokens"),
          round(col("token_share"), 6).as("token_share"),
          round(col("target_share"), 6).as("target_share"),
          round(col("weight"), 6).as("weight"))
        .orderBy("source")
    }),

    // bounded-memory heavy hitters via the native Misra-Gries aggregate.
    // ORACLE = exact-at-capacity contract: MG with capacity ≥ |vocab|
    // never decrements, so its lower bounds ARE the exact counts and
    // DuckDB's exact top-20 is a legal oracle (the corpus vocabulary is
    // ~31 terms ≪ 4096). Under-capacity lower-bound behavior stays
    // spec-gated in ExtSpec.
    "sketch_freq_terms" -> ((s, d) => {
      Curation.approxFreqTerms(docs(s, d), "text", 20)
    }),

    "doc_fingerprint" -> ((s, d) => {
      docs(s, d)
        .withColumn("_toks", TextOps.tokens(col("text")))
        .select(col("lang"), TextOps.fingerprint("_toks").as("fp"))
        .groupBy("lang")
        .agg(countDistinct("fp").as("distinct_fps"), count(lit(1)).as("n_docs"))
        .orderBy("lang")
    }),

    "text_stats" -> ((s, d) => {
      docs(s, d)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
          round(avg("n_chars"), 4).as("avg_chars"))
        .orderBy("lang", "source")
    }),

    // ---- events: tumbling windows + sessionization ---------------------
    "events_window" -> ((s, d) => {
      evts(s, d)
        .groupBy(window(col("_ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("value_cents"))
        .select(col("w.start").as("hour_start"), col("event_type"),
          col("cnt"), col("value_cents"))
        .orderBy("hour_start", "event_type")
    }),

    // gap-based sessions via the native session_window operator — must
    // agree with the lag+running-sum formulation (same oracle shape)
    "events_session_window" -> ((s, d) => {
      evts(s, d)
        .groupBy(col("user_id"), session_window(col("_ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
        .orderBy("user_id")
    }),

    "events_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("_ts")
      evts(s, d)
        .withColumn("_prev", lag(col("_ts"), 1).over(byUser))
        .withColumn("_new_sess",
          when(col("_prev").isNull ||
            unix_timestamp(col("_ts")) - unix_timestamp(col("_prev")) > 1800, 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(sum("_new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // ---- streaming operators, driven to completion under the oracle ----
    // These run the ACTUAL Structured Streaming operators (bounded-state
    // dropDuplicatesWithinWatermark / stream-stream interval join) over a
    // FILE-SOURCE stream of the events table — per-micro-batch parquet
    // files staged by a distributed write ([[stageBatchFiles]]), replayed
    // via maxFilesPerTrigger=1 — and hand the drained sink to the driver's
    // DuckDB compare, so the streaming semantics themselves get a
    // correctness row, not just a spec. Batch boundaries are event-time
    // halves (approxQuantile median), which keeps watermark advancement
    // monotone exactly like a production time-ordered source; nothing in
    // the feed path materializes the table on the driver.
    //
    // Micro-batch streams want FEW state partitions at this volume: state
    // partition count is pinned to shuffle partitions at query start, and
    // every micro-batch pays per-partition state-store setup/commit —
    // driver-measured, 32 partitions × few batches dominates the actual
    // row work. `withStreamShuffle` scopes the smaller setting to the
    // drain and restores the session value after.

    // at-least-once delivery made effectively-exactly-once: every event is
    // re-delivered in-batch AND a tail re-delivered cross-batch; the
    // oracle is the distinct corpus. Feed = file-source stream (one
    // parquet file per micro-batch, time-split halves) — no driver
    // materialization anywhere; the far-future sentinel file advances the
    // watermark so every row emits.
    "stream_dedup" -> ((s, d) => {
      val ev = Q.events(s, d)
        .select(col("event_id"), col("event_type"), col("_us").as("us"))
      val feed = stagedFeed("stream_dedup", d) {
        val mid = ev.stat.approxQuantile("us", Array(0.5), 0.001)(0).toLong
        val a = ev.where(col("us") <= mid)
        val b = ev.where(col("us") > mid)
        val redeliver = a.orderBy(col("us").desc, col("event_id")).limit(50)
        val maxUs = ev.agg(max("us")).head().getLong(0)
        val sentinel = s.range(1).select(lit(-1L).as("event_id"),
          lit("__sentinel__").as("event_type"),
          lit(maxUs + 100L * 3600L * 1000000L).as("us"))
        Seq(a.unionAll(a), b.unionAll(redeliver), sentinel)
      }
      val in = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(feed)
        .select(col("event_id"), col("event_type"),
          expr("timestamp_micros(us)").as("ts"))
      withStreamShuffle(s, 4) {
        val sq = graft.streaming.EventDedup.dedup(in, Seq("event_id"))
          .writeStream.format("memory").queryName("stream_dedup_sink")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
        try sq.processAllAvailable() finally sq.stop()
      }
      s.table("stream_dedup_sink").where(col("event_id") >= 0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("event_id").as("id_sum"))
        .orderBy("event_type")
    }),

    // watermark-windowed streaming aggregation (tumbling 1-hour counts and
    // cents per type), drained in Append mode: rows arrive across three
    // micro-batches with every 7th row of the first half DELAYED to batch
    // two, so window partials must merge across batches in the state
    // store; a 31-day watermark (longer than the corpus span) plus a
    // far-future sentinel closes every window exactly once. Oracle is the
    // batch hourly aggregate — a dropped late row or a double-emitted
    // window breaks the hash.
    "stream_window_agg" -> ((s, d) => {
      val ev = Q.events(s, d)
        .select(col("event_id"), col("event_type"), col("_us").as("us"),
          cents(col("value")).as("vc"))
      val feed = stagedFeed("stream_window_agg", d) {
        val mid = ev.stat.approxQuantile("us", Array(0.5), 0.001)(0).toLong
        val a = ev.where(col("us") <= mid)
        val b = ev.where(col("us") > mid)
        // every 7th id of the first half arrives DELAYED in batch two, so
        // window partials must merge across batches in the state store
        val late = a.where(col("event_id") % 7 === 0)
        val onTime = a.where(col("event_id") % 7 =!= 0)
        val maxUs = ev.agg(max("us")).head().getLong(0)
        val sentinel = s.range(1).select(lit(-1L).as("event_id"),
          lit("__sentinel__").as("event_type"),
          lit(maxUs + 1000L * 3600L * 1000000L).as("us"), lit(0L).as("vc"))
        Seq(onTime, late.unionAll(b), sentinel)
      }
      val in = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(feed)
        .select(col("event_type"), expr("timestamp_micros(us)").as("ts"),
          col("vc"))
      withStreamShuffle(s, 4) {
        val agg = in.withWatermark("ts", "31 days")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), sum("vc").as("value_cents"))
          .select(expr("unix_micros(window.start) div 3600000000").as("h"),
            col("event_type"), col("cnt"), col("value_cents"))
        val sq = agg.writeStream.format("memory")
          .queryName("stream_window_sink")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .start()
        try sq.processAllAvailable() finally sq.stop()
      }
      s.table("stream_window_sink")
        .where(col("event_type") =!= "__sentinel__")
        .orderBy("event_type", "h")
    }),

    // stream-stream interval join (clicks→purchase attribution) with both
    // sides interleaved across two micro-batches — pairs must match across
    // the batch boundary via buffered state; oracle is the batch BETWEEN
    // join
    "stream_join" -> ((s, d) => {
      val ev = Q.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("_us"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("_us").as("p_us"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("_us").as("c_us"))
      // time-split halves on EACH side; the two file sources advance in
      // lockstep (one file per side per trigger), so cross-boundary pairs
      // must match through buffered stream-stream state
      val pFeed = stagedFeed("stream_join_p", d) {
        val pMid = purchases.stat.approxQuantile("p_us", Array(0.5), 0.001)(0).toLong
        Seq(purchases.where(col("p_us") <= pMid), purchases.where(col("p_us") > pMid))
      }
      val cFeed = stagedFeed("stream_join_c", d) {
        val cMid = clicks.stat.approxQuantile("c_us", Array(0.5), 0.001)(0).toLong
        Seq(clicks.where(col("c_us") <= cMid), clicks.where(col("c_us") > cMid))
      }
      val pIn = s.readStream.schema(purchases.schema)
        .option("maxFilesPerTrigger", "1").parquet(pFeed)
        .select(col("event_id"), col("user_id"),
          expr("timestamp_micros(p_us)").as("p_ts"))
      val cIn = s.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", "1").parquet(cFeed)
        .select(col("c_user"), expr("timestamp_micros(c_us)").as("c_ts"))
      withStreamShuffle(s, 4) {
        val sq = graft.streaming.EventJoin
          .purchasesWithClicks(pIn, cIn, windowSec = 1800)
          .writeStream.format("memory").queryName("stream_join_sink")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
        try sq.processAllAvailable() finally sq.stop()
      }
      s.table("stream_join_sink")
        .agg(count(lit(1)).as("n_pairs"),
          sum("event_id").as("pid_sum"),
          sum(unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us_sum"))
    }),

    // stream-static point-in-time enrichment (the streaming twin of the
    // native as-of operator): a purchase stream joins a STATIC per-user
    // sorted click timeline — the dim side of a production as-of, bounded
    // and broadcast — and the as-of match is computed row-locally with
    // array higher-order functions, so results are independent of
    // micro-batch boundaries (proven by the two-batch split). Same
    // contract and oracle as asof_join_native.
    "stream_asof" -> ((s, d) => {
      val ev = Q.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("_us"))
      val clickArr = ev.where(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user"))
        .agg(sort_array(collect_list(col("_us"))).as("c_arr"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("_us").as("p_us"))
      val feed = stagedFeed("stream_asof", d) {
        val mid = purchases.stat.approxQuantile("p_us", Array(0.5), 0.001)(0).toLong
        Seq(purchases.where(col("p_us") <= mid), purchases.where(col("p_us") > mid))
      }
      val in = s.readStream.schema(purchases.schema)
        .option("maxFilesPerTrigger", "1").parquet(feed)
      withStreamShuffle(s, 4) {
        val enriched = in
          .join(broadcast(clickArr), col("user_id") === col("c_user"), "left")
          .select(col("event_id"), col("p_us"),
            expr("array_max(filter(c_arr, c -> c <= p_us))").as("last_c"))
        val sq = enriched.writeStream.format("memory")
          .queryName("stream_asof_sink")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
        try sq.processAllAvailable() finally sq.stop()
      }
      s.table("stream_asof_sink")
        .agg(count(lit(1)).as("n_purchases"),
          count(col("last_c")).as("n_with_prior_click"),
          sum(col("p_us") - col("last_c")).as("gap_us_sum"))
    })
  )

  // ---- DuckDB oracles --------------------------------------------------

  private val normSql =
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
  private def h60(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  private val dupCorpusSql =
    """SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0""".stripMargin

  private val nearDupCorpusSql =
    s"""SELECT doc_id AS id, $normSql AS t FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000,
       |         trim(regexp_replace(lower(text || ' zz qq xx'), '[^a-z0-9]+', ' ', 'g'))
       |  FROM documents WHERE doc_id % 20 = 0""".stripMargin

  private val vecCorpusSql =
    """SELECT vec_id AS id, embedding AS e FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 50 = 0""".stripMargin

  // explicit double-precision cosine, mirroring Similarity.cosine's
  // left-to-right accumulation
  /** Brute-force top-k oracle; also the oracle for IVF at nProbe=nCentroids
    * (all cells probed ⇒ exact). */
  private lazy val bruteTopkSql =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, round(${cosSql("embedding", "qv")}, 4) AS cos
       |FROM embeddings, q
       |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin

  /** Oracle for the recall-contract ANN keys (see [[recallRow]]). */
  private lazy val recallOracleSql =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |topk AS (SELECT vec_id, round(${cosSql("embedding", "qv")}, 4) AS cos
       |         FROM embeddings, q
       |         ORDER BY cos DESC, vec_id LIMIT 10)
       |SELECT CAST(SUM(vec_id) AS BIGINT) AS exact_id_sum,
       |       CAST(SUM(CAST(ROUND(cos * 10000) AS BIGINT)) AS BIGINT) AS exact_cos_sum_e4,
       |       true AS recall_floor_met
       |FROM topk""".stripMargin

  private def cosSql(a: String, b: String) =
    s"""(list_sum(list_transform(range(1, 65),
       |   i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |  * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin

  /** Shared minhash-LSH CTE chain over `src(id, t)`, ending in
    * `mp(id_a, id_b, est_jaccard)` (used by the dedup keys and the
    * composed curation pipeline). */
  private def minhashChain(src: String) =
    s"""sh AS (
       |  SELECT id, substr(t, CAST(u.i AS INTEGER), 8) AS s
       |  FROM $src, LATERAL unnest(range(1, greatest(len(t) - 7, 1) + 1, 4)) AS u(i)),
       |mh AS (
       |  SELECT id, k.k AS k,
       |         MIN(('0x' || substr(md5(CAST(k.k // 4 AS VARCHAR) || '|' || s),
       |                             1 + 8 * CAST(k.k % 4 AS INTEGER), 8))::BIGINT) AS mh
       |  FROM sh, LATERAL unnest(range(0, 8)) AS k(k)
       |  GROUP BY id, k.k),
       |sig AS (SELECT id, list(mh ORDER BY k) AS sig FROM mh GROUP BY id),
       |bands AS (
       |  SELECT id, sig, b.b AS b,
       |         CAST(sig[2 * b.b + 1] AS VARCHAR) || ',' ||
       |         CAST(sig[2 * b.b + 2] AS VARCHAR) AS bv
       |  FROM sig, LATERAL unnest(range(0, 4)) AS b(b)
       |  QUALIFY row_number() OVER (PARTITION BY b.b, bv ORDER BY id) <= 64),
       |pairs AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sig AS sa, b.sig AS sb
       |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.id < b.id),
       |mp AS (
       |  SELECT id_a, id_b, est AS est_jaccard FROM (
       |    SELECT id_a, id_b,
       |      list_sum(list_transform(range(1, 9),
       |        i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END)) / 8.0 AS est
       |    FROM pairs)
       |  WHERE est >= 0.5)""".stripMargin

  private lazy val minhashCtes =
    s"""corpus AS ($nearDupCorpusSql),
       |${minhashChain("corpus")}""".stripMargin

  /** 3 rounds of min-label propagation over `mp` pairs + `src` nodes,
    * ending in `l3(id, lbl)` (shared by the cluster/survivor keys and the
    * composed curation pipeline). */
  private def clusterChain(src: String) = {
    def round(prev: String, out: String) =
      s"""$out AS (
         |  SELECT n.id, least(n.lbl, COALESCE(MIN(l.lbl), n.lbl)) AS lbl
         |  FROM $prev n
         |  LEFT JOIN edges e ON e.u = n.id
         |  LEFT JOIN $prev l ON l.id = e.v
         |  GROUP BY n.id, n.lbl)""".stripMargin
    s"""edges AS (SELECT id_a AS u, id_b AS v FROM mp
       |          UNION ALL SELECT id_b, id_a FROM mp),
       |l0 AS (SELECT id, id AS lbl FROM $src),
       |${round("l0", "l1")},
       |${round("l1", "l2")},
       |${round("l2", "l3")}""".stripMargin
  }

  private lazy val clusterCtes = clusterChain("corpus")

  val oracleSql: Map[String, String] = Map(
    // batch-2 survivors = the novel ids (stored overlap 40..49 drops;
    // document texts are unique, so novelty is exactly the id window)
    "dedup_incremental" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM documents WHERE doc_id BETWEEN 50 AND 79""".stripMargin,

    "dedup_exact" ->
      s"""WITH corpus AS ($dupCorpusSql)
         |SELECT CAST(COUNT(*) AS BIGINT) AS survivors,
         |       CAST(SUM(keep_id) AS BIGINT) AS id_checksum,
         |       CAST(SUM(CASE WHEN grp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups
         |FROM (SELECT MIN(doc_id) AS keep_id, COUNT(*) AS grp
         |      FROM corpus GROUP BY md5(text))""".stripMargin,

    "dedup_minhash" ->
      s"""WITH $minhashCtes
         |SELECT id_a, id_b, est_jaccard FROM mp ORDER BY id_a, id_b""".stripMargin,

    // same chunking algebra: k=8 word chunks of the normalized text,
    // global first-occurrence keep by packed (doc_id, idx) order key
    "dedup_passage" ->
      s"""WITH corpus AS ($dupCorpusSql),
         |w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM corpus),
         |c AS (SELECT doc_id, i AS idx,
         |        array_to_string(ws[(i*8+1):(i*8+8)], ' ') AS chunk
         |      FROM w, UNNEST(range(greatest(CAST(ceil(len(ws)/8.0) AS INT), 1))) AS t(i)),
         |keep AS (SELECT MIN(doc_id*1048576 + idx) AS ord FROM c GROUP BY md5(chunk)),
         |kept AS (SELECT ord // 1048576 AS doc_id,
         |                CAST(COUNT(*) AS BIGINT) AS kept_chunks
         |         FROM keep GROUP BY 1),
         |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
         |        FROM c GROUP BY doc_id)
         |SELECT t.doc_id, t.n_chunks,
         |       CAST(COALESCE(k.kept_chunks, 0) AS BIGINT) AS kept_chunks
         |FROM tot t LEFT JOIN kept k USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // bounded min-label propagation: 3 rounds of the identical algorithm
    // the Spark operator runs, so the cluster assignment hash-matches
    "dedup_minhash_cluster" ->
      s"""WITH $minhashCtes,
         |$clusterCtes
         |SELECT CAST(COUNT(DISTINCT lbl) AS BIGINT) AS n_clusters,
         |       CAST(SUM(CASE WHEN lbl <> id THEN 1 ELSE 0 END) AS BIGINT) AS n_merged,
         |       CAST(SUM(CASE WHEN lbl = id THEN id ELSE 0 END) AS BIGINT) AS survivor_checksum
         |FROM l3""".stripMargin,

    // the deduped corpus itself: one survivor (min id) per cluster, with
    // a fingerprint over every surviving normalized text
    "dedup_survivors" ->
      s"""WITH $minhashCtes,
         |$clusterCtes
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_survivors,
         |       CAST(SUM(${h60("t")} % 1000003) AS BIGINT) AS text_fp
         |FROM l3 JOIN corpus USING (id) WHERE lbl = id""".stripMargin,

    "dedup_simhash" ->
      s"""WITH corpus AS ($nearDupCorpusSql),
         |tok AS (SELECT id, unnest(string_split(t, ' ')) AS w FROM corpus),
         |h AS (SELECT id, ${h60("w")} AS h FROM tok),
         |sim AS (
         |  SELECT id, ${(0 until 16).map(b =>
             s"(CASE WHEN 2 * SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE 0 END) " +
               s">= COUNT(*) THEN ${1 << b} ELSE 0 END)").mkString(" + ")} AS sim
         |  FROM h GROUP BY id)
         |SELECT bucket_size, CAST(COUNT(*) AS BIGINT) AS n_buckets
         |FROM (SELECT sim, CAST(COUNT(*) AS BIGINT) AS bucket_size
         |      FROM sim GROUP BY sim)
         |GROUP BY bucket_size ORDER BY bucket_size""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, $normSql AS t FROM documents),
         |grams AS (
         |  SELECT doc_id, list(DISTINCT substr(t, CAST(u.i AS INTEGER), 4)) AS gs
         |  FROM d, LATERAL unnest(range(1, greatest(len(t) - 3, 1) + 1)) AS u(i)
         |  GROUP BY doc_id),
         |probe AS (SELECT gs AS pg FROM grams WHERE doc_id = 0)
         |SELECT doc_id,
         |       round(len(list_intersect(gs, pg)) /
         |             CAST(len(list_distinct(list_concat(gs, pg))) AS DOUBLE), 4)
         |         AS jaccard
         |FROM grams, probe
         |ORDER BY jaccard DESC, doc_id LIMIT 10""".stripMargin,

    "dedup_embed_cosine" ->
      s"""WITH corpus AS ($vecCorpusSql),
         |b AS (
         |  SELECT id, e, ${(0 until 8).map(i =>
             s"(CASE WHEN e[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
             .mkString(" + ")} AS bkt
         |  FROM corpus)
         |SELECT id_a, id_b, cos FROM (
         |  SELECT x.id AS id_a, y.id AS id_b,
         |         round(${cosSql("x.e", "y.e")}, 4) AS cos
         |  FROM b x JOIN b y ON x.bkt = y.bkt AND x.id < y.id)
         |WHERE cos >= 0.999 ORDER BY id_a, id_b""".stripMargin,

    // centroids from the BASE embeddings (hash-sample order), assignment
    // by cosine argmax with ties to the smallest cell, pairs within cells
    "dedup_semantic" ->
      s"""WITH corpus AS ($vecCorpusSql),
         |cents AS (
         |  SELECT row_number() OVER (ORDER BY h, vec_id) AS c, cv FROM
         |    (SELECT ${h60("CAST(vec_id AS VARCHAR)")} AS h, vec_id,
         |            embedding AS cv FROM embeddings)
         |  QUALIFY c <= 64),
         |asg AS (
         |  SELECT id, e, c FROM (
         |    SELECT o.id, o.e, cents.c,
         |           row_number() OVER (PARTITION BY o.id
         |             ORDER BY ${cosSql("o.e", "cents.cv")} DESC, cents.c) AS rk
         |    FROM corpus o, cents)
         |  WHERE rk = 1)
         |SELECT id_a, id_b, cos FROM (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |         round(${cosSql("a.e", "b.e")}, 4) AS cos
         |  FROM asg a JOIN asg b ON a.c = b.c AND a.id < b.id)
         |WHERE cos >= 0.999 ORDER BY id_a, id_b""".stripMargin,

    "sim_topk_cosine" -> bruteTopkSql,

    // 8 hash-sampled queries × exact top-10 each, total (q, cos desc, id)
    // order — ranks identical to the two-level decomposition by totality
    "sim_topk_batch" ->
      s"""WITH q AS (
         |  SELECT vec_id AS q_id, embedding AS qv FROM
         |    (SELECT ${h60("CAST(vec_id AS VARCHAR)")} AS h, vec_id, embedding
         |     FROM embeddings ORDER BY h, vec_id LIMIT 8)),
         |scored AS (
         |  SELECT q.q_id, e.vec_id,
         |         round(${cosSql("e.embedding", "q.qv")}, 4) AS cos
         |  FROM embeddings e, q)
         |SELECT q_id, vec_id, cos FROM (
         |  SELECT q_id, vec_id, cos,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY cos DESC, vec_id) AS rk
         |  FROM scored)
         |WHERE rk <= 10 ORDER BY q_id, cos DESC, vec_id""".stripMargin,

    // recall contract for realistic-probe ANN: DuckDB recomputes the exact
    // top-10's id/cosine sums brute-force and asserts the recall flag
    "sim_topk_cosine_ivf" -> recallOracleSql,
    "sim_topk_ivfpq" -> recallOracleSql,

    // IVF with every cell probed is exact ⇒ same oracle as brute force
    "sim_topk_cosine_ivf_full" -> bruteTopkSql,

    // PQ re-rank with a corpus-wide shortlist is exact ⇒ brute-force oracle
    "sim_topk_pq_rerank" -> bruteTopkSql,

    // IVF-PQ with every cell probed + corpus-wide shortlist is exact ⇒
    // brute-force oracle
    "sim_topk_ivfpq_full" -> bruteTopkSql,

    // PQ codes: same hash-seeded codebook sample (QUALIFY row_number ≤ 16
    // over the h60 order), argmin via min_by with (distance, code) —
    // the tie-break the Spark fold's strict `<` applies
    "embed_pq" ->
      s"""WITH cb AS (
         |  SELECT row_number() OVER (ORDER BY h, vec_id) AS c, cv FROM
         |    (SELECT ${h60("CAST(vec_id AS VARCHAR)")} AS h, vec_id,
         |            embedding AS cv FROM embeddings)
         |  QUALIFY c <= 16),
         |dists AS (
         |  SELECT e.vec_id, s.s, cb.c,
         |    list_sum(list_transform(range(1, 9),
         |      i -> (CAST(e.embedding[(s.s - 1) * 8 + i] AS DOUBLE)
         |              - CAST(cb.cv[(s.s - 1) * 8 + i] AS DOUBLE))
         |         * (CAST(e.embedding[(s.s - 1) * 8 + i] AS DOUBLE)
         |              - CAST(cb.cv[(s.s - 1) * 8 + i] AS DOUBLE)))) AS dist
         |  FROM embeddings e, range(1, 9) AS s(s), cb),
         |codes AS (
         |  SELECT vec_id, s, c AS code FROM dists
         |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) = 1)
         |SELECT vec_id,
         |  array_to_string(list(CAST(code AS INTEGER) ORDER BY s), '-') AS codes_str
         |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "contam_ngram" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS t FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(
         |        range(1, greatest(len(t) - 2, 0) + 1),
         |        i -> array_to_string(t[i:i+2], ' '))) AS gs FROM d),
         |bench AS (SELECT list_distinct(flatten(list(gs))) AS bg
         |          FROM g WHERE doc_id % 50 = 0),
         |c AS (SELECT doc_id, len(gs) AS n_grams,
         |        len(list_filter(gs, x -> list_contains(bg, x))) AS n_hit
         |      FROM g, bench WHERE doc_id % 50 <> 0 AND len(gs) > 0)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |       CAST(n_hit AS BIGINT) AS n_hit,
         |       round(n_hit / CAST(n_grams AS DOUBLE), 4) AS contam
         |FROM c ORDER BY contam DESC, doc_id LIMIT 10""".stripMargin,

    "repetition_stats" ->
      s"""WITH d AS (SELECT lang, string_split($normSql, ' ') AS t FROM documents),
         |g AS (SELECT lang, t, list_transform(
         |        range(1, greatest(len(t) - 1, 0) + 1),
         |        i -> array_to_string(t[i:i+1], ' ')) AS bg FROM d),
         |m AS (SELECT lang,
         |        1.0 - len(list_distinct(t)) /
         |          CAST(greatest(len(t), 1) AS DOUBLE) AS dup,
         |        list_max(list_transform(list_distinct(bg),
         |            x -> len(list_filter(bg, y -> y = x)))) /
         |          CAST(greatest(len(bg), 1) AS DOUBLE) AS topbg
         |      FROM g)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       round(avg(dup), 4) AS avg_dup_ratio,
         |       round(avg(topbg), 4) AS avg_top_bigram
         |FROM m GROUP BY lang ORDER BY lang""".stripMargin,

    "lang_id" -> {
      def score(words: Seq[String]) =
        s"len(list_filter(string_split(t, ' '), x -> x IN (${
          words.map(w => s"'$w'").mkString(", ")})))"
      val sEn = score(TextOps.Stopwords("en")); val sDe = score(TextOps.Stopwords("de"))
      val sFr = score(TextOps.Stopwords("fr")); val sEs = score(TextOps.Stopwords("es"))
      s"""WITH d AS (SELECT lang, text, $normSql AS t FROM documents),
         |p AS (
         |  SELECT lang,
         |    CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |         WHEN $sDe > greatest($sEn, $sFr, $sEs) THEN 'de'
         |         WHEN $sFr > greatest($sEn, $sDe, $sEs) THEN 'fr'
         |         WHEN $sEs > greatest($sEn, $sDe, $sFr) THEN 'es'
         |         ELSE 'en' END AS predicted
         |  FROM d)
         |SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM p GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
    },

    "text_quality_score" -> {
      val allStops = TextOps.Stopwords.values.flatten.toSeq
        .map(w => s"'$w'").mkString(", ")
      s"""WITH d AS (
         |  SELECT lang, text, $normSql AS t,
         |         len(string_split($normSql, ' ')) AS n_tok
         |  FROM documents),
         |m AS (
         |  SELECT lang, CAST(n_tok AS BIGINT) AS n_tok,
         |    len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) /
         |      CAST(greatest(len(text), 1) AS DOUBLE) AS pr,
         |    len(list_filter(string_split(t, ' '), x -> x IN ($allStops))) /
         |      CAST(greatest(n_tok, 1) AS DOUBLE) AS sr,
         |    len(replace(t, ' ', '')) / CAST(greatest(n_tok, 1) AS DOUBLE) AS ml
         |  FROM d),
         |q AS (
         |  SELECT lang, n_tok, pr, sr, ml,
         |    (CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 0.4 ELSE 0.0 END) +
         |    (CASE WHEN pr < 0.1 THEN 0.3 ELSE 0.0 END) +
         |    (CASE WHEN ml >= 2.5 AND ml <= 9.5 THEN 0.3 ELSE 0.0 END) AS q
         |  FROM m)
         |SELECT lang, round(avg(n_tok), 4) AS avg_tokens,
         |       round(avg(pr), 4) AS avg_punct_ratio,
         |       round(avg(sr), 4) AS avg_stop_ratio,
         |       round(avg(ml), 4) AS avg_word_len,
         |       round(avg(q), 4) AS avg_quality
         |FROM q GROUP BY lang ORDER BY lang""".stripMargin
    },

    "token_count" ->
      s"""SELECT lang,
         |  CAST(SUM(len(string_split($normSql, ' '))) AS BIGINT) AS ws_tokens,
         |  CAST(SUM(len(regexp_extract_all(text,
         |    '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpeish_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "pii_redact" -> {
      // duckdb string literals keep backslashes (no escape processing)
      val em = TextOps.EmailRe
      val ph = TextOps.PhoneRe
      s"""WITH c AS (SELECT doc_id, lang,
         |  CASE WHEN doc_id % 10 = 0
         |       THEN text || ' contact u' || doc_id || '@example.com call +88005553535'
         |       ELSE text END AS t
         |  FROM documents),
         |r AS (SELECT lang,
         |  len(regexp_extract_all(t, '$em')) AS emails,
         |  len(regexp_extract_all(t, '$ph')) AS phones,
         |  regexp_replace(regexp_replace(t, '$em', '<EMAIL>', 'g'),
         |                 '$ph', '<PHONE>', 'g') AS red
         |  FROM c)
         |SELECT lang, CAST(SUM(emails) AS BIGINT) AS emails_found,
         |       CAST(SUM(phones) AS BIGINT) AS phones_found,
         |       CAST(SUM(${h60("red")} % 1000003) AS BIGINT) AS redacted_fp
         |FROM r GROUP BY lang ORDER BY lang""".stripMargin
    },

    "embed_quantize_int8" ->
      s"""WITH q AS (
         |  SELECT vec_id, embedding,
         |         CAST(list_min(embedding) AS DOUBLE) AS mn,
         |         CAST(list_max(embedding) AS DOUBLE) AS mx
         |  FROM embeddings),
         |c AS (
         |  SELECT vec_id, mn, mx,
         |         list_transform(embedding, x -> CAST(
         |           CASE WHEN mx = mn THEN 0
         |                ELSE round((CAST(x AS DOUBLE) - mn) / (mx - mn) * 255)
         |           END AS INTEGER)) AS codes
         |  FROM q)
         |SELECT vec_id, round(mn, 4) AS vmin, round(mx, 4) AS vmax,
         |       CAST(list_sum(codes) AS BIGINT) AS q_sum,
         |       CAST(list_min(codes) AS INTEGER) AS q_min,
         |       CAST(list_max(codes) AS INTEGER) AS q_max
         |FROM c ORDER BY vec_id""".stripMargin,

    "split_train_test" ->
      s"""WITH b AS (SELECT doc_id,
         |  ${h60("CAST(doc_id AS VARCHAR)")} % 100 AS bucket FROM documents)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "sample_stratified" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
         |FROM documents
         |WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 1000 <
         |      CASE WHEN lang = 'en' THEN 100 ELSE 500 END
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "pack_token_budget" ->
      s"""WITH d AS (SELECT doc_id, len(string_split($normSql, ' ')) AS toks
         |           FROM documents),
         |c AS (SELECT doc_id, toks,
         |             SUM(toks) OVER (ORDER BY doc_id) AS cum FROM d)
         |SELECT CAST((cum - toks) // 2000 AS BIGINT) AS bin,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(toks) AS BIGINT) AS bin_tokens,
         |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // the six pipeline stages mirrored in one chained-CTE SQL: quality
    // gate (same 3-part score as text_quality_score), exact dedup, the
    // shared minhash+cluster chains, gram-set decontamination, chunking
    // (same algebra as doc_chunk), and the h60 split
    "curate_corpus" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
         |corpus0 AS (
         |  SELECT doc_id AS id, text FROM base
         |  UNION ALL SELECT doc_id + 1000000, text FROM base WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id + 2000000, text || ' zz qq xx' FROM base
         |    WHERE doc_id % 20 = 0
         |  UNION ALL SELECT doc_id + 3000000, substr(text, 1, 20) FROM base
         |    WHERE doc_id % 25 = 0),
         |qd AS (SELECT id, text, $normSql AS t,
         |              len(string_split($normSql, ' ')) AS n_tok
         |       FROM corpus0),
         |q AS (SELECT id, text, t FROM qd WHERE
         |  (CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 0.4 ELSE 0.0 END) +
         |  (CASE WHEN len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) /
         |            CAST(greatest(len(text), 1) AS DOUBLE) < 0.1
         |        THEN 0.3 ELSE 0.0 END) +
         |  (CASE WHEN len(replace(t, ' ', '')) /
         |              CAST(greatest(n_tok, 1) AS DOUBLE) >= 2.5
         |        AND len(replace(t, ' ', '')) /
         |              CAST(greatest(n_tok, 1) AS DOUBLE) <= 9.5
         |        THEN 0.3 ELSE 0.0 END) >= 0.7),
         |exi AS (SELECT MIN(id) AS id FROM q GROUP BY md5(text)),
         |exk AS (SELECT q.id, q.t FROM q JOIN exi USING (id)),
         |${minhashChain("exk")},
         |${clusterChain("exk")},
         |nd AS (SELECT e.id, string_split(e.t, ' ') AS ws
         |       FROM exk e JOIN l3 ON l3.id = e.id WHERE l3.lbl = l3.id),
         |g AS (SELECT id, list_distinct(list_transform(
         |        range(1, greatest(len(ws) - 2, 0) + 1),
         |        i -> array_to_string(ws[i:i+2], ' '))) AS gs FROM nd),
         |bw AS (SELECT string_split($normSql, ' ') AS ws FROM documents
         |       WHERE doc_id % 50 = 0),
         |bg AS (SELECT list_distinct(flatten(list(list_transform(
         |        range(1, greatest(len(ws) - 2, 0) + 1),
         |        i -> array_to_string(ws[i:i+2], ' '))))) AS egs FROM bw),
         |ct AS (SELECT id FROM g, bg
         |       WHERE round(len(list_intersect(gs, egs)) /
         |                   CAST(len(gs) AS DOUBLE), 4) < 0.2),
         |clean AS (SELECT nd.id, nd.ws FROM nd JOIN ct USING (id)),
         |nch AS (SELECT id, ws, 1 + GREATEST(0, (len(ws) - 32 + 23) // 24) AS nc
         |        FROM clean),
         |ch AS (SELECT id, id || '#' || u.i AS chunk_id,
         |              len(ws[u.i*24+1 : u.i*24+32]) AS n_tokens,
         |              array_to_string(ws[u.i*24+1 : u.i*24+32], ' ') AS chunk_text
         |       FROM nch, unnest(range(0, nch.nc)) AS u(i)),
         |sp AS (SELECT id, n_tokens, chunk_text,
         |              CASE WHEN ${h60("chunk_id")} % 100 < 80 THEN 'train'
         |                   WHEN ${h60("chunk_id")} % 100 < 90 THEN 'val'
         |                   ELSE 'test' END AS split
         |       FROM ch)
         |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |       CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
         |       CAST(SUM(${h60("chunk_text")} % 1000003) AS BIGINT) AS chunk_fp
         |FROM sp GROUP BY split ORDER BY split""".stripMargin,

    "doc_chunk" ->
      s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS toks
         |           FROM documents),
         |n AS (SELECT doc_id, toks,
         |             1 + GREATEST(0, (len(toks) - 32 + 23) // 24) AS nc
         |      FROM t)
         |SELECT n.doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
         |       n.doc_id || '#' || u.i AS chunk_id,
         |       CAST(len(toks[u.i*24+1 : u.i*24+32]) AS BIGINT) AS n_tokens,
         |       array_to_string(toks[u.i*24+1 : u.i*24+32], ' ') AS chunk_text
         |FROM n, unnest(range(0, n.nc)) AS u(i)
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "freq_terms" ->
      s"""SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM (SELECT unnest(string_split($normSql, ' ')) AS term
         |      FROM documents)
         |WHERE term <> ''
         |GROUP BY term ORDER BY cnt DESC, term LIMIT 20""".stripMargin,

    // exact-at-capacity: MG capacity 4096 ≥ vocab ⇒ cnt_est is exact
    "sketch_freq_terms" ->
      s"""SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt_est
         |FROM (SELECT unnest(string_split($normSql, ' ')) AS term
         |      FROM documents)
         |WHERE term <> ''
         |GROUP BY term ORDER BY cnt_est DESC, term LIMIT 20""".stripMargin,

    "freq_terms_by_source" ->
      s"""SELECT source, term, cnt FROM (
         |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt,
         |         ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY COUNT(*) DESC, term) AS rk
         |  FROM (SELECT source, unnest(string_split($normSql, ' ')) AS term
         |        FROM documents)
         |  WHERE term <> ''
         |  GROUP BY source, term)
         |WHERE rk <= 3
         |ORDER BY source, term""".stripMargin,

    "mix_weights" ->
      s"""WITH d AS (SELECT source, len(string_split($normSql, ' ')) AS t
         |           FROM documents),
         |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |               CAST(SUM(t) AS BIGINT) AS tokens
         |        FROM d GROUP BY source),
         |tot AS (SELECT CAST(SUM(tokens) AS DOUBLE) AS total FROM per),
         |w AS (SELECT source, n_docs, tokens,
         |        tokens / total AS ts,
         |        CAST(CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5
         |             THEN 0.1 ELSE 0.5 / 15 END AS DOUBLE) AS tg
         |      FROM per, tot)
         |SELECT source, n_docs, tokens, round(ts, 6) AS token_share,
         |       round(tg, 6) AS target_share, round(tg / ts, 6) AS weight
         |FROM w ORDER BY source""".stripMargin,

    "doc_fingerprint" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split($normSql, ' ') AS toks
         |           FROM documents),
         |tp AS (
         |  SELECT doc_id, lang, unnest(toks) AS w,
         |         generate_subscripts(toks, 1) - 1 AS pos
         |  FROM d),
         |fp AS (
         |  SELECT doc_id, lang,
         |         SUM((${h60("w")} % 1000003) * ((pos % 97) + 1)) % 1000003 AS fp
         |  FROM tp GROUP BY doc_id, lang)
         |SELECT lang, CAST(COUNT(DISTINCT fp) AS BIGINT) AS distinct_fps,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM fp GROUP BY lang ORDER BY lang""".stripMargin,

    "text_stats" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       round(avg(n_chars), 4) AS avg_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // streaming dedup drains to exactly the distinct corpus
    "stream_dedup" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // drained windowed aggregation == the batch hourly aggregate
    "stream_window_agg" ->
      """SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |       event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events GROUP BY h, event_type
        |ORDER BY event_type, h""".stripMargin,

    // streaming interval join == the batch BETWEEN join
    "stream_join" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(SUM(p.event_id) AS BIGINT) AS pid_sum,
        |       CAST(SUM(epoch_us(CAST(p.ts AS TIMESTAMP))
        |                - epoch_us(CAST(c.ts AS TIMESTAMP))) AS BIGINT) AS gap_us_sum
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP)
        |     BETWEEN CAST(p.ts AS TIMESTAMP) - INTERVAL 1800 SECOND
        |         AND CAST(p.ts AS TIMESTAMP)""".stripMargin,

    "stream_asof" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_us
        |      FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.event_id, p.p_us,
        |         (SELECT MAX(c.c_us) FROM c
        |          WHERE c.user_id = p.user_id AND c.c_us <= p.p_us) AS last_c
        |  FROM p)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(COUNT(last_c) AS BIGINT) AS n_with_prior_click,
        |       CAST(SUM(p_us - last_c) AS BIGINT) AS gap_us_sum
        |FROM m""".stripMargin,

    "events_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
        |       event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY hour_start, event_type
        |ORDER BY hour_start, event_type""".stripMargin,

    // session_window semantics: event at ts ≥ prev + gap starts a NEW
    // session (µs precision, half-open windows) — hence >= on the µs diff,
    // unlike events_sessionize's truncated-second strict >
    "events_session_window" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts2 FROM events),
        |flags AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts2) OVER (PARTITION BY user_id ORDER BY ts2) IS NULL
        |           OR date_diff('microseconds',
        |                lag(ts2) OVER (PARTITION BY user_id ORDER BY ts2),
        |                ts2) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e)
        |SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM flags GROUP BY user_id ORDER BY user_id""".stripMargin,

    "events_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts2 FROM events),
        |flags AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts2) OVER (PARTITION BY user_id ORDER BY ts2) IS NULL
        |           OR date_diff('second',
        |                lag(ts2) OVER (PARTITION BY user_id ORDER BY ts2),
        |                ts2) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e)
        |SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM flags GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
