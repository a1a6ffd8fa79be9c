package graft.queries

import org.apache.spark.sql.functions._

import Q._
import graft.ext.{Linkage, Relevance, Similarity}

/** Round-6 extension keys: corpus relevance scoring (TF-IDF, BM25),
  * n-gram-LM quality scoring (the perplexity-filter shape), blocked fuzzy
  * record linkage, and the distributed gramian — each oracle-checked
  * against DuckDB on the same parquet inputs.
  */
object RelevanceQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    tbl(s, d, "documents")

  val queries: Map[String, QueryFn] = Map(

    // per-doc top-3 TF-IDF keywords; scores rounded before ranking so a
    // libm-ulp cannot flip the cross-engine order
    "tfidf_topk" -> ((s, d) => {
      Relevance.tfidfTopK(docs(s, d), "doc_id", "text", 3)
        .orderBy("doc_id", "term")
    }),

    // BM25 retrieval of the 20 best docs for a fixed 3-term query
    "bm25_topk" -> ((s, d) => {
      Relevance.bm25TopK(docs(s, d), "doc_id", "text",
          Seq("spark", "join", "stream"), 20)
        .orderBy(desc("score"), col("doc_id"))
    }),

    // bigram-LM mean negative log-likelihood per doc — the perplexity
    // quality filter of a CCNet-style curation pipeline
    "ngram_lm_score" -> ((s, d) => {
      Relevance.bigramNll(docs(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // blocked edit-distance linkage: part names vs their 'a'-stripped
    // perturbations; the blocking key is exact for the perturbation model
    // so no true pair is lost, and the plan never goes cartesian
    // (plan-gated in PlanSpec)
    "fuzzy_join_edit" -> ((s, d) => {
      val part = tbl(s, d, "part")
      val dirty = part.select(
        regexp_replace(col("p_name"), "a", "").as("d_name"))
      Linkage.editJoin(part, "p_name", dirty, "d_name", maxDist = 2)
        .withColumn("_ph", graft.ext.TextOps.hash60(
          concat(col("l_val"), lit("|"), col("r_val"))))
        .groupBy("dist")
        // bit_xor, not sum: order-free like sum but cannot overflow a
        // 64-bit long however many 60-bit pair hashes fold in
        .agg(count(lit(1)).as("n_pairs"), expr("bit_xor(_ph)").as("pair_hash"))
        .orderBy("dist")
    }),

    // distributed upper-tri gramian of the embedding corpus (the PCA /
    // covariance primitive): one explode + one partial-aggregated shuffle
    "embed_gram" -> ((s, d) => {
      Similarity.gramian(tbl(s, d, "embeddings"), "embedding", 64)
        .orderBy("i", "j")
    })
  )

  private val normSql =
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"

  val oracleSql: Map[String, String] = Map(

    "tfidf_topk" ->
      s"""WITH tt AS (
         |  SELECT doc_id, term FROM (
         |    SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
         |    FROM documents) WHERE term <> ''),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM tt GROUP BY doc_id, term),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
         |s AS (SELECT doc_id, tf.term AS term, tf,
         |             round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS score
         |      FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, term) AS rk FROM s)
         |SELECT doc_id, term, tf, score FROM r WHERE rk <= 3
         |ORDER BY doc_id, term""".stripMargin,

    "bm25_topk" ->
      s"""WITH tt AS (
         |  SELECT doc_id, term FROM (
         |    SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
         |    FROM documents) WHERE term <> ''),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tt GROUP BY doc_id),
         |st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tt
         |       WHERE term IN ('spark', 'join', 'stream')
         |       GROUP BY doc_id, term),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |c AS (SELECT doc_id,
         |        round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         |              * tf * 2.2
         |              / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS c
         |      FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
         |      CROSS JOIN st)
         |SELECT doc_id, round(SUM(c), 5) AS score,
         |       CAST(COUNT(*) AS BIGINT) AS n_terms
         |FROM c GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "ngram_lm_score" ->
      s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS t
         |              FROM documents),
         |ix AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
         |bg AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i + 1] AS big
         |       FROM ix),
         |c2 AS (SELECT big, COUNT(*) AS c2 FROM bg GROUP BY big),
         |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
         |v AS (SELECT COUNT(DISTINCT w1) AS v FROM bg)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |       round(AVG(-ln((c2 + 0.5) / (c1 + 0.5 * v))), 6) AS avg_nll
         |FROM bg JOIN c2 USING (big) JOIN c1 USING (w1) CROSS JOIN v
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "fuzzy_join_edit" ->
      """WITH l AS (SELECT DISTINCT p_name AS l_val FROM part),
        |r0 AS (SELECT DISTINCT regexp_replace(p_name, 'a', '', 'g') AS r_val
        |       FROM part),
        |lb AS (SELECT l_val,
        |              substr(regexp_replace(l_val, 'a', '', 'g'), 1, 4) AS blk
        |       FROM l),
        |rb AS (SELECT r_val,
        |              substr(regexp_replace(r_val, 'a', '', 'g'), 1, 4) AS blk
        |       FROM r0),
        |p AS (SELECT l_val, r_val, levenshtein(l_val, r_val) AS dist
        |      FROM lb JOIN rb USING (blk)
        |      WHERE levenshtein(l_val, r_val) <= 2)
        |SELECT CAST(dist AS INT) AS dist, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(BIT_XOR(('0x' || substr(md5(l_val || '|' || r_val), 1, 15))::BIGINT)
        |            AS BIGINT) AS pair_hash
        |FROM p GROUP BY dist ORDER BY dist""".stripMargin,

    "embed_gram" ->
      """SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        |       round(SUM(CAST(embedding[i] AS DOUBLE)
        |                 * CAST(embedding[j] AS DOUBLE)), 4) AS gram
        |FROM embeddings, range(1, 65) t1(i), range(1, 65) t2(j)
        |WHERE j >= i
        |GROUP BY i, j ORDER BY i, j""".stripMargin
  )
}
