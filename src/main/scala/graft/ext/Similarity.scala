package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2.9; design anchored on the
  * distributed top-k literature in PAPERS.md — norm-pruned brute force as
  * the exact baseline, bucketed LSH as the sub-linear scale path).
  *
  * Embeddings are `array<float>`; all arithmetic is higher-order column
  * expressions (`zip_with`/`aggregate`) in double precision — codegen'd,
  * no UDFs.
  */
object Similarity {

  /** dot(a, b) as a double expression. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact brute-force top-k by cosine against one query vector. The query
    * broadcasts as a literal array; Spark plans TakeOrderedAndProject — a
    * per-partition top-k then a k-row driver merge, no global sort shuffle.
    * This is the exact baseline; at 100 TB shard-local top-k + merge is
    * exactly this plan distributed over executors. */
  def topKCosine(df: DataFrame, vecCol: String, idCol: String,
                 query: Seq[Double], k: Int): DataFrame = {
    val qArr = array(query.map(lit): _*)
    df.select(col(idCol),
        round(cosine(col(vecCol), qArr), 4).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Sign-bucket key over the first `bits` dimensions — the degenerate
    * (axis-aligned) random-hyperplane LSH. Exact duplicates always share
    * a bucket, so recall for exact-dup mining is 1. */
  def signBucket(vecColName: String, bits: Int): Column = {
    val v = vecColName
    expr((0 until bits).map(i =>
      s"(case when element_at($v, ${i + 1}) >= 0 then ${1 << i} else 0 end)")
      .mkString("(", " + ", ")")).cast("int")
  }

  /** Near-duplicate vector pairs: bucket on sign pattern, verify cosine
    * within buckets. Shuffles (bucket, id, vec); the verify join is an
    * equi-join on the bucket key. */
  def embedDupPairs(df: DataFrame, vecCol: String, idCol: String,
                    bits: Int, minCos: Double): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol).as("_v"),
      signBucket(vecCol, bits).as("_bkt"))
    val a = bucketed.select(col(idCol).as("id_a"), col("_v").as("_va"), col("_bkt"))
    val b = bucketed.select(col(idCol).as("id_b"), col("_v").as("_vb"), col("_bkt"))
    a.join(b, Seq("_bkt"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("_va"), col("_vb")), 4).as("cos"))
      .where(col("cos") >= minCos)
  }

  /** Per-vector linear int8 quantization — the 4× storage/bandwidth cut a
    * 100 TB embedding store takes for ANN shortlists (re-rank on full
    * precision happens only for the top candidates). Codes are
    * `round((x − min) / (max − min) · 255) ∈ [0, 255]` per vector;
    * constant vectors map to code 0. Pure per-row codegen'd expressions —
    * both the quantization and its (min, max) scale factors are
    * engine-portable arithmetic, so the whole transform is oracle-checkable.
    */
  def quantizeInt8(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).as("_v"))
      .withColumn("_mn", expr("cast(array_min(_v) as double)"))
      .withColumn("_mx", expr("cast(array_max(_v) as double)"))
      .withColumn("codes", expr(
        """transform(_v, x -> cast(if(_mx = _mn, 0,
          |  round((cast(x as double) - _mn) / (_mx - _mn) * 255)) as int))""".stripMargin))

  /** IVF-style ANN: deterministic hash-seeded centroids (no iterative
    * k-means — centroids are `nCentroids` sampled vectors by id hash),
    * vectors assigned to nearest centroid, query probes the `nProbe`
    * nearest centroid cells only. Returns (id, cos) top-k from the probed
    * cells — sub-linear scan at scale; recall depends on nProbe. With
    * `nProbe == nCentroids` every cell is probed and the result equals
    * exact brute force (the oracle-able configuration).
    *
    * The centroid table travels to executors as ONE broadcast row holding
    * `array<struct<cid, cv, cn>>` (id, vector, precomputed norm) — data,
    * not SQL text — so `nCentroids` can reach the thousands a real index
    * needs without hitting codegen/parser limits. Only the nProbe cell
    * selection is driver math, over the O(nCentroids) collected sample.
    */
  def topKCosineIvf(df: DataFrame, vecCol: String, idCol: String,
                    query: Seq[Double], k: Int,
                    nCentroids: Int, nProbe: Int): DataFrame = {
    // centroids: the nCentroids rows with smallest id-hash (deterministic sample)
    val cents = df.select(col(idCol).as("_cid"), col(vecCol).as("_cv"))
      .orderBy(TextOps.hash60(col("_cid").cast("string")), col("_cid"))
      .limit(nCentroids)
    // query-side: pick the nProbe centroids nearest the query (driver math —
    // centroid count is tiny and this mirrors a real IVF probe)
    val centRows = cents.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val probed = centRows.sortBy { case (id, c) => (-cos(c, query), id) }
      .take(nProbe).map(_._1).toSeq
    // assignment: one broadcast row of sorted (cid, cv, norm) structs;
    // per-vector argmax over it, with first-wins tie-breaking on the
    // cid-sorted array. Built from the ALREADY-COLLECTED sample — reusing
    // the `cents` plan here would re-run the full-table TakeOrdered scan a
    // second time at execution.
    val spark = df.sparkSession
    import spark.implicits._
    val centsRow = centRows.sortBy(_._1).toSeq.toDF("cid", "cv")
      .select(struct(col("cid"), col("cv"),
        sqrt(aggregate(transform(col("cv"), x => x * x), lit(0.0), (a, v) => a + v))
          .as("cn")).as("_c"))
      .agg(sort_array(collect_list(col("_c"))).as("_cents"))
    val withCands = df.crossJoin(broadcast(centsRow))
      .withColumn("_vn", l2norm(col(vecCol)))
      .withColumn("_cands", expr(
        s"""transform(_cents, s -> struct(s.cid as cid,
           | aggregate(zip_with($vecCol, s.cv, (x, y) -> cast(x as double) * cast(y as double)),
           |   cast(0.0 as double), (a, b) -> a + b) / (_vn * s.cn) as sim))""".stripMargin))
      .withColumn("_cell", expr(
        "aggregate(_cands, struct(cast(-1 as bigint) as cid, cast(-2.0 as double) as best)," +
          " (acc, c) -> if(c.sim > acc.best, struct(c.cid as cid, c.sim as best), acc)).cid"))
    withCands
      .where(col("_cell").isin(probed: _*))
      .select(col(idCol), round(cosine(col(vecCol),
        array(query.map(lit): _*)), 4).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }
}
