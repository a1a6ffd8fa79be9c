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

  /** NULL (not an ANSI divide-by-zero error, not NaN) when either vector
    * has zero norm — nulls sort LAST under `desc`, so degenerate vectors
    * rank below every real match in both the brute-force and IVF paths.
    * Runs through the NATIVE `cosine_sim` expression
    * ([[graft.functions.CosineSim]] — one fused loop for the dot product
    * and both norms instead of three HigherOrderFunction rescans;
    * bit-identical scores, equivalence spec-pinned). Callers passing
    * double-literal query arrays are unchanged: the expression accepts
    * float and double element types on either side. */
  def cosine(a: Column, b: Column): Column = {
    call_function("cosine_sim", a, b)
  }

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

  /** BATCH top-k: one corpus scan answers `nQueries` queries at once — the
    * production ANN shape (requests arrive in batches; per-query scans
    * would rescan the corpus Q times). Queries are a deterministic
    * hash-ordered sample (SQL-mirrorable) broadcast against the corpus;
    * ranking runs through [[graft.operators.Ops.topKPerGroup]]'s two-level
    * decomposition, so no single task ever sorts a whole query's scores —
    * the formulation that survives a 100 TB corpus with thousands of
    * concurrent queries. */
  def topKCosineBatch(df: DataFrame, vecCol: String, idCol: String,
                      querySrc: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qs: Seq[(Long, Seq[Double])] = querySrc
      .select(col(idCol).as("_qid"), col(vecCol).as("_qv"))
      .orderBy(TextOps.hash60(col("_qid").cast("string")), col("_qid"))
      .limit(nQueries)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val qDf = broadcast(qs.toDF("q_id", "_qv"))
    val scored = df.select(col(idCol), col(vecCol).as("_v"))
      .crossJoin(qDf)
      .select(col("q_id"), col(idCol),
        round(cosine(col("_v"), col("_qv")), 4).as("cos"))
    graft.operators.Ops.topKPerGroup(scored, Seq("q_id"),
        Seq(col("cos").desc, col(idCol)), k)
      .select(col("q_id"), col(idCol), col("cos"))
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

  /** SemDeDup-shaped semantic dedup: cluster-scoped near-duplicate pair
    * mining. Deterministic hash-sampled centroids (the [[pqCodebook]]
    * sampling procedure — SQL-mirrorable, unlike trained k-means), every
    * corpus vector assigned to its max-cosine cell (ties to the smallest
    * cell id), and pairs verified ONLY within a cell.
    *
    * Scale shape: the quadratic verify term is bounded by the largest
    * CELL, never the corpus — with `nCells ∝ √n` the expected pair count
    * stays linear-ish in n; assignment is one broadcast-centroid scan (no
    * shuffle) and the verify join shuffles (cell, id, vec) once on the
    * cell key. This is the semantic sibling of [[embedDupPairs]]'s
    * sign-bucket LSH: cells follow the DATA distribution, so near-dups
    * that straddle a sign boundary (the LSH miss mode) still collide.
    */
  def semanticDupPairs(df: DataFrame, vecCol: String, idCol: String,
                       centroidSrc: DataFrame, nCells: Int,
                       minCos: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents: Seq[(Int, Seq[Double])] = centroidSrc
      .select(col(vecCol).as("_cv"), col(idCol).as("_cid"))
      .orderBy(TextOps.hash60(col("_cid").cast("string")), col("_cid"))
      .limit(nCells)
      .collect().toSeq.zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Float](0).map(_.toDouble)) }
    val centsDf = broadcast(cents.toDF("_c", "_cv"))
    // argmax-cosine assignment via max(struct(cos, -c)): struct ordering
    // compares the (bit-identical, double) cosine first, then the negated
    // cell id — ties land on the SMALLEST cell, matching the oracle's
    // `row_number() OVER (ORDER BY cos DESC, c) = 1`
    val assigned = df.select(col(idCol), col(vecCol).as("_v"))
      .crossJoin(centsDf)
      .groupBy(col(idCol))
      .agg(first(col("_v")).as("_v"),
        max(struct(cosine(col("_v"), col("_cv")).as("_cos"),
          (-col("_c")).as("_negc"))).as("_m"))
      .select(col(idCol), col("_v"), (-col("_m._negc")).as("_cell"))
    val a = assigned.select(col(idCol).as("id_a"), col("_v").as("_va"), col("_cell"))
    val b = assigned.select(col(idCol).as("id_b"), col("_v").as("_vb"), col("_cell"))
    a.join(b, Seq("_cell"))
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

  /** Product quantization — the storage tier below [[quantizeInt8]]: the
    * `dim`-dim vector splits into `nSub` subspaces of `dim/nSub` dims; each
    * subspace quantizes to the 1-BASED index of the nearest (squared-L2) of
    * `nCode` codewords, so a 64-dim float vector becomes `nSub` small ints
    * (32× compression at 8×16) and ANN shortlists score against codebook
    * distance tables instead of raw floats.
    *
    * Codebooks are the subspace slices of `nCode` deterministic hash-seeded
    * sample vectors (no iterative k-means — same sampling as
    * [[buildIvfIndex]], collected ONCE at O(nCode) driver cost) and travel
    * as ONE broadcast data row; encoding is a pure per-row codegen'd
    * expression — linear scan, no shuffle, no UDF. Ties break to the
    * smallest code (strict `<` fold), which an oracle mirrors with
    * `min_by(c, (dist, c))`.
    */
  /** Codebook = subspace slices of `nCode` deterministic hash-seeded
    * sample vectors, as one single-row broadcastable frame (column `_cb`).
    * Shared by [[pqEncode]] and [[pqReconError]] so the sample scan runs
    * with one definition — and so the two paths can never drift. */
  private def pqCodebook(df: DataFrame, vecCol: String, idCol: String,
                         nCode: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cb: Seq[Seq[Double]] = df
      .select(col(vecCol).as("_cv"), col(idCol).as("_cid"))
      .orderBy(TextOps.hash60(col("_cid").cast("string")), col("_cid"))
      .limit(nCode)
      .collect().toSeq.map(_.getSeq[Float](0).map(_.toDouble))
    Seq(Tuple1(cb)).toDF("_cb")
  }

  /** Lloyd-trained PQ codebook: start from the deterministic hash-sample
    * ([[pqCodebook]]) and run `iters` k-means rounds INDEPENDENTLY per
    * subspace — assign each training slice to its nearest codeword
    * (squared L2, the [[pqEncode]] distance), recompute codewords as the
    * element-wise mean of their assigned slices (one groupBy shuffle per
    * round), keep the previous codeword for empty clusters. Training runs
    * over the `trainRows` smallest-id-hash rows, so the per-round cost is
    * bounded at ANY corpus size — the train-on-sample contract every
    * production PQ implementation uses; the driver only ever holds
    * nSub×nCode×(dim/nSub) doubles. Returns the same one-row `_cb` frame
    * as the untrained codebook, so every consumer works unchanged. */
  def pqTrainCodebook(df: DataFrame, vecCol: String, idCol: String,
                      dim: Int, nSub: Int, nCode: Int, iters: Int = 2,
                      trainRows: Int = 65536): DataFrame = {
    require(dim % nSub == 0, s"dim $dim not divisible by nSub $nSub")
    val dsub = dim / nSub
    val spark = df.sparkSession
    import spark.implicits._
    var cb: Seq[Seq[Double]] = df
      .select(col(vecCol).as("_cv"), col(idCol).as("_cid"))
      .orderBy(TextOps.hash60(col("_cid").cast("string")), col("_cid"))
      .limit(nCode)
      .collect().toSeq.map(_.getSeq[Float](0).map(_.toDouble))
    val slices = df
      .select(col(vecCol).as("_tv"), col(idCol).as("_tid"))
      .orderBy(TextOps.hash60(col("_tid").cast("string")), col("_tid"))
      .limit(trainRows)
      .select(explode(expr(
        s"""transform(sequence(1, $nSub), s -> struct(s as s,
           |  transform(slice(_tv, (s - 1) * $dsub + 1, $dsub),
           |    x -> cast(x as double)) as sl))""".stripMargin)).as("_e"))
      .select(col("_e.s").as("s"), col("_e.sl").as("sl"))
      .cache()
    try {
      for (_ <- 0 until iters) {
        val cbRow = Seq(Tuple1(cb)).toDF("_cb")
        val means = slices.crossJoin(broadcast(cbRow))
          .withColumn("c", expr(
            s"""aggregate(
               |  zip_with(_cb, sequence(1, $nCode), (cv, c) -> struct(c as c,
               |    aggregate(zip_with(sl, slice(cv, (s - 1) * $dsub + 1, $dsub),
               |      (x, y) -> (x - y) * (x - y)),
               |      cast(0.0 as double), (a, v) -> a + v) as d)),
               |  struct(cast(0 as int) as c, cast('Infinity' as double) as d),
               |  (acc, e) -> if(e.d < acc.d, e, acc)).c""".stripMargin))
          .select(col("s"), col("c"), posexplode(col("sl")).as(Seq("pos", "x")))
          .groupBy("s", "c", "pos").agg(avg(col("x")).as("m"))
          .collect()
          .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
          .toMap
        cb = cb.zipWithIndex.map { case (cw, ci) =>
          val c = ci + 1 // codes are 1-based
          (0 until nSub).flatMap { si =>
            val s = si + 1
            if (means.contains((s, c, 0))) (0 until dsub).map(p => means((s, c, p)))
            else cw.slice(si * dsub, (si + 1) * dsub) // empty cluster: keep
          }
        }
      }
    } finally { slices.unpersist(); () }
    Seq(Tuple1(cb)).toDF("_cb")
  }

  /** Encoding runs through the NATIVE `pq_encode` expression
    * ([[graft.functions.PqEncodeExpr]] — one flat primitive loop per row,
    * bit-identical to the portable lambda chain the equivalence spec
    * pins, so the DuckDB oracle contract is unchanged). */
  def pqEncode(df: DataFrame, vecCol: String, idCol: String,
               dim: Int, nSub: Int, nCode: Int,
               codebook: Option[DataFrame] = None): DataFrame = {
    require(dim % nSub == 0, s"dim $dim not divisible by nSub $nSub")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val cbRow = codebook.getOrElse(pqCodebook(df, vecCol, idCol, nCode))
    df.crossJoin(broadcast(cbRow))
      .withColumn("codes",
        call_function("pq_encode", col(vecCol), col("_cb"), lit(nSub)))
      .drop("_cb")
  }

  /** Decode [[pqEncode]] codes back to the codebook reconstruction (for
    * error measurement / re-rank shortlists). Needs the same df the codes
    * were built from only for the codebook sample — pass the codebook
    * explicitly at scale. */
  def pqReconError(encoded: DataFrame, original: DataFrame, vecCol: String,
                   idCol: String, dim: Int, nSub: Int, nCode: Int,
                   codebook: Option[DataFrame] = None): DataFrame = {
    require(dim % nSub == 0, s"dim $dim not divisible by nSub $nSub")
    val dsub = dim / nSub
    val cbRow = codebook.getOrElse(pqCodebook(original, vecCol, idCol, nCode))
    encoded.select(col(idCol), col("codes"))
      .join(original.select(col(idCol), col(vecCol)), Seq(idCol))
      .crossJoin(broadcast(cbRow))
      .withColumn("_err", expr(
        s"""aggregate(transform(sequence(1, $nSub), s ->
           |  aggregate(
           |    zip_with(slice($vecCol, (s - 1) * $dsub + 1, $dsub),
           |             slice(element_at(_cb, element_at(codes, s)),
           |                   (s - 1) * $dsub + 1, $dsub),
           |      (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),
           |    cast(0.0 as double), (a, v) -> a + v)),
           |  cast(0.0 as double), (a, v) -> a + v) / $dim""".stripMargin))
      .drop("_cb")
  }

  // ---- persisted IVF ANN index (build once, query many) -----------------

  private def cosDriver(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  /** Nearest-centroid cell per vector, through the native
    * [[graft.functions.NearestCellExpr]] — one flat primitive loop per row
    * over centroids unboxed ONCE per operator (the previous
    * HigherOrderFunction chain re-walked the centroid struct array with
    * boxed accumulators per row: a ~280 s assignment pass at 10^6×256,
    * now scan-bound). Semantics are bit-identical: a NaN/undefined cosine
    * (zero-norm vector or centroid) scores −1e308 so every vector lands
    * in a real cell, and strict `>` over the cid-sorted array makes the
    * smallest cid win ties. */
  private def assignCells(df: DataFrame, vecCol: String,
                          centRows: Seq[(Long, Seq[Double])]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val sorted = centRows.sortBy(_._1)
    val cidsLit = Literal.create(sorted.map(_._1), ArrayType(LongType))
    val cvsLit = Literal.create(sorted.map(_._2),
      ArrayType(ArrayType(DoubleType)))
    df.withColumn("_cell", org.apache.spark.sql.graft.GraftSqlShim.column(
      graft.functions.NearestCellExpr(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(vecCol)),
        cidsLit, cvsLit)))
  }

  /** Build an IVF index over an embedding table — the ONE full-table pass a
    * real ANN service pays at build time, never per query:
    *   - `<indexDir>/centroids`: `nCentroids` deterministic hash-seeded
    *     sample vectors `(cid, cv)` (no iterative k-means — SURVEY.md §2.9),
    *   - `<indexDir>/assign`: every corpus vector with its nearest-centroid
    *     cell, PARTITIONED BY cell — a probe-limited query is literally a
    *     partition-pruned scan, the file-skipping analog of probing an
    *     inverted list.
    */
  def buildIvfIndex(df: DataFrame, vecCol: String, idCol: String,
                    nCentroids: Int, indexDir: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    // deterministic sample: the nCentroids rows with smallest id-hash.
    // Collected ONCE here (O(nCentroids) driver memory) — the build cost.
    val centRows: Seq[(Long, Seq[Double])] = df
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"))
      .orderBy(TextOps.hash60(col("_cid").cast("string")), col("_cid"))
      .limit(nCentroids)
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    centRows.toDF("cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
    // repartition ON the cell key first: each cell's rows land in exactly
    // one task, so each cell directory holds ONE file — a probe-limited
    // query opens nProbe files, not nProbe × writer-parallelism shards
    assignCells(df, vecCol, centRows)
      .select(col(idCol), col(vecCol).as("vec"), col("_cell").as("cell"))
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$indexDir/assign")
  }

  private def watermarkFile(indexDir: String): java.nio.file.Path =
    java.nio.file.Paths.get(indexDir, "watermark.txt")

  /** [[buildIvfIndex]] bound to a graft TABLE: index the live rows as of
    * the table's current snapshot and record that snapshot as the index
    * WATERMARK (`<indexDir>/watermark.txt`) — the resume point
    * [[refreshIvfIndex]] maintains. The snapshot id is pinned BEFORE the
    * scan and the scan reads AT it, so a concurrent append lands entirely
    * above the watermark (indexed by the next refresh, never twice). */
  def buildIvfIndexForTable(spark: org.apache.spark.sql.SparkSession,
                            tableDir: String, vecCol: String, idCol: String,
                            nCentroids: Int, indexDir: String): Unit = {
    val snap = graft.meta.SnapshotLog(tableDir).lastSnapshotId
    buildIvfIndex(graft.read.MorReader.readAt(spark, tableDir, snap),
      vecCol, idCol, nCentroids, indexDir)
    java.nio.file.Files.writeString(watermarkFile(indexDir), snap.toString)
  }

  /** Incremental IVF maintenance — the build-once index keeps serving
    * under continuous ingest WITHOUT a full rebuild: assign ONLY the rows
    * appended since the watermark ([[graft.read.MorReader.appendsBetween]]
    * — its plan touches the new files alone, never the indexed history)
    * against the EXISTING centroids, append them to the cell-partitioned
    * assignment table, and advance the watermark. Compaction snapshots in
    * the window contribute nothing (rewrites re-express indexed rows).
    * Rows DELETED since the build stay in the assignment table until the
    * next full rebuild — the standard ANN staleness contract; callers who
    * need delete-exactness anti-join query results against the live table.
    * At 100 TB this is the difference between a per-batch index cost of
    * O(delta) and O(corpus). */
  def refreshIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      tableDir: String, vecCol: String, idCol: String,
                      indexDir: String): Unit = {
    val wm = watermarkFile(indexDir)
    require(java.nio.file.Files.exists(wm),
      s"$indexDir has no watermark — build with buildIvfIndexForTable first")
    val from = java.nio.file.Files.readString(wm).trim.toLong
    val st = graft.meta.SnapshotLog(tableDir).load()
    val to = st.snapshots.lastOption.map(_.id).getOrElse(0L)
    if (to == from) return
    // expiry past the watermark folds unindexed appends into a rebased
    // "replace" baseline the incremental scan rightly skips — detectable
    // because the watermark snapshot id is gone from retained history.
    // Refusing loudly beats silently serving an index with holes.
    require(st.snapshots.exists(_.id == from),
      s"index watermark $from predates the table's retained history " +
        "(snapshot expiry crossed it) — rebuild with buildIvfIndexForTable")
    val delta = graft.read.MorReader.appendsBetween(spark, tableDir, from, to)
    val centRows: Seq[(Long, Seq[Double])] =
      spark.read.parquet(s"$indexDir/centroids").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    assignCells(delta, vecCol, centRows)
      .select(col(idCol), col(vecCol).as("vec"), col("_cell").as("cell"))
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("append").parquet(s"$indexDir/assign")
    java.nio.file.Files.writeString(wm, to.toString)
  }

  /** Query a [[buildIvfIndex]] index: rank centroids against the query
    * (driver math over the O(nCentroids) centroid table — the corpus is
    * never scanned, never re-sampled), then top-k cosine over the `nProbe`
    * nearest cells only — a partition-pruned scan of the assignment table.
    * With `nProbe == nCentroids` every cell is probed and the result equals
    * exact brute force (the oracle-able configuration; zero-norm vectors
    * get a NULL cosine from [[cosine]]'s `try_divide` and sort last in
    * BOTH paths — spec-gated). */
  def queryIvf(spark: org.apache.spark.sql.SparkSession, indexDir: String,
               idCol: String, query: Seq[Double], k: Int, nProbe: Int): DataFrame =
    queryIvf(openIvfIndex(spark, indexDir), idCol, query, k, nProbe)

  /** An OPENED IVF index: centroids resident on the driver, the
    * cell-partitioned assignment relation planned once. A query service
    * holds one of these — partition discovery (an O(nCells) listing job)
    * and the centroid read are paid at open, never per query. */
  final case class IvfIndex(centroids: Seq[(Long, Seq[Double])],
                            assign: DataFrame)

  def openIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String): IvfIndex = {
    val centRows = spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    IvfIndex(centRows, spark.read.parquet(s"$indexDir/assign"))
  }

  /** Probe an opened index: rank centroids against the query (driver math
    * over O(nCentroids)), then top-k cosine over the `nProbe` nearest
    * cells — a partition-pruned scan that opens nProbe files. */
  def queryIvf(idx: IvfIndex, idCol: String, query: Seq[Double],
               k: Int, nProbe: Int): DataFrame = {
    val probed = idx.centroids
      .sortBy { case (cid, c) => (-cosDriver(c, query), cid) }
      .take(nProbe).map(_._1)
    idx.assign
      .where(col("cell").isin(probed: _*))
      .select(col(idCol), round(cosine(col("vec"),
        array(query.map(lit): _*)), 4).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  // ---- persisted PQ index + ADC re-rank query ---------------------------

  /** Persist the PQ index: the codes table ([[pqEncode]] output — nSub
    * small ints per vector instead of `dim` floats, the scan compression
    * that makes PQ an index) plus the codebook, both built ONCE. The
    * codebook is Lloyd-TRAINED ([[pqTrainCodebook]], `trainIters` rounds)
    * by default — measurably tighter quantization cells than the raw
    * hash-sample, which is what shortlist recall at realistic sizes rides
    * on; `trainIters = 0` keeps the untrained sample. */
  def buildPqIndex(df: DataFrame, vecCol: String, idCol: String,
                   dim: Int, nSub: Int, nCode: Int, indexDir: String,
                   trainIters: Int = 2): Unit = {
    val cb =
      if (trainIters > 0)
        pqTrainCodebook(df, vecCol, idCol, dim, nSub, nCode, trainIters)
      else pqCodebook(df, vecCol, idCol, nCode)
    pqEncode(df, vecCol, idCol, dim, nSub, nCode, Some(cb))
      .select(col(idCol), col("codes"))
      .write.mode("overwrite").parquet(s"$indexDir/codes")
    cb.write.mode("overwrite").parquet(s"$indexDir/codebook")
  }

  /** [[buildPqIndex]] bound to a graft TABLE, with a snapshot watermark
    * (`<indexDir>/watermark.txt`) for [[refreshPqIndex]] — same contract
    * as [[buildIvfIndexForTable]]. */
  def buildPqIndexForTable(spark: org.apache.spark.sql.SparkSession,
                           tableDir: String, vecCol: String, idCol: String,
                           dim: Int, nSub: Int, nCode: Int, indexDir: String,
                           trainIters: Int = 2): Unit = {
    val snap = graft.meta.SnapshotLog(tableDir).lastSnapshotId
    buildPqIndex(graft.read.MorReader.readAt(spark, tableDir, snap),
      vecCol, idCol, dim, nSub, nCode, indexDir, trainIters)
    java.nio.file.Files.writeString(watermarkFile(indexDir), snap.toString)
  }

  /** Incremental PQ maintenance: encode ONLY the rows appended since the
    * watermark against the PERSISTED codebook (codebooks are trained once;
    * retraining would re-encode the corpus — the rebuild path), append
    * their codes, advance the watermark. O(delta) per refresh, same
    * staleness contract as [[refreshIvfIndex]]. */
  def refreshPqIndex(spark: org.apache.spark.sql.SparkSession,
                     tableDir: String, vecCol: String, idCol: String,
                     dim: Int, nSub: Int, indexDir: String): Unit = {
    val wm = watermarkFile(indexDir)
    require(java.nio.file.Files.exists(wm),
      s"$indexDir has no watermark — build with buildPqIndexForTable first")
    val from = java.nio.file.Files.readString(wm).trim.toLong
    val st = graft.meta.SnapshotLog(tableDir).load()
    val to = st.snapshots.lastOption.map(_.id).getOrElse(0L)
    if (to == from) return
    require(st.snapshots.exists(_.id == from), // see refreshIvfIndex
      s"index watermark $from predates the table's retained history " +
        "(snapshot expiry crossed it) — rebuild with buildPqIndexForTable")
    val delta = graft.read.MorReader.appendsBetween(spark, tableDir, from, to)
    val cb = spark.read.parquet(s"$indexDir/codebook")
    val nCode = cb.head().getSeq[scala.collection.Seq[Double]](0).size
    pqEncode(delta, vecCol, idCol, dim, nSub, nCode, Some(cb))
      .select(col(idCol), col("codes"))
      .write.mode("append").parquet(s"$indexDir/codes")
    java.nio.file.Files.writeString(wm, to.toString)
  }

  /** ADC (asymmetric distance computation) query over a [[buildPqIndex]]
    * index, with exact re-rank: approximate cosine comes from the CODES
    * ALONE via per-subspace lookup tables — `dt(s)(c) = q_s · cb(c)_s`
    * and the codebook partial norms, nSub×nCode doubles of driver math
    * broadcast as one data row (never SQL literals) — so the first pass
    * scans ~nSub bytes per vector. The `shortlist` best approximate ids
    * then re-rank EXACTLY against the original vectors (an equi-join that
    * touches only the shortlist). `shortlist` ≥ corpus size makes the
    * result identical to [[topKCosine]] — the oracle-able configuration;
    * recall at realistic shortlists is spec-tested. Zero-norm vectors get
    * NULL from `try_divide` in both passes and sort last. */
  def queryPqRerank(df: DataFrame, vecCol: String, idCol: String,
                    indexDir: String, query: Seq[Double], k: Int,
                    shortlist: Int): DataFrame = {
    val spark = df.sparkSession
    val cb = loadCodebook(spark, indexDir, query.length)
    val nSub = {
      // nSub is recovered from the codes table schema-free way: encode
      // used dim/nSub-sized slices, so any divisor works only if it
      // matches the written codes — read one row and trust its length
      spark.read.parquet(s"$indexDir/codes").select("codes")
        .head().getSeq[Int](0).size
    }
    val shortIds =
      adcShortlist(spark.read.parquet(s"$indexDir/codes"), cb, nSub,
        idCol, query, shortlist)
    topKCosine(df.join(shortIds, Seq(idCol)), vecCol, idCol, query, k)
  }

  private def loadCodebook(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String, dim: Int): Seq[Seq[Double]] = {
    val cb: Seq[Seq[Double]] = spark.read.parquet(s"$indexDir/codebook")
      .head().getSeq[scala.collection.Seq[Double]](0).map(_.toSeq)
    require(cb.forall(_.size == dim), s"codebook dim mismatch vs query $dim")
    cb
  }

  /** The ADC first pass shared by [[queryPqRerank]] and [[queryIvfPq]]:
    * score `codes` rows by approximate cosine from per-subspace lookup
    * tables (`dt(s)(c) = q_s · cb(c)_s` plus codebook partial norms —
    * nSub×nCode doubles of driver math broadcast as one data row, never
    * SQL literals) and return the `shortlist` best ids. The scan reads
    * ~nSub small ints per vector — the compression that makes PQ an
    * index. NULL `_asim` (zero-norm) sorts last. */
  private def adcShortlist(codes: DataFrame, cb: Seq[Seq[Double]], nSub: Int,
                           idCol: String, query: Seq[Double],
                           shortlist: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val dim = query.length
    val dsub = dim / nSub
    def slice(v: Seq[Double], s: Int) = v.slice(s * dsub, (s + 1) * dsub)
    val dt: Seq[Seq[Double]] = (0 until nSub).map(s =>
      cb.map(c => slice(c, s).zip(slice(query, s)).map { case (x, q) => x * q }.sum))
    val nt: Seq[Seq[Double]] = (0 until nSub).map(s =>
      cb.map(c => slice(c, s).map(x => x * x).sum))
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val tabRow = Seq((dt, nt)).toDF("_dt", "_nt")
    codes
      .crossJoin(broadcast(tabRow))
      .withColumn("_adot", expr(
        s"""aggregate(sequence(1, $nSub), cast(0.0 as double),
           | (a, s) -> a + element_at(element_at(_dt, s), element_at(codes, s)))""".stripMargin))
      .withColumn("_anrm", expr(
        s"""sqrt(aggregate(sequence(1, $nSub), cast(0.0 as double),
           | (a, s) -> a + element_at(element_at(_nt, s), element_at(codes, s))))""".stripMargin))
      .withColumn("_asim", try_divide(col("_adot"), col("_anrm") * lit(qNorm)))
      .orderBy(desc_nulls_last("_asim"), col(idCol))
      .limit(shortlist)
      .select(col(idCol))
  }

  // ---- IVF-PQ: cell-partitioned codes, the composed 100 TB ANN path ----

  /** Build the COMPOSED IVF-PQ index (the FAISS `IVFPQ` shape, non-residual
    * encoding): one corpus pass assigns every vector to its nearest
    * centroid cell ([[buildIvfIndex]]'s coarse quantizer) AND PQ-encodes it
    * against a Lloyd-trained codebook ([[buildPqIndex]]'s compression), and
    * the codes land PARTITIONED BY CELL. A query then combines both
    * prunings: probe `nProbe` cells (a partition-pruned scan — the
    * inverted-list analog), ADC-score only those cells' CODES (~nSub bytes
    * per vector instead of `dim` floats), and exact-re-rank the shortlist.
    * At 100 TB that is the difference between scanning the corpus and
    * scanning `nProbe/nCentroids` of a 32×-compressed representation —
    * neither index alone gives both factors.
    *
    * Layout: `<indexDir>/centroids`, `<indexDir>/codebook`,
    * `<indexDir>/codes` (id, codes, cell=...). Unlike [[buildIvfIndex]]
    * the raw vectors are NOT duplicated into the index — the exact re-rank
    * joins the shortlist back to the corpus by id, the production shape
    * (an index that re-stores 100 TB of floats isn't an index). */
  def buildIvfPqIndex(df: DataFrame, vecCol: String, idCol: String,
                      nCentroids: Int, dim: Int, nSub: Int, nCode: Int,
                      indexDir: String, trainIters: Int = 2): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val centRows: Seq[(Long, Seq[Double])] = df
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"))
      .orderBy(TextOps.hash60(col("_cid").cast("string")), col("_cid"))
      .limit(nCentroids)
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    centRows.toDF("cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
    val cb =
      if (trainIters > 0)
        pqTrainCodebook(df, vecCol, idCol, dim, nSub, nCode, trainIters)
      else pqCodebook(df, vecCol, idCol, nCode)
    cb.write.mode("overwrite").parquet(s"$indexDir/codebook")
    pqEncode(assignCells(df, vecCol, centRows), vecCol, idCol,
      dim, nSub, nCode, Some(cb))
      .select(col(idCol), col("codes"), col("_cell").as("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$indexDir/codes")
  }

  /** [[buildIvfPqIndex]] bound to a graft TABLE with a snapshot watermark —
    * same contract as [[buildIvfIndexForTable]]. */
  def buildIvfPqIndexForTable(spark: org.apache.spark.sql.SparkSession,
                              tableDir: String, vecCol: String, idCol: String,
                              nCentroids: Int, dim: Int, nSub: Int, nCode: Int,
                              indexDir: String, trainIters: Int = 2): Unit = {
    val snap = graft.meta.SnapshotLog(tableDir).lastSnapshotId
    buildIvfPqIndex(graft.read.MorReader.readAt(spark, tableDir, snap),
      vecCol, idCol, nCentroids, dim, nSub, nCode, indexDir, trainIters)
    java.nio.file.Files.writeString(watermarkFile(indexDir), snap.toString)
  }

  /** Incremental IVF-PQ maintenance: the delta rows since the watermark
    * ([[graft.read.MorReader.appendsBetween]] — new files only) are
    * assigned against the EXISTING centroids and encoded against the
    * PERSISTED codebook in one pass, appended to the cell-partitioned
    * codes, and the watermark advances. O(delta) per refresh; same
    * staleness/expiry contract as [[refreshIvfIndex]]. */
  def refreshIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                        tableDir: String, vecCol: String, idCol: String,
                        dim: Int, nSub: Int, indexDir: String): Unit = {
    val wm = watermarkFile(indexDir)
    require(java.nio.file.Files.exists(wm),
      s"$indexDir has no watermark — build with buildIvfPqIndexForTable first")
    val from = java.nio.file.Files.readString(wm).trim.toLong
    val st = graft.meta.SnapshotLog(tableDir).load()
    val to = st.snapshots.lastOption.map(_.id).getOrElse(0L)
    if (to == from) return
    require(st.snapshots.exists(_.id == from), // see refreshIvfIndex
      s"index watermark $from predates the table's retained history " +
        "(snapshot expiry crossed it) — rebuild with buildIvfPqIndexForTable")
    val delta = graft.read.MorReader.appendsBetween(spark, tableDir, from, to)
    val centRows: Seq[(Long, Seq[Double])] =
      spark.read.parquet(s"$indexDir/centroids").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val cb = spark.read.parquet(s"$indexDir/codebook")
    val nCode = cb.head().getSeq[scala.collection.Seq[Double]](0).size
    pqEncode(assignCells(delta, vecCol, centRows), vecCol, idCol,
      dim, nSub, nCode, Some(cb))
      .select(col(idCol), col("codes"), col("_cell").as("cell"))
      .write.partitionBy("cell").mode("append").parquet(s"$indexDir/codes")
    java.nio.file.Files.writeString(wm, to.toString)
  }

  /** Query a [[buildIvfPqIndex]] index: rank centroids against the query
    * (driver math), partition-prune the codes scan to the `nProbe` nearest
    * cells, ADC-score those codes, exact-re-rank the `shortlist` best ids
    * against the corpus `df` (an id equi-join — the only time raw vectors
    * are touched). `nProbe == nCentroids` + `shortlist` ≥ corpus makes the
    * result exactly [[topKCosine]] (the oracle-able configuration);
    * realistic probe/shortlist recall is spec-tested. */
  def queryIvfPq(df: DataFrame, vecCol: String, idCol: String,
                 indexDir: String, query: Seq[Double], k: Int,
                 nProbe: Int, shortlist: Int): DataFrame = {
    val spark = df.sparkSession
    val centRows = spark.read.parquet(s"$indexDir/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val probed = centRows.sortBy { case (cid, c) => (-cosDriver(c, query), cid) }
      .take(nProbe).map(_._1).toSeq
    val cb = loadCodebook(spark, indexDir, query.length)
    val allCodes = spark.read.parquet(s"$indexDir/codes")
    val nSub = allCodes.select("codes").head().getSeq[Int](0).size
    val shortIds = adcShortlist(allCodes.where(col("cell").isin(probed: _*)),
      cb, nSub, idCol, query, shortlist)
    topKCosine(df.join(shortIds, Seq(idCol)), vecCol, idCol, query, k)
  }

  /** Upper-triangular gramian Σ xᵢ·xⱼ of an embedding column — the one-pass
    * distributed primitive under PCA / whitening / covariance estimation
    * (center first for covariance; the sum structure is identical).
    *
    * Shape: each row expands to its d·(d+1)/2 upper-tri products via a
    * nested `transform` (pure codegen'd expressions, no UDF, no join),
    * then ONE hash aggregation on (i, j) — map-side partial sums mean the
    * shuffle carries d·(d+1)/2 rows per task regardless of row count,
    * which is why this holds at 100 TB while a self-join on the row id
    * (n·d joined rows) would not. Products are computed in double
    * (float→double widening is exact), sums rounded to 4 decimals.
    *
    * Returns (i, j, gram) with 1-based i ≤ j.
    */
  def gramian(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    // Per-partition imperative accumulation (the one place mapPartitions
    // beats expressions): each task folds its rows into ONE flat
    // upper-tri double array, so the shuffle carries one d·(d+1)/2 array
    // PER TASK — not d²/2 rows per input row. An explode-based
    // formulation measured 2.4 s on 2k×64 vectors (4.2M struct
    // allocations through the Generate); this is the treeAggregate shape
    // distributed gramians actually use.
    val partials = df.select(col(vecCol).cast("array<double>").as("v"))
      .as[Seq[Double]]
      .mapPartitions { it =>
        val acc = new Array[Double](tri)
        var any = false
        it.foreach { s =>
          any = true
          val v = s.toArray
          var idx = 0
          var i = 0
          while (i < dim) {
            val vi = v(i)
            var j = i
            while (j < dim) { acc(idx) += vi * v(j); idx += 1; j += 1 }
            i += 1
          }
        }
        if (any) Iterator.single(acc.toSeq) else Iterator.empty
      }
    // final combine over (#tasks × tri) rows — metadata scale
    val sums = partials.select(posexplode(col("value")).as(Seq("pos", "p")))
      .groupBy("pos").agg(sum("p").as("s"))
    // pos → (i, j): same row-major upper-tri order the accumulator used
    val ij = (1 to dim).flatMap(i => (i to dim).map(j => (i, j)))
      .zipWithIndex.map { case ((i, j), pos) => (pos, i, j) }
      .toDF("pos", "i", "j")
    sums.join(broadcast(ij), "pos")
      .select(col("i"), col("j"), round(col("s"), 4).as("gram"))
  }
}
