package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed relational primitives that need more than a single built-in
  * call — each written the way it must work on a 1000-executor cluster.
  */
object Ops {

  /** Global 0-based row index in `sortCols` order WITHOUT a
    * single-partition window (the `Window.orderBy(...)` formulation moves
    * the whole dataset through one task — fine at 60k rows, dead at 100 TB).
    * Here: range-repartition on the sort key (sampled range exchange),
    * sort within partitions, then per-partition offsets via
    * `rdd.zipWithIndex` (one lightweight count job + one attach pass).
    */
  def withGlobalIndex(df: DataFrame, sortCols: Seq[Column],
                      idxName: String): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism, 1)
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(idxName, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** EXACT global running total of `valueCol` in `orderCol` order WITHOUT
    * the single-partition `Window.orderBy(...)` that dies at scale.
    *
    * Two-level decomposition: rows bucket by `orderCol div bucketSize`
    * (order-preserving for a numeric key); the in-bucket cumulative sum is
    * a window PARTITIONED by bucket (parallel across buckets); bucket
    * prefix offsets come from a bucket-level aggregate — thousands of rows
    * at most — whose own running sum is metadata-scale and broadcast back.
    * total = in-bucket cumsum + prefix offset. At 100 TB every data-scale
    * operation stays partitioned; only the bucket summary (|buckets| ≈
    * maxKey/bucketSize) is single-partition.
    */
  def bucketedRunningTotal(df: DataFrame, orderCol: Column, valueCol: Column,
                           bucketSize: Long, totalName: String): DataFrame = {
    // integer `div` for the bucket key — floor(a / b) on doubles loses
    // exactness past 2^53, silently splitting/merging buckets
    val bucketed = df.withColumn("_rt_ord", orderCol.cast("long"))
      .withColumn("_rt_bkt", expr(s"_rt_ord div $bucketSize"))
      .withColumn("_rt_v", valueCol.cast("long"))
    val inBucket = sum(col("_rt_v")).over(
      Window.partitionBy("_rt_bkt").orderBy(orderCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // bucket totals are tiny: the single-partition running sum here is over
    // |buckets| rows, not |rows|
    val offsets = bucketed.groupBy("_rt_bkt")
      .agg(sum("_rt_v").as("_rt_sum"))
      .withColumnRenamed("_rt_bkt", "_rt_obkt")
      .select(col("_rt_obkt"),
        coalesce(sum(col("_rt_sum")).over(
          Window.orderBy("_rt_obkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("_rt_off"))
    bucketed
      .withColumn("_rt_cum", inBucket)
      .join(broadcast(offsets), col("_rt_bkt") === col("_rt_obkt"))
      .withColumn(totalName, col("_rt_cum") + col("_rt_off"))
      .drop("_rt_ord", "_rt_bkt", "_rt_v", "_rt_cum", "_rt_obkt", "_rt_off")
  }

  /** Point-in-interval range join WITHOUT the BroadcastNestedLoopJoin a
    * raw theta-join gets from the planner: both sides bucket on
    * `timestamp div bucketWidth`, the interval side replicating into each
    * bucket it overlaps (≤ ceil(maxIntervalLength / bucketWidth) + 1 rows
    * — pick bucketWidth ≥ the max interval length for a ≤2× expansion),
    * then an ordinary hash equi-join on (equiKeys, bucket) with the exact
    * `[start, end)` residual on top. Every (point, interval) match shares
    * exactly the point's bucket, so no dedup pass is needed. Shuffle is
    * hash-partitioned on the equi keys + bucket — the plan that survives
    * 100 TB, where a nested-loop over points × intervals cannot.
    * Timestamps are plain numeric columns (e.g. epoch micros).
    */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
                        equiKeys: Seq[String], pointTsCol: String,
                        startCol: String, endCol: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_rj_bkt", expr(s"$pointTsCol div $bucketWidth"))
    val iv = intervals.withColumn("_rj_bkt",
      explode(expr(s"sequence($startCol div $bucketWidth, ($endCol - 1) div $bucketWidth)")))
    p.join(iv, equiKeys :+ "_rj_bkt")
      .where(col(pointTsCol) >= col(startCol) && col(pointTsCol) < col(endCol))
      .drop("_rj_bkt")
  }

  /** Skew-resistant equi-join: the large side's key is salted into
    * `saltFactor` buckets and the small side is replicated across every
    * bucket, so one hot key spreads over `saltFactor` tasks instead of
    * hammering one. Result is row-identical to the plain join. (AQE's
    * skew-join handles sort-merge cases adaptively; explicit salting is
    * the deterministic variant that also covers hash joins and custom
    * partitioners.)
    */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, largeKey: String,
                     smallKey: String, saltFactor: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        salted(largeKey) === replicated(smallKey) &&
          salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** EXACT top-k rows per group WITHOUT a per-group single-task window.
    *
    * `Window.partitionBy(group)` moves each group through ONE task — with
    * few/skewed groups (3 return flags over 100 TB) that is a handful of
    * tasks sorting a third of the table each. Two-level decomposition
    * instead: rank within (group, input-partition) first — parallelism =
    * number of data partitions, each sort is partition-local and
    * spill-safe — keep k candidates per (group, partition), then a final
    * rank over candidates only (k × partitions rows per group, metadata
    * scale). Results are identical to the one-window formulation for any
    * TOTAL `sortCols` order (ties must be broken — a non-total order
    * makes both formulations nondeterministic).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   sortCols: Seq[Column], k: Int): DataFrame = {
    val local = Window
      .partitionBy((groupCols.map(col) :+ col("_pid")): _*)
      .orderBy(sortCols: _*)
    val global = Window.partitionBy(groupCols.map(col): _*).orderBy(sortCols: _*)
    df.withColumn("_pid", spark_partition_id())
      .withColumn("_lrk", row_number().over(local))
      .where(col("_lrk") <= k)
      .withColumn("rk", row_number().over(global))
      .where(col("rk") <= k)
      .drop("_pid", "_lrk")
  }

  /** EXACT per-key distinct count that survives key skew.
    *
    * A direct `groupBy(key).agg(countDistinct(value))` funnels every
    * (key, value) of a hot key through the one task owning that key,
    * which builds the full distinct set in a single hash table. Two-stage
    * decomposition: shuffle on (key, value) FIRST — the hot key's values
    * spread over the whole cluster and partial aggregation dedups
    * map-side — then count the surviving pairs per key (the second
    * shuffle carries one row per distinct pair, already deduped).
    * Identical result, bounded per-task state. This is what Spark's
    * Expand-based distinct rewrite does for global aggregates; spelling
    * it out keeps the shape explicit for composed per-key pipelines.
    */
  def twoStageDistinct(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.select(col(keyCol), col(valCol)).distinct()
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_distinct"))

  /** Regular-grid resample with forward fill, per key.
    *
    * Input rows are (key, bucket, value) observations on an integer bucket
    * axis (hour index, day index …). Each key's [min, max] bucket range
    * explodes to a dense grid; buckets with several observations keep the
    * MAX (commutative — bucket ties are order-free across engines); empty
    * buckets fill with the running last non-null. The first grid bucket
    * always holds an observation, so the fill never emits a leading null.
    *
    * Scale: the window partitions by key (parallelism = #keys, each
    * key's grid is span-bounded), the bucket aggregate is map-side
    * partial, and the grid join is a hash equi-join on (key, bucket).
    *
    * Returns (keyCol, bucketCol, fv).
    */
  def resampleFfill(df: DataFrame, keyCol: String, bucketCol: String,
                    valCol: String): DataFrame = {
    // Closed-form fill from each key's sorted observation array: every
    // observation's value repeats until the next observed bucket, so the
    // dense grid is `array_repeat` runs flattened in bucket order — the
    // grid join + LOCF window of the naive formulation (two extra
    // exchanges and a per-key sort) collapse into per-row array math on
    // the already-aggregated observations. Per-key state stays
    // span-bounded, same as the exploded spine was.
    val hv = df.groupBy(keyCol, bucketCol).agg(max(valCol).as("_hv"))
    hv.groupBy(keyCol)
      .agg(sort_array(collect_list(struct(col(bucketCol).as("_b"),
        col("_hv")))).as("_obs"))
      .select(col(keyCol), expr("element_at(_obs, 1)._b").as("_g0"),
        expr("""flatten(transform(_obs, (o, i) ->
            array_repeat(o._hv, CAST(
              (IF(i = size(_obs) - 1, o._b + 1L,
                  element_at(_obs, i + 2)._b) - o._b) AS INT))))""")
          .as("_fvs"))
      .select(col(keyCol), col("_g0"), posexplode(col("_fvs")))
      .select(col(keyCol), (col("_g0") + col("pos")).as(bucketCol),
        col("col").as("fv"))
  }

  /** Bloom-prefiltered equi-join: an explicit, deterministic form of the
    * runtime row-level filtering Spark's join runtime filters apply
    * opportunistically — for when the build side is too big to broadcast
    * as a join but its KEY SET still compresses into a few KB of bloom.
    *
    * Build: each build-side key hashes once (`xxhash64` of the canonical
    * string) and fans to 3 probe bits (Kirsch–Mitzenmacher, the same
    * formula as the engine's file-metrics blooms); a (lane → bit_or)
    * aggregate over 3 rows/key collapses to ≤ nBits/64 rows, collected as
    * ONE literal long-array (driver holds nBits bits, never the key set).
    * Probe: the stream side filters on 3 codegen'd bit tests against the
    * array literal BEFORE the join shuffle — no false negatives, so the
    * result is row-identical to the plain join; false positives (rate set
    * by nBits vs build cardinality) merely survive until the exact join.
    * At 100 TB this is the difference between shuffling the full fact
    * table and shuffling the ~matching slice.
    */
  def bloomPrefilterJoin(large: DataFrame, small: DataFrame,
                         largeKey: String, smallKey: String,
                         nBits: Int = 8192): DataFrame =
    large.where(bloomProbePredicate(small, smallKey, largeKey, nBits))
      .join(small, col(largeKey) === col(smallKey))

  /** The bloom probe as a standalone predicate: builds the filter from
    * `small(smallKey)` (one collect of ≤ nBits/64 lane longs) and returns
    * the codegen'd 3-bit-test Column over `probeKey`. Usable on its own
    * to pre-gate any downstream operator, not just a join. */
  def bloomProbePredicate(small: DataFrame, smallKey: String,
                          probeKey: String, nBits: Int = 8192): Column = {
    require(Integer.bitCount(nBits) == 1 && nBits >= 64,
      s"nBits must be a power of two >= 64, got $nBits")
    val nLanes = nBits / 64
    def posExpr(keyCol: String, j: Int): String =
      s"pmod(xxhash64(cast(`$keyCol` as string)) + ${j}L * " +
        s"(shiftrightunsigned(xxhash64(cast(`$keyCol` as string)), 33) | 1L), ${nBits}L)"
    // build: 3 probe positions per key -> per-lane bit_or (<= nLanes rows)
    val lanesRows = small
      .select(explode(array((0 until 3).map(j => expr(posExpr(smallKey, j))): _*))
        .as("_p"))
      .groupBy(expr("_p div 64").as("_lane"))
      .agg(expr("bit_or(shiftleft(1L, cast(_p % 64 as int)))").as("_bits"))
      .collect()
    val lanes = new Array[Long](nLanes)
    lanesRows.foreach(r => lanes(r.getLong(0).toInt) = r.getLong(1))
    val laneLit = lit(lanes)
    // all 3 bits set ⇒ maybe-present; any clear ⇒ definitely absent
    (0 until 3).map { j =>
      val pos = posExpr(probeKey, j)
      (element_at(laneLit, expr(s"cast(($pos div 64) as int)") + 1)
        .bitwiseAND(expr(s"shiftleft(1L, cast($pos % 64 as int))"))) =!= 0L
    }.reduce(_ && _)
  }
}
