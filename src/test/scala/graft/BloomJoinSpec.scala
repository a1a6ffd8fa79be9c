package graft

import org.apache.spark.sql.functions._

import graft.operators.Ops

/** Bloom-prefiltered join: exactness under forced false positives, probe
  * selectivity, and the plan contract (bit-test filter ahead of the join).
  */
class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  test("saturated 64-bit bloom (all-FP regime) still returns the exact join") {
    // 200 build keys into 64 bits: filter saturates, every probe passes —
    // the prefilter prunes nothing and must change nothing
    val small = (0L until 200L).map(i => (i, s"v$i")).toDF("sk", "sv")
    val large = (150L until 400L).map(i => (i, i * 10)).toDF("lk", "lv")
    val got = Ops.bloomPrefilterJoin(large, small, "lk", "sk", nBits = 64)
      .select("lk", "sv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (150L until 200L).map(i => (i, s"v$i")).toSet
    assert(got == want)
  }

  test("selective bloom actually prunes the stream side before the join") {
    val small = Seq(5L, 9L).toDF("sk")
    val large = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("lk")).distinct()
    val pre = Ops.bloomPrefilterJoin(large, small, "lk", "sk", nBits = 8192)
    // exact result
    assert(pre.select("lk").collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 9L))
    // the bit-test filter sits on the scan side of the plan (a local
    // relation would get it constant-folded — parquet keeps it live)
    val p = pre.queryExecution.executedPlan.toString
    assert(p.contains("element_at"), p)
    // measure selectivity: run just the prefilter predicate
    val total = large.count()
    val probes = large.where(
      Ops.bloomProbePredicate(small, "sk", "lk", nBits = 8192)).count()
    assert(probes < total / 10,
      s"2-key bloom over 8192 bits should pass <<10% of $total, passed $probes")
  }
}
