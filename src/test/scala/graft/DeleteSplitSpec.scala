package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.SnapshotLog
import graft.read.MorReader
import graft.table.GraftTableGenerator

/** The ordered-tombstone split: past
  * [[GraftTableGenerator.deleteSplitThreshold]] matches, the semi/anti-
  * join DML verbs write N path-RANGE-partitioned ordered positional
  * delete files instead of funneling one global sort through a single
  * task — the 100×-scale seam for residual DELETEs matching ~10⁹ rows.
  * The reader already consumes any number of positional files and prunes
  * each by its own recorded file_path bounds, so the split must be
  * invisible to every read. */
class DeleteSplitSpec extends SparkSpec {

  private lazy val wh: String = {
    graft.queries.CatalogFixture.ensure(spark)
    graft.queries.CatalogFixture.warehouse
  }

  test("deleteSemiJoin splits its tombstone into >1 path-ranged ordered " +
      "files past the threshold; MoR counts unchanged") {
    spark.conf.set("spark.graft.delete.splitThreshold", "1000")
    try {
      val g = new GraftTableGenerator(spark, s"$wh/db", "t_delsplit")
      g.create(graft.schema.GraftSchema.of(
        "id" -> LongType, "v" -> LongType), Nil)
      // 8 data files so the matches span many file_path values
      g.appendBulk(spark.range(0, 10000).toDF("id")
        .withColumn("v", col("id") * 2), 8).commit()
      // 5000 even ids match — 5× the lowered threshold
      g.deleteSemiJoin(
        spark.range(0, 10000).toDF("id").where(col("id") % 2 === 0),
        Seq("id"), joinResidual = None).commit()
      val st = SnapshotLog(g.tableDir.toString).load()
      val posFiles = st.snapshots.last.deleteFiles.filter(_.kind == "pos")
      assert(posFiles.size > 1,
        s"expected a split tombstone, got ${posFiles.size} file(s)")
      // each file is (path, pos)-ordered internally — the spec's ordering
      // contract is per-file, which range partitioning preserves
      posFiles.foreach { f =>
        val rows = spark.read.parquet(f.path)
          .select("file_path", "pos")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(rows == rows.sorted,
          s"tombstone ${f.path} is not (path, pos)-ordered")
      }
      // disjoint coverage: no (path, pos) appears in two files
      val all = posFiles.flatMap(f => spark.read.parquet(f.path)
        .select("file_path", "pos")
        .collect().map(r => (r.getString(0), r.getLong(1))))
      assert(all.size == all.distinct.size && all.size == 5000,
        s"expected 5000 distinct tombstones, got ${all.size}")
      // the merged read sees exactly the odd survivors
      val live = MorReader.read(spark, g.tableDir.toString)
      assert(live.count() == 5000L)
      assert(live.agg(sum(col("id"))).collect()(0).getLong(0) ==
        (1L until 10000L by 2).sum)
    } finally spark.conf.unset("spark.graft.delete.splitThreshold")
  }

  test("updateSemiJoin scale proof: 10^6 matched rows through the " +
      "residual semi-join update, split tombstones, counts exact") {
    spark.conf.set("spark.graft.delete.splitThreshold", "300000")
    try {
      val n = 2000000L
      val g = new GraftTableGenerator(spark, s"$wh/db", "t_updscale")
      g.create(graft.schema.GraftSchema.of(
        "id" -> LongType, "ts" -> LongType, "v" -> LongType), Nil)
      g.appendBulk(spark.range(0, n).toDF("id")
        .withColumn("ts", col("id") * 10)
        .withColumn("v", col("id")), 16).commit()
      // source covers the lower half; the ±5 band residual matches even
      // ids only → 5·10^5 updates... with TWO witnesses per even id the
      // semi join still rewrites each row once
      val src = spark.range(0, n / 2).toDF("id")
        .withColumn("sts", col("id") * 10 +
          when(col("id") % 2 === 0, lit(3L)).otherwise(lit(50L)))
        .unionByName(spark.range(0, n / 2).toDF("id")
          .withColumn("sts", col("id") * 10 +
            when(col("id") % 2 === 0, lit(5L)).otherwise(lit(60L))))
      val t0 = System.nanoTime()
      g.updateSemiJoin(src, Seq("id"),
        joinResidual = Some(col("_s_sts").between(col("ts") - 5, col("ts") + 5)),
        sets = Seq("v" -> (col("v") + 1000000000L))).commit()
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"10^6-witness residual update: $sec%.1f s")
      assert(sec < 120.0, f"residual update took $sec%.1f s (budget 120)")
      val live = MorReader.read(spark, g.tableDir.toString)
      assert(live.count() == n, "row count must not change")
      val updated = live.where(col("v") >= 1000000000L)
      assert(updated.count() == n / 4,
        "exactly the in-band (even, covered) rows update")
      assert(updated.where(col("id") % 2 =!= 0 || col("id") >= n / 2)
        .count() == 0L)
      val posFiles = SnapshotLog(g.tableDir.toString).load()
        .snapshots.last.deleteFiles.filter(_.kind == "pos")
      assert(posFiles.size > 1, s"expected split tombstones, got ${posFiles.size}")
    } finally spark.conf.unset("spark.graft.delete.splitThreshold")
  }

  test("updateSemiJoin splits its tombstone past the threshold and " +
      "rewrites in place") {
    spark.conf.set("spark.graft.delete.splitThreshold", "1000")
    try {
      val g = new GraftTableGenerator(spark, s"$wh/db", "t_updsplit")
      g.create(graft.schema.GraftSchema.of(
        "id" -> LongType, "v" -> LongType), Nil)
      g.appendBulk(spark.range(0, 10000).toDF("id")
        .withColumn("v", col("id") * 2), 8).commit()
      // 5000 matches through the UPDATE twin: split applies there too
      g.updateSemiJoin(
        spark.range(0, 10000).toDF("id").where(col("id") % 2 === 0),
        Seq("id"), joinResidual = None,
        sets = Seq("v" -> lit(-1L))).commit()
      val st = SnapshotLog(g.tableDir.toString).load()
      val posFiles = st.snapshots.last.deleteFiles.filter(_.kind == "pos")
      assert(posFiles.size > 1,
        s"expected a split tombstone, got ${posFiles.size} file(s)")
      val live = MorReader.read(spark, g.tableDir.toString)
      assert(live.count() == 10000L, "update must not change row count")
      assert(live.where(col("v") === -1L).count() == 5000L)
      assert(live.where(col("id") % 2 === 1 && col("v") =!= col("id") * 2)
        .count() == 0L, "odd rows must be untouched")
    } finally spark.conf.unset("spark.graft.delete.splitThreshold")
  }
}
