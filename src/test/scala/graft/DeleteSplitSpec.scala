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
