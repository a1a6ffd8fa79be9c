package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.read.MorReader
import graft.table.GraftTableGenerator

/** Scale proof for dynamic partition overwrite: a batch touching 10⁴
  * partitions must stay METADATA-tier — the partition-tuple decision is
  * one tiny distinct job and one manifest edit (no scan, no tombstones),
  * and every untouched partition's bytes are untouched on disk. This
  * completes the scale-proof pattern (ANN/dedup/contam/stream each have
  * one). */
class OverwriteDynScaleSpec extends SparkSpec {

  private lazy val wh: String = {
    graft.queries.CatalogFixture.ensure(spark)
    graft.queries.CatalogFixture.warehouse
  }

  test("dynamic overwrite touching 10^4 partitions: metadata-tier decision, " +
      "untouched partitions byte-identical") {
    val nTouched = 10000
    val nKeep = 50
    val g = new GraftTableGenerator(spark, s"$wh/db", "t_ovwdyn_scale")
    g.create(graft.schema.GraftSchema.of(
      "id" -> LongType, "part" -> StringType), Seq("part"))
    // seed 2,000 of the touched partitions + 50 keepers (2 rows each) —
    // dynamic overwrite REPLACES existing tuples and CREATES the rest,
    // so the batch's 10^4 tuples exercise both legs
    val nSeed = 2000
    val seeded = spark.range(0, (nSeed + nKeep) * 2L)
      .select((col("id") % (nSeed + nKeep)).as("p"), col("id"))
      .select(col("id"),
        when(col("p") < nSeed, format_string("p%05d", col("p")))
          .otherwise(format_string("keep%05d", col("p") - nSeed)).as("part"))
    g.appendBulk(seeded, 32).commit()
    val keepPathsBefore = graft.meta.SnapshotLog(g.tableDir.toString).load()
      .dataFiles.filter(_.partition.values.exists(_.startsWith("keep")))
      .map(_.path).sorted
    assert(keepPathsBefore.nonEmpty)
    def md5(p: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p))).map("%02x".format(_)).mkString
    val keepHashes = keepPathsBefore.map(p => p -> md5(p)).toMap
    // the overwrite batch: 3 rows in each of 10^4 partitions
    val batch = spark.range(0, nTouched * 3L)
      .select((col("id") + 1000000L).as("id"),
        format_string("p%05d", col("id") % nTouched).as("part"))
      .localCheckpoint()
    val t0 = System.nanoTime()
    g.overwriteDynamic(batch) // the metadata-tier decision + manifest edit
    val decideSec = (System.nanoTime() - t0) / 1e9
    g.appendBulk(batch, 32).commit()
    val totalSec = (System.nanoTime() - t0) / 1e9
    info(f"decision $decideSec%.1f s, overwrite+append total $totalSec%.1f s")
    assert(decideSec < 60.0,
      f"metadata-tier decision took $decideSec%.1f s — not metadata-tier")
    // end state: 3 rows per touched partition, keepers untouched
    val live = MorReader.read(spark, g.tableDir.toString)
    assert(live.count() == nTouched * 3L + nKeep * 2L)
    assert(live.where(col("part").startsWith("keep")).count() == nKeep * 2L)
    assert(live.where(col("part").startsWith("p") && col("id") < 1000000L)
      .count() == 0L, "stale rows survived in overwritten partitions")
    // untouched partitions: same live paths, byte-identical files
    val keepPathsAfter = graft.meta.SnapshotLog(g.tableDir.toString).load()
      .dataFiles.filter(_.partition.values.exists(_.startsWith("keep")))
      .map(_.path).sorted
    assert(keepPathsAfter == keepPathsBefore,
      "untouched partitions must keep their exact files")
    keepPathsBefore.foreach(p =>
      assert(md5(p) == keepHashes(p), s"untouched file $p changed on disk"))
  }
}
