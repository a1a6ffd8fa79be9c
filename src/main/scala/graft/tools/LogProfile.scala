package graft.tools

import graft.meta.{ColMetrics, DataFileEntry, Snapshot, SnapshotLog}

/** Measures snapshot-log load() at large file counts: one 50k-entry
  * SHARDED snapshot (manifest groups, concurrent parse) vs the same 50k
  * entries INLINED across six under-threshold snapshots (the sequential
  * parse an unsharded log pays). Evidence for the sharded-manifest design,
  * not a driver artifact. */
object LogProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    def entry(i: Int): DataFileEntry =
      DataFileEntry(f"/wh/t/data/f$i%07d.parquet", Map("p" -> (i % 10).toString),
        0, 1, 1L, 100L,
        Map(1 -> ColMetrics(Some(i.toString), Some((i + 1).toString), 0L)))

    def freshLog(): SnapshotLog = {
      val dir = java.nio.file.Files.createTempDirectory("logprofile")
      val log = SnapshotLog(dir.toString)
      log.init()
      log.writeSchema(1, graft.schema.GraftSchema.of(
        "v" -> org.apache.spark.sql.types.LongType))
      log.writeSpec(0, Nil)
      log
    }

    // sharded: one big snapshot
    val sharded = freshLog()
    sharded.commit(Snapshot(1L, 1L, 1, 0, (0 until n).map(entry), Nil,
      Nil, Nil, 1000L, "append"))
    // inline: same entries spread across under-threshold snapshots
    val inline = freshLog()
    val per = SnapshotLog.ShardThreshold - 1
    (0 until n).grouped(per).zipWithIndex.foreach { case (g, i) =>
      inline.commit(Snapshot(i + 1L, i + 1L, 1, 0, g.map(entry), Nil,
        Nil, Nil, 1000L + i, "append"))
    }

    def minOf(reps: Int)(f: => Int): (Double, Int) = {
      var best = Double.MaxValue; var rows = 0
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        rows = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }
    // warm-up both
    sharded.load(); inline.load()
    val (tS, nS) = minOf(7)(sharded.load().dataFiles.size)
    val (tI, nI) = minOf(7)(inline.load().dataFiles.size)
    require(nS == n && nI == n, s"row mismatch: $nS / $nI vs $n")
    println(f"LOGPROFILE n=$n sharded=$tS%.4f inline=$tI%.4f speedup=${tI / tS}%.2fx")
  }
}
