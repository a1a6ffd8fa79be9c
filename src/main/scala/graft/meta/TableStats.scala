package graft.meta

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-level column statistics — the Iceberg Puffin-stats / `ANALYZE
  * TABLE` analog. ONE distributed pass over the live table computes, per
  * column: NDV via HLL++ (`approx_count_distinct`, rsd 1% — the sketch is
  * SPARSE-EXACT below a few thousand distinct values, and mergeable
  * map-side at any scale), null count, and canonical-string min/max; plus
  * the live row count. Persisted as `metadata/stats-<snapshotId>.json`,
  * newest file wins, `stale` = head moved past the stats snapshot.
  *
  * Why a 100 TB engine wants these: per-file min/max metrics answer
  * "can this FILE match", but only table-level NDV answers "how many
  * GROUPS will this aggregation produce" / "is the build side of this
  * join broadcastable" — the numbers a cost-based planner feeds on. The
  * stats job itself is a single aggregate (map-side partials, one
  * reduce), so refreshing after ingest costs one scan, not N.
  */
object TableStats {

  final case class ColStats(ndv: Long, nulls: Long,
                            min: Option[String], max: Option[String])
  final case class Stats(snapshotId: Long, rowCount: Long,
                         cols: Seq[(String, ColStats)])

  private def metaDir(tableDir: String): Path =
    Paths.get(tableDir).resolve("metadata")

  /** Compute fresh stats over the live table (no persistence). */
  def compute(spark: SparkSession, tableDir: String,
              cols: Seq[String] = Nil): Stats = {
    val st = SnapshotLog(tableDir).load().mainOnly
    val names = if (cols.nonEmpty) cols else st.schema.names
    val df = graft.read.MorReader.read(spark, tableDir)
    val aggs = coalesce(count(lit(1)), lit(0L)).as("_rc") +:
      names.flatMap { c => Seq(
        approx_count_distinct(col(c), 0.01).as(s"_ndv_$c"),
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"_nn_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
      }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val colStats = names.map { c =>
      c -> ColStats(
        r.getAs[Long](s"_ndv_$c"),
        r.getAs[Long](s"_nn_$c"),
        Option(r.getAs[String](s"_mn_$c")),
        Option(r.getAs[String](s"_mx_$c")))
    }
    Stats(SnapshotLog(tableDir).lastSnapshotId, r.getAs[Long]("_rc"), colStats)
  }

  /** Compute and persist (`ANALYZE TABLE`). Returns the written stats. */
  def analyze(spark: SparkSession, tableDir: String,
              cols: Seq[String] = Nil): Stats = {
    val s = compute(spark, tableDir, cols)
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("snapshotId", s.snapshotId)
    root.put("rowCount", s.rowCount)
    val arr = root.putArray("cols")
    s.cols.foreach { case (name, cs) =>
      val o = arr.addObject()
      o.put("name", name); o.put("ndv", cs.ndv); o.put("nulls", cs.nulls)
      cs.min.foreach(o.put("min", _)); cs.max.foreach(o.put("max", _))
    }
    val target = metaDir(tableDir).resolve(s"stats-${s.snapshotId}.json")
    val tmp = Files.createTempFile(metaDir(tableDir), ".stats", ".tmp")
    Files.writeString(tmp, m.writeValueAsString(root))
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    s
  }

  /** Newest persisted stats, if any. */
  def read(tableDir: String): Option[Stats] = {
    val dir = metaDir(tableDir)
    if (!Files.exists(dir)) return None
    val s = Files.list(dir)
    val newest =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("stats-") && n.endsWith(".json"))
        .map(_.stripPrefix("stats-").stripSuffix(".json").toLong)
        .maxOption
      finally s.close()
    newest.map { id =>
      val m = new ObjectMapper()
      val n = m.readTree(Files.readString(dir.resolve(s"stats-$id.json")))
      Stats(n.get("snapshotId").asLong, n.get("rowCount").asLong,
        n.get("cols").elements().asScala.map { o =>
          o.get("name").asText -> ColStats(o.get("ndv").asLong,
            o.get("nulls").asLong,
            Option(o.get("min")).map(_.asText),
            Option(o.get("max")).map(_.asText))
        }.toSeq)
    }
  }

  /** Metadata-table surface: one row per analyzed column, plus the
    * freshness flag (`stale` = the table head moved past the stats
    * snapshot — re-ANALYZE to trust cardinalities again). */
  def frame(spark: SparkSession, tableDir: String): DataFrame = {
    val s = read(tableDir).getOrElse(
      throw new IllegalStateException(s"no stats written for $tableDir — analyze() first"))
    val stale = SnapshotLog(tableDir).lastSnapshotId != s.snapshotId
    val rows = s.cols.map { case (c, cs) =>
      (c, cs.ndv, cs.nulls, cs.min.orNull, cs.max.orNull, s.rowCount, stale)
    }
    spark.createDataFrame(rows)
      .toDF("col_name", "ndv", "null_count", "min_v", "max_v",
        "row_count", "stale")
  }
}
