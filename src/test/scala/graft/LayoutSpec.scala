package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.scenarios.Scenarios

/** Physical-layout assertions: the reference's scenarios are SPECS about
  * file layout (row-group sizes, forced 100-row groups, file counts), not
  * just row contents (reference `Main.java:186-191,363-368`). Reads real
  * Parquet footers to verify the writer knobs take effect.
  */
class LayoutSpec extends SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft-layout").toString

  private def rowGroups(path: String): Seq[Long] = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      r.getFooter.getBlocks.asScala.map(_.getRowCount.toLong).toSeq
    } finally r.close()
  }

  test("S3 16KB row-group knob → multiple row groups per 1000-row file") {
    Scenarios.createMultiRowGroupOrdersWithDeletes(spark, wh)
    val f = s"$wh/multi_rowgroup_orders_with_deletes/data/2019/2019-00.parquet"
    val groups = rowGroups(f)
    assert(groups.sum == 1000)
    assert(groups.length > 1, s"expected multiple row groups, got $groups")
  }

  test("S10 1-byte row-group knob → forced 100-row groups (Main.java:363-368)") {
    Scenarios.createProductsWithEqDeletes(spark, wh)
    val f = s"$wh/products_with_eq_deletes/data/widget/widget-00.parquet"
    val groups = rowGroups(f)
    assert(groups.sum == 200)
    // parquet-hadoop checks size every 100 records → exactly 100-row groups
    assert(groups == Seq(100L, 100L), s"got $groups")
  }

  test("default knobs → single row group for small files; exact file counts") {
    Scenarios.createSmallOrders(spark, wh)
    val dir = Paths.get(s"$wh/orders/data/2019")
    import scala.jdk.CollectionConverters._
    val files = Files.list(dir).iterator().asScala.map(_.toString).toSeq.sorted
    assert(files.map(_.split('/').last) == Seq("2019-00.parquet", "2019-01.parquet"))
    assert(rowGroups(files.head) == Seq(100L))
  }
}
