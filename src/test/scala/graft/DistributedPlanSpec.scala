package graft

import org.apache.spark.sql.types.{LongType, StringType}

import graft.meta.{ColMetrics, DataFileEntry}
import graft.read.MorReader

/** The 100×-file-count planning valve: above the configured threshold,
  * per-file pruning predicates evaluate in a Spark job over manifest
  * groups instead of the single-threaded driver loop. The selection must
  * be IDENTICAL — same files, same order — because scan-task grouping and
  * pos-delete (path, pos) addressing downstream depend on manifest order.
  */
class DistributedPlanSpec extends SparkSpec {

  private val live = graft.schema.GraftSchema.of(
    "v" -> LongType, "p" -> StringType) // field ids 1, 2

  /** 50k entries: partition p = i%10, v-range [i·100, i·100+99]. */
  private def entries(n: Int): Seq[DataFileEntry] =
    (0 until n).map { i =>
      DataFileEntry(
        path = f"/wh/t/data/p=${i % 10}/f$i%06d.parquet",
        partition = Map("p" -> (i % 10).toString),
        specId = 0, schemaV = 1, seq = 1L, recordCount = 100L,
        metrics = Map(
          1 -> ColMetrics(Some((i * 100L).toString), Some((i * 100L + 99L).toString), 0L)))
    }

  test("distributed planning selects exactly the driver path's files, in order (50k files)") {
    val all = entries(50000)
    val pf = Map("p" -> Set("3", "7"))
    val rg = Map("v" -> MorReader.ColRange(Some("1000000"), Some("2500000")))

    spark.conf.unset(MorReader.DistributedPlanThresholdConf)
    val viaDriver = MorReader.planDataFiles(spark, all, live, pf, rg)
    // sanity: the predicate actually prunes — partition keeps 2/10,
    // range keeps ~15k of 50k index positions
    assert(viaDriver.nonEmpty && viaDriver.size < 5000)
    assert(viaDriver.forall(f => Set("3", "7")(f.partition("p"))))

    val before = MorReader.distributedPlans.get()
    spark.conf.set(MorReader.DistributedPlanThresholdConf, "1000")
    try {
      val viaJob = MorReader.planDataFiles(spark, all, live, pf, rg)
      assert(MorReader.distributedPlans.get() == before + 1,
        "distributed path did not engage")
      assert(viaJob.map(_.path) == viaDriver.map(_.path),
        "distributed selection differs from driver selection")
    } finally spark.conf.unset(MorReader.DistributedPlanThresholdConf)
  }

  test("distributed read end-to-end: a real table scanned under threshold 0 stays correct") {
    import org.apache.spark.sql.functions._
    val wh = java.nio.file.Files.createTempDirectory("distplan-wh").toString
    val g = new graft.table.GraftTableGenerator(spark, wh, "dist_t")
    g.create(graft.scenarios.Scenarios.OrdersSchema, Nil)
      .append(graft.gen.Bundles.ordersUnpartitioned(), 4, 50).commit()   // 200 rows
      .equalityDelete(col("order_id") % 10 === 7, Seq("order_id")).commit()
    val expected = MorReader.read(spark, g.tableDir.toString)
      .agg(count(lit(1)), sum("order_id")).head()
    spark.conf.set(MorReader.DistributedPlanThresholdConf, "0")
    try {
      val before = MorReader.distributedPlans.get()
      val got = MorReader.read(spark, g.tableDir.toString)
        .agg(count(lit(1)), sum("order_id")).head()
      assert(MorReader.distributedPlans.get() > before)
      assert(got == expected)
    } finally spark.conf.unset(MorReader.DistributedPlanThresholdConf)
  }
}
