package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-level profiler for the MoR read path: builds the S10 scenario
  * warehouse once, then times (a) snapshot-log load, (b) DataFrame plan
  * construction through `MorReader.read`, (c) execution — separately,
  * min-of-N each. Pinpoints whether a read-path perf drift is metadata
  * parsing, driver-side planning, or the executed plan. */
object ReadProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "7").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val whDir = java.nio.file.Files.createTempDirectory("readprofile").toString
    graft.scenarios.Scenarios.createProductsWithEqDeletes(spark, whDir)
    val dir = s"$whDir/products_with_eq_deletes"

    def minOf(n: Int)(f: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // warm-up
    graft.read.MorReader.read(spark, dir).write.format("noop").mode("overwrite").save()

    val tLoad = minOf(reps)(graft.meta.SnapshotLog(dir).load())
    val tPlan = minOf(reps)(graft.read.MorReader.read(spark, dir))
    val df = graft.read.MorReader.read(spark, dir)
    val tExec = minOf(reps)(df.write.format("noop").mode("overwrite").save())
    val tAll = minOf(reps)(graft.read.MorReader.read(spark, dir)
      .write.format("noop").mode("overwrite").save())
    println(f"PROFILE load=$tLoad%.4f plan=$tPlan%.4f execCached=$tExec%.4f full=$tAll%.4f")
    spark.stop()
  }
}
