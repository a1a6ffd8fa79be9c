package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to
  * `plans/<round>/<key>_<suffix>.txt` — the judge-checkable plan artifact
  * for optimization rounds. Same session surface as Bench (extensions +
  * graft catalog + shuffle partitions from SPARK_GRAFT_CPUS) so the plans
  * are the ones the bench actually executes.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.PlanSnap plans/r12 before key1 key2 ..."
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <suffix> <key> [<key>...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val keys = args.drop(2).toSeq
    java.nio.file.Files.createDirectories(outDir)

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // suffix ending in "_final": execute first (noop sink), then dump the
    // FINAL adaptive plan — the only way to see AQE decisions (coalesced
    // reads, runtime join demotions, ReusedExchange)
    val runFirst = suffix.endsWith("_final")
    keys.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      // collect() drives df's OWN QueryExecution (a noop write would plan
      // a separate one and the final adaptive plan would not be visible
      // here); declared keys all return small oracle-checked result sets
      if (runFirst) df.collect()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), txt + "\n")
      println(s"PLANSNAP wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
