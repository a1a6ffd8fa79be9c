package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Repeat-measurement harness for perf work on individual queries: runs
  * each named query `SPARK_GRAFT_REPS` times (default 5) after one warm-up
  * and reports the MIN — the statistic that survives JIT/GC/page-cache
  * noise that single-shot bench numbers can't. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.MicroBench dedup_minhash dedup_ngram_jaccard"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same session surface as Bench/Verify — catalog-SQL keys need the
      // analyzer substitution and the graft catalog plugin
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val times = (1 to reps).map(_ => once())
      println(f"MICRO $name%-28s min=${times.min}%7.3f  med=${times.sorted.apply(reps / 2)}%7.3f  max=${times.max}%7.3f")
    }
    spark.stop()
  }
}
