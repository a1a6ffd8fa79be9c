package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Q

/** Input-drift guard for the events reader (round-5 postmortem: the driver
  * regenerated `events.parquet` from TIMESTAMP(NANOS) to TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) between rounds and every events-family key broke
  * at analysis time). [[Q.events]] must analyze AND agree numerically on
  * every physical encoding the column has shipped under:
  *
  *   - long nanos (how Spark 4 loads TIMESTAMP(NANOS) under `nanosAsLong`;
  *     a plain BIGINT column loads identically, so that's the fixture),
  *   - TIMESTAMP_NTZ (how TIMESTAMP(MICROS, isAdjustedToUTC=false) loads),
  *   - TIMESTAMP / LTZ (isAdjustedToUTC=true, the third plausible drop).
  */
class EventsEncodingSpec extends SparkSpec {

  // instants chosen to exercise sub-ms truncation: odd micros + odd nanos
  private val micros = Seq(
    1700000000000001L,  // ...001 µs
    1700003600123456L,
    1700007199999999L,
    1700000000000000L)

  private def fixture(write: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    import spark.implicits._
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong % 2) }
      .toDF("event_id", "us", "user_id")
    val dir = Files.createTempDirectory("events-enc").toString
    write(base).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def normalized(dir: String): Seq[(Long, Long, String)] =
    Q.events(spark, dir)
      .select(col("event_id"), col("_us"), col("_ts").cast(StringType))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq

  test("Q.events normalizes long-nanos, TIMESTAMP_NTZ, and TIMESTAMP encodings identically") {
    val longDir = fixture(_.select(col("event_id"),
      (col("us") * 1000L + lit(777L)).as("ts"), col("user_id"))) // odd nanos truncate away
    val ntzDir = fixture(_.select(col("event_id"),
      expr("timestamp_micros(us)").cast(TimestampNTZType).as("ts"), col("user_id")))
    val ltzDir = fixture(_.select(col("event_id"),
      expr("timestamp_micros(us)").as("ts"), col("user_id")))

    // loaded types really are the three branches
    assert(spark.read.parquet(s"$longDir/events.parquet").schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$ntzDir/events.parquet").schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(s"$ltzDir/events.parquet").schema("ts").dataType == TimestampType)

    val got = Seq(longDir, ntzDir, ltzDir).map(normalized)
    assert(got(0) == got(1) && got(1) == got(2),
      s"encodings disagree:\nlong=${got(0)}\nntz =${got(1)}\nltz =${got(2)}")
    // absolute values: _us is exactly the instant's micros (nanos truncated)
    assert(got(0).map(t => (t._1, t._2)) ==
      micros.zipWithIndex.map { case (us, i) => (i.toLong, us) })
  }

  test("Q.events on the real testdata analyzes and _us/_ts are micro-consistent") {
    val df = Q.events(spark, "/root/testdata/sf0.001")
    val bad = df.where(unix_micros(col("_ts")) =!= col("_us")).count()
    assert(bad == 0)
    assert(df.count() > 0)
  }
}
