package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion/export — the interchange format training-data
  * pipelines actually exchange (one JSON document per line, splittable,
  * append-friendly).
  *
  * Scale rules baked in:
  *   - reads are SCHEMA-PINNED: schema inference is a full extra pass over
  *     the data (at 100 TB that is a second 100 TB scan), so the caller
  *     always supplies or reuses a `StructType`;
  *   - ingestion is PERMISSIVE with an explicit corrupt-record column: a
  *     multi-TB crawl drop always contains broken lines, and failing the
  *     job on line 40 billion is not an option — bad lines are captured,
  *     counted, and quarantined instead;
  *   - export writes one JSON object per line (`spark.write.json`), which
  *     any engine (and any `wc -l`) can consume.
  */
object JsonlCorpus {

  /** The `documents` table shape (TESTDATA.md). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  val CorruptCol = "_corrupt_record"

  /** Schema-pinned permissive read: well-formed lines parse into `schema`,
    * malformed lines land whole in [[CorruptCol]] with every data column
    * null. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(dir)

  /** Split a MATERIALIZED permissive read into (clean rows, quarantined
    * raw lines). Must run on a staged copy (see [[ingest]]): Spark refuses
    * corrupt-column-only projections straight off a raw JSON scan
    * (`UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN`). */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val clean = df.where(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = df.where(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw"))
    (clean, bad)
  }

  /** One-pass ingest: parse permissively and land the parsed batch as
    * columnar parquet at `stagingDir` — the same single pass over the raw
    * bytes a 100 TB pipeline pays anyway (raw JSON is never scanned
    * twice) — then split clean/quarantine off the staging copy. */
  def ingest(spark: SparkSession, inDir: String, schema: StructType,
             stagingDir: String): (DataFrame, DataFrame) = {
    read(spark, inDir, schema).write.mode("overwrite").parquet(stagingDir)
    quarantine(spark.read.parquet(stagingDir))
  }

  /** Export as JSONL (one object per line, one file per partition). */
  def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)
}
