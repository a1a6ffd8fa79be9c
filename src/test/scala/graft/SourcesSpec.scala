package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.JsonlCorpus

class SourcesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("JSONL round-trip: documents → jsonl → schema-pinned read is lossless") {
    val out = Files.createTempDirectory("jsonl").toString + "/docs"
    val orig = spark.read.parquet(s"$dir/documents.parquet")
      .select(JsonlCorpus.DocumentsSchema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
    JsonlCorpus.write(orig, out)
    val (clean, bad) = JsonlCorpus.ingest(spark, out,
      JsonlCorpus.DocumentsSchema, out + "_staged")
    assert(bad.count() == 0)
    assert(clean.schema == orig.schema)
    val a = orig.collect().map(_.toString).sorted.toSeq
    val b = clean.collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("JSONL ingestion quarantines malformed lines instead of failing the job") {
    val out = Files.createTempDirectory("jsonl-bad").toString + "/docs"
    val orig = spark.read.parquet(s"$dir/documents.parquet")
      .select(JsonlCorpus.DocumentsSchema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
    val n = orig.count()
    JsonlCorpus.write(orig, out)
    // plant a broken shard in the drop: one truncated record, one garbage
    // line, one good record (a partial upload from a flaky producer)
    Files.writeString(Paths.get(out, "part-extra.json"),
      "{\"doc_id\": 999999, \"text\": \"trunca\nnot json at all\n" +
        "{\"doc_id\": 999998, \"text\": \"ok\", \"lang\": \"en\", " +
        "\"source\": \"x\", \"n_chars\": 2}\n")
    val (clean, bad) = JsonlCorpus.ingest(spark, out,
      JsonlCorpus.DocumentsSchema, out + "_staged")
    assert(clean.count() == n + 1) // every good row survives, incl. the shard's
    assert(clean.where(col("doc_id") === 999998L).count() == 1)
    assert(bad.count() == 2) // both broken lines captured, job never failed
  }
}
