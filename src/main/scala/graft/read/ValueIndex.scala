package graft.read

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.{BloomFilter, SnapshotLog}

/** Posting-list value index — the Hyperspace-shaped "index as data"
  * pattern: for one column, a compact parquet table of
  * `(shard, bucket, file_path)` postings, where
  * `bucket = xxhash64(canonical value) mod nBuckets` and shard
  * (= bucket mod 64) is the partition key, so a lookup reads ONE
  * partition directory of a metadata-scale table.
  *
  * Point lookups resolve the bucket's posting rows, then plan a MoR read
  * restricted to exactly those files. This complements the snapshot log's
  * per-file min/max + bloom metrics ([[MorReader.readValues]]): metrics
  * prune by per-file VALUE ENVELOPE — precise when files are sorted or
  * clustered by the column, wide-open on an unsorted high-cardinality
  * key where every file's [min, max] spans the domain. The posting index
  * is exact at bucket granularity REGARDLESS of physical value order —
  * the needle-in-haystack shape at 10⁷ files.
  *
  * Soundness: postings are built from the MoR-visible row set and are
  * append-only. Later row deletes leave stale postings (false positives —
  * the restricted read still applies delete files and the value
  * predicate, so answers stay exact); later appends are folded in by
  * [[refresh]] from the incremental append scan under the same watermark
  * contract as the ANN indexes (snapshot expiry crossing the watermark
  * demands a rebuild, detected loudly).
  */
object ValueIndex {

  private val NumShards = 64

  private def watermarkFile(indexDir: String) =
    Paths.get(indexDir, "_indexed_snapshot")

  private def metaFile(indexDir: String) = Paths.get(indexDir, "_index_meta")

  private def bucketCol(colName: String, nBuckets: Int) =
    pmod(xxhash64(col(colName).cast("string")), lit(nBuckets.toLong))

  private def postings(df: DataFrame, colName: String,
                       nBuckets: Int): DataFrame =
    df.select(bucketCol(colName, nBuckets).as("bucket"),
        col(MorReader.FilePathCol).as("file_path"))
      .distinct()
      .withColumn("shard", pmod(col("bucket"), lit(NumShards.toLong)))

  /** Build the index from the table's current snapshot: one scan emitting
    * distinct (bucket, file) pairs — the shuffle carries 16-byte posting
    * rows, never data columns. */
  def build(spark: SparkSession, tableDir: String, colName: String,
            indexDir: String, nBuckets: Int = 4096): Unit = {
    val st = SnapshotLog(tableDir).load().mainOnly
    val snap = st.snapshots.lastOption.map(_.id).getOrElse(0L)
    postings(MorReader.readWithMeta(spark, tableDir), colName, nBuckets)
      .write.partitionBy("shard").mode("overwrite")
      .parquet(s"$indexDir/postings")
    Files.createDirectories(Paths.get(indexDir))
    Files.writeString(metaFile(indexDir), s"$colName\n$nBuckets")
    Files.writeString(watermarkFile(indexDir), snap.toString)
  }

  /** Fold appends since the watermark into the posting table (appended
    * files only — metadata-scale planning, the incremental-scan shape). */
  def refresh(spark: SparkSession, tableDir: String, indexDir: String): Unit = {
    val wm = watermarkFile(indexDir)
    require(Files.exists(wm),
      s"$indexDir has no watermark — build() first")
    val from = Files.readString(wm).trim.toLong
    val Array(colName, nBucketsS) =
      Files.readString(metaFile(indexDir)).split("\n")
    val st = SnapshotLog(tableDir).load().mainOnly
    val to = st.snapshots.lastOption.map(_.id).getOrElse(0L)
    if (to == from) return
    // from == 0 is a valid watermark (index built on an empty table — no
    // snapshot 0 ever exists), same escape TableFollower.poll has
    require(from == 0L || st.snapshots.exists(_.id == from),
      s"index watermark $from predates retained history (snapshot expiry " +
        "crossed it) — rebuild with build()")
    // the postings need (value, file) pairs, which the incremental append
    // scan's live-schema projection drops — derive them from the in-range
    // files via a restricted metadata read instead
    val inRange = st.snapshots
      .filter(s => s.id > from && s.operation != "replace")
      .flatMap(_.dataFiles).map(_.path).toSet
    if (inRange.nonEmpty) {
      val restricted = st.copy(snapshots = st.snapshots.map(s =>
        s.copy(dataFiles = s.dataFiles.filter(f => inRange(f.path)))))
      val df = MorReader.withMeta(spark, restricted, st.schema, Map.empty)
      postings(df, colName, nBucketsS.toInt)
        .write.partitionBy("shard").mode("append").parquet(s"$indexDir/postings")
    }
    Files.writeString(wm, to.toString)
  }

  /** Candidate files for a value: one partition-pruned read of the
    * posting table (the driver hashes the value with the same xxhash64
    * the build expression used — parity proven by the bloom machinery). */
  def lookupFiles(spark: SparkSession, indexDir: String,
                  value: String): Seq[String] = {
    val Array(_, nBucketsS) = Files.readString(metaFile(indexDir)).split("\n")
    val b = java.lang.Math.floorMod(BloomFilter.hashString(value),
      nBucketsS.toLong)
    spark.read.parquet(s"$indexDir/postings")
      .where(col("shard") === b % NumShards && col("bucket") === b)
      .select("file_path").distinct().collect().map(_.getString(0)).toSeq
  }

  /** Index-backed point read: plan the MoR read over ONLY the posting
    * files (delete files still apply — stale postings and bucket
    * collisions are filtered out by the residual predicate). */
  def readValue(spark: SparkSession, tableDir: String, indexDir: String,
                value: String): DataFrame = {
    val Array(colName, _) = Files.readString(metaFile(indexDir)).split("\n")
    val keep = lookupFiles(spark, indexDir, value).toSet
    val st = SnapshotLog(tableDir).load().mainOnly
    val restricted = st.copy(snapshots = st.snapshots.map(s =>
      s.copy(dataFiles = s.dataFiles.filter(f => keep(f.path)))))
    val live = st.schema
    MorReader.withMeta(spark, restricted, live, Map.empty)
      .select(live.names.map(col): _*)
      .where(col(colName).cast("string") === value)
  }
}
