package graft

import org.apache.spark.sql.functions._

import graft.queries.CorpusSourceQueries

/** Gates for wave B: semantics on toy inputs + the bucketed-join shuffle
  * contract (the one thing that key exists to prove).
  */
class CorpusSourceSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("contam_exact_substr: every needle hits at least its source doc") {
    val got = CorpusSourceQueries.queries("contam_exact_substr")(spark, sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (needleId, nDocs) = (r.getLong(0), r.getLong(1))
      assert(nDocs >= 1L, s"needle $needleId lost its own source doc")
    }
    // spot-check one needle's hit set against a driver-side recompute
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (nid, ntext) = docs.find { case (id, t) => id % 100 == 0 && t.length >= 60 }.get
    val needle = ntext.substring(10, 40) // substr(text, 11, 30) is 1-based
    val expectHits = docs.filter(_._2.contains(needle)).map(_._1)
    val row = got.find(_.getLong(0) == nid).get
    assert(row.getLong(1) == expectHits.length && row.getLong(2) == expectHits.sum)
  }

  test("bpe_merge_topk: pair counts on a two-word toy corpus") {
    val t = java.nio.file.Files.createTempDirectory("bpe").toString
    Seq((1L, "abab cd"), (2L, "ab x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$t/documents.parquet")
    val got = CorpusSourceQueries.queries("bpe_merge_topk")(spark, t)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // abab → ab,ba,ab ; cd → cd ; ab → ab ; x dropped (len 1)
    assert(got == Seq(("ab", 3L), ("ba", 1L), ("cd", 1L)))
  }

  test("join_bucketed_colocated: merge join with NO shuffle above the scans") {
    val df = CorpusSourceQueries.queries("join_bucketed_colocated")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    // bucketed co-location: the only exchanges allowed are for the final
    // single-partition aggregate/sort — never a hashpartitioning on the
    // join key between the scans and the join
    val joinKeyShuffle = p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") &&
        (l.contains("l_orderkey") || l.contains("o_orderkey")))
    assert(!joinKeyShuffle, s"bucketing failed to co-locate the join:\n$p")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"), p)
    // and the answer matches a plain (non-bucketed) recompute
    val expect = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), graft.queries.Q.cents(col("l_extendedprice")).as("pc"))
      .join(spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_orderstatus"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"), sum("pc").as("price_cents"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(df.collect().toSeq == expect)
  }

  test("intradoc_dedup: keep-first semantics, order preserved") {
    val t = java.nio.file.Files.createTempDirectory("intra").toString
    Seq((1L, "a. b. a. c. b. d"), (2L, "x. x. x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$t/documents.parquet")
    val got = CorpusSourceQueries.queries("intradoc_dedup")(spark, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 6L, 4L), (2L, 3L, 1L)))
    // the fingerprint is the hash of the rejoined kept text "a. b. c. d"
    val fp = CorpusSourceQueries.queries("intradoc_dedup")(spark, t)
      .where(col("doc_id") === 1L).select("fp").collect()(0).getLong(0)
    val expect = spark.range(1)
      .select(graft.ext.TextOps.hash60(lit("a. b. c. d")))
      .collect()(0).getLong(0)
    assert(fp == expect)
  }

  test("interdoc_line_dedup: lines at corpus count >= 3 are dropped everywhere") {
    val t = java.nio.file.Files.createTempDirectory("inter").toString
    // "common" appears 3x corpus-wide -> dropped from all docs;
    // "twice" appears 2x -> kept
    Seq((1L, "common. twice. only1"), (2L, "common. twice"), (3L, "common"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$t/documents.parquet")
    val got = CorpusSourceQueries.queries("interdoc_line_dedup")(spark, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 2L), (2L, 2L, 1L), (3L, 1L, 0L)))
  }

  test("source_csv_orders: the CSV hop is lossless vs the parquet original") {
    val viaCsv = CorpusSourceQueries.queries("source_csv_orders")(spark, sf)
      .collect().toSeq
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_cust"),
        sum(graft.queries.Q.cents(col("o_totalprice"))).as("price_cents"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(viaCsv == direct)
  }

  test("Aho-Corasick: overlapping/nested needles match exactly like contains") {
    // fail-link stress: needles that are substrings of each other, share
    // prefixes and suffixes, and overlap inside the text
    val needles = Seq(
      (1L, "ab"), (2L, "abab"), (3L, "bab"), (4L, "abc"),
      (5L, "c"), (6L, "ababab"), (7L, "xyz")).toDF("needle_id", "needle")
    val docs = Seq(
      (10L, "abababc"), (11L, "zzbabzz"), (12L, "no hits here!"),
      (13L, "abc"), (14L, "cab"), (15L, "ababab")).toDF("doc_id", "text")
    val got = graft.ext.Contam.exactSubstringsAC(docs, needles,
        "text", "doc_id", "needle_id", "needle")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (did, t) <- Seq((10L, "abababc"), (11L, "zzbabzz"), (12L, "no hits here!"),
        (13L, "abc"), (14L, "cab"), (15L, "ababab"))
      (nid, n) <- Seq((1L, "ab"), (2L, "abab"), (3L, "bab"), (4L, "abc"),
        (5L, "c"), (6L, "ababab"), (7L, "xyz"))
      if t.contains(n)
    } yield (did, nid)).toSet
    assert(got == want,
      s"missing=${want -- got} extra=${got -- want}")
  }

  test("contam_exact_ac equals contam_exact_substr row for row") {
    val ac = CorpusSourceQueries.queries("contam_exact_ac")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cj = CorpusSourceQueries.queries("contam_exact_substr")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ac == cj, s"diff=${(ac -- cj) ++ (cj -- ac)}")
  }
}
