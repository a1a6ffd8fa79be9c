package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.{Linkage, Relevance, Similarity}
import graft.operators.Ops

/** Semantic gates for the round-6 relevance / linkage / gramian operators:
  * hand-computed values on toy inputs (the same three-layer strategy as the
  * rest of the suite — the DuckDB oracle checks the full corpus, these pin
  * the math itself).
  */
class RelevanceSpec extends SparkSpec {

  import spark.implicits._

  test("tfidfTopK: a term unique to one doc outranks corpus-wide terms") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "alpha beta epsilon")).toDF("doc_id", "text")
    val top = Relevance.tfidfTopK(docs, "doc_id", "text", 1)
      .orderBy("doc_id").collect()
    // 'alpha'/'beta' appear in every doc (idf = ln(4/4) = 0); the unique
    // term scores ln(4/2) > 0 and must win each doc's top slot
    assert(top.map(_.getString(1)).toSeq == Seq("gamma", "delta", "epsilon"))
    val expected = math.round(math.log(4.0 / 2.0) * 1e6) / 1e6
    top.foreach(r => assert(r.getDouble(3) == expected, r))
  }

  test("bm25TopK: the doc matching more query terms ranks first") {
    val docs = Seq(
      (1L, "spark join stream spark"),
      (2L, "spark filler filler filler"),
      (3L, "noise noise noise noise")).toDF("doc_id", "text")
    val got = Relevance.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join", "stream"), 10).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))  // doc 3 never scores
    assert(got(0).getLong(2) == 3L && got(1).getLong(2) == 1L) // n_terms
  }

  test("bigramNll: add-k smoothed bigram probabilities, hand-computed") {
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "x z")).toDF("doc_id", "text")
    // c2(x y)=2, c2(x z)=1, c1(x)=3, V=|{x}|=1, α=0.5
    val got = Relevance.bigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    def r6(d: Double) = math.round(d * 1e6) / 1e6
    val nllXY = r6(-math.log(2.5 / 3.5))
    val nllXZ = r6(-math.log(1.5 / 3.5))
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 1L, nllXY), (2L, 1L, nllXY), (3L, 1L, nllXZ)))
  }

  test("bigramNll: single-token and empty docs produce no fabricated bigrams") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val got = Relevance.bigramNll(docs, "doc_id", "text").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("editJoin recall: every true (name, perturbed) pair within the " +
    "distance bound survives blocking") {
    val names = Seq("small ring", "small king", "red widget", "blue bolt",
      "banana rack", "grand panel")
    val clean = names.toDF("name")
    val dirty = clean.select(regexp_replace(col("name"), "a", "").as("d"))
    val pairs = Linkage.editJoin(clean, "name", dirty, "d", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    names.foreach { n =>
      val d = n.replace("a", "")
      val dist = n.length - d.length
      if (dist <= 2)
        assert(pairs.contains((n, d, dist)), s"missing true pair $n -> $d")
    }
    // 'banana rack' drops 4 a's — outside the bound, must NOT appear
    assert(!pairs.exists(_._1 == "banana rack"))
    // blocking also finds cross-name near-matches, never false distances
    pairs.foreach { case (l, r, dist) =>
      assert(dist <= 2 && dist >= 0)
    }
  }

  test("gramian: exact upper-tri sums on a toy corpus") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(4.0f, 5.0f, 6.0f))).toDF("vec_id", "embedding")
    val got = Similarity.gramian(df, "embedding", 3)
      .orderBy("i", "j").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got == Map(
      (1, 1) -> 17.0, (1, 2) -> 22.0, (1, 3) -> 27.0,
      (2, 2) -> 29.0, (2, 3) -> 36.0, (3, 3) -> 45.0))
  }

  test("twoStageDistinct equals the direct countDistinct") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val direct = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val staged = Ops.twoStageDistinct(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(staged == direct)
  }
}
