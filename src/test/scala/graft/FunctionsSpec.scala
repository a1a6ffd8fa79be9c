package graft

import org.apache.spark.sql.functions._

/** Equivalence proofs for the native Catalyst expressions: numerically
  * identical to the built-in md5-hex chains they replace (which is what
  * keeps the DuckDB oracle contract intact). */
class FunctionsSpec extends SparkSpec {

  test("md5prefix64 == conv(substr(md5(x),1,15),16,10) on arbitrary strings") {
    val df = spark.range(2000).select(
      concat(lit("probe-"), col("id").cast("string")).as("s"))
    val mismatches = df.select(
      expr("md5prefix64(cast(s as binary))").as("fast"),
      expr("cast(conv(substr(md5(cast(s as binary)), 1, 15), 16, 10) as bigint)")
        .as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("md5lanes4 == the four ('0x'||substr(md5,1+8j,8)) hex slices") {
    val df = spark.range(2000).select(
      concat(lit("lane-"), col("id").cast("string")).as("s"))
    val slices = (0 until 4).map(j =>
      s"cast(conv(substr(md5(cast(s as binary)), ${1 + 8 * j}, 8), 16, 10) as bigint)")
      .mkString("array(", ", ", ")")
    val mismatches = df.select(
      expr("md5lanes4(cast(s as binary))").as("fast"),
      expr(slices).as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("norm_alnum == trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ')) incl. unicode") {
    import spark.implicits._
    val adversarial = Seq(
      "", "   ", "Hello,  World!", "\ttabs\nand\r\nnewlines", "ALL CAPS 123",
      "--leading & trailing--", "héllo wörld", "日本語テキスト mixed latin",
      "emoji 🙂 in 🚀 text", "a", "7", "İstanbul I ı", "a-b_c.d/e\\f",
      "double  space   runs", "ümlaut ÄÖÜ ß", "ça va déjà")
    val fromDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text").as("s"))
    val df = adversarial.toDF("s").unionByName(fromDocs)
    val mismatches = df.select(
      expr("norm_alnum(s)").as("fast"),
      expr("trim(regexp_replace(lower(s), '[^a-z0-9]+', ' '))").as("ref"))
      .where(col("fast") =!= col("ref") ||
        col("fast").isNull =!= col("ref").isNull).count()
    assert(mismatches == 0)
  }

  test("ngram_stats == array_distinct/array_intersect pipeline on ASCII text") {
    import spark.implicits._
    val k = 4
    // normalized docs + degenerate cases: empty, shorter-than-k, exactly-k
    val adversarial = Seq("", "ab", "abcd", "aaaa aaaa", "a b c d e")
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr("norm_alnum(text)").as("s"))
      .unionByName(adversarial.toDF("s"))
    val probe = Seq("abcd", "bcd ", "aaa", "zzzz", "a", "")
      .map(g => s"'$g'").mkString("array(", ", ", ")")
    val grams = s"array_distinct(transform(sequence(1, greatest(length(s) - ${k - 1}, 1)), " +
      s"i -> substr(s, i, $k)))"
    val mismatches = texts.select(
        expr(s"ngram_stats(s, $probe, $k)").as("st"),
        expr(s"size($grams)").as("ref_distinct"),
        expr(s"size(array_intersect($grams, $probe))").as("ref_inter"))
      .where(shiftrightunsigned(col("st"), 32) =!= col("ref_distinct") ||
        col("st").bitwiseAND(lit(0xffffffffL)) =!= col("ref_inter")).count()
    assert(mismatches == 0)
    // null text -> null stats
    assert(spark.sql(s"select ngram_stats(cast(null as string), $probe, $k)")
      .head().isNullAt(0))
    // non-foldable probe is rejected at analysis
    intercept[Exception] {
      texts.select(expr(s"ngram_stats(s, array(s), $k)")).head()
    }
  }

  test("pq_encode == the portable lambda chain (incl. tie and null handling)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (dim, nSub, nCode) = (64, 8, 16)
    val dsub = dim / nSub
    // deterministic codebook: nCode distinct corpus vectors
    val cb: Seq[Seq[Double]] = embs.orderBy("vec_id").limit(nCode)
      .collect().toSeq.map(_.getSeq[Float](1).map(_.toDouble))
    val cbRow = Seq(Tuple1(cb)).toDF("_cb")
    val both = embs.crossJoin(broadcast(cbRow))
      .select(col("vec_id"),
        call_function("pq_encode", col("embedding"), col("_cb"), lit(nSub)).as("fast"),
        expr(
          s"""transform(sequence(1, $nSub), s ->
             |  aggregate(
             |    zip_with(_cb, sequence(1, $nCode), (cv, c) -> struct(c as c,
             |      aggregate(
             |        zip_with(slice(embedding, (s - 1) * $dsub + 1, $dsub),
             |                 slice(cv, (s - 1) * $dsub + 1, $dsub),
             |          (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),
             |        cast(0.0 as double), (a, v) -> a + v) as d)),
             |    struct(cast(0 as int) as c, cast('Infinity' as double) as d),
             |    (acc, e) -> if(e.d < acc.d, e, acc)).c)""".stripMargin).as("ref"))
    assert(both.where(col("fast") =!= col("ref")).count() == 0)
    // ties break to the smallest code: a duplicated codeword never wins
    val dupCb = Seq(Tuple1(Seq(cb.head, cb.head, cb(1)))).toDF("_cb")
    val tied = embs.limit(50).crossJoin(broadcast(dupCb))
      .select(call_function("pq_encode", col("embedding"), col("_cb"), lit(nSub)).as("c"))
      .select(explode(col("c")).as("code"))
    assert(tied.where(col("code") === 2).count() == 0)
    // null vector → null codes
    assert(spark.sql("select pq_encode(cast(null as array<float>), array(array(0.0d)), 1)")
      .head().isNullAt(0))
  }

  test("top_gram_share == array_max(transform(array_distinct...)) chain") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("_t", graft.ext.TextOps.tokens(col("text")))
      .withColumn("_g", graft.ext.TextOps.wordNgrams("_t", 2))
    val both = docs.select(
      expr("top_gram_share(_g)").as("fast"),
      expr("""array_max(transform(array_distinct(_g), x ->
             | size(filter(_g, y -> y = x))))
             | / cast(greatest(size(_g), 1) as double)""".stripMargin).as("ref"))
    assert(both.where(col("fast") =!= col("ref")).count() == 0)
    assert(both.where(col("fast").isNull =!= col("ref").isNull).count() == 0)
    // empty array → NULL (the array_max([]) convention AVG then skips)
    assert(spark.sql("select top_gram_share(cast(array() as array<string>))")
      .head().isNullAt(0))
    assert(spark.sql("select top_gram_share(cast(null as array<string>))")
      .head().isNullAt(0))
  }

  test("cosine_sim == try_divide(dot, norm*norm) lambda chain (incl. zero-norm → NULL)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = embs.orderBy("vec_id").head().getSeq[Float](1).map(_.toDouble)
    val qArr = array(q.map(lit): _*)
    def refCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, r) => p.cast("double") * r.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      try_divide(dot(a, b), sqrt(dot(a, a)) * sqrt(dot(b, b)))
    }
    val both = embs.select(
      expr("cosine_sim(embedding, embedding)").as("self_fast"),
      refCosine(col("embedding"), col("embedding")).as("self_ref"),
      call_function("cosine_sim", col("embedding"), qArr).as("q_fast"),
      refCosine(col("embedding"), qArr).as("q_ref"))
    assert(both.where(col("self_fast") =!= col("self_ref")).count() == 0)
    assert(both.where(col("q_fast") =!= col("q_ref")).count() == 0)
    // zero-norm → NULL (try_divide convention), length mismatch → NULL
    assert(spark.sql(
      "select cosine_sim(array(0.0d, 0.0d), array(1.0d, 2.0d))").head().isNullAt(0))
    assert(spark.sql(
      "select cosine_sim(array(1.0d), array(1.0d, 2.0d))").head().isNullAt(0))
  }

  test("simhash16 == the 16-filter-pass majority-vote chain") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("_t", graft.ext.TextOps.tokens(col("text")))
      .withColumn("_hs", graft.ext.TextOps.tokenHashes("_t"))
    val refBits = (0 until 16).map { b =>
      s"(case when 2 * size(filter(_hs, h -> (shiftright(h, $b) & 1) = 1)) >= size(_hs) " +
        s"then ${1 << b} else 0 end)"
    }
    val both = docs.select(
      expr("simhash16(_hs)").as("fast"),
      expr(s"cast((${refBits.mkString(" + ")}) as int)").as("ref"))
    assert(both.where(col("fast") =!= col("ref")).count() == 0)
    // empty array: every majority vote is 2*0 >= 0 → all 16 bits set
    assert(spark.sql("select simhash16(cast(array() as array<bigint>))")
      .head().getInt(0) == 65535)
    assert(spark.sql("select simhash16(cast(null as array<bigint>))")
      .head().isNullAt(0))
  }

  test("minhash_sig == shingles→minhashSig expression pipeline") {
    import spark.implicits._
    val adversarial = Seq("", "ab", "abcdefgh", "abcdefghi", "aaaa bbbb cccc dddd")
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr("norm_alnum(text)").as("_norm"))
      .unionByName(adversarial.toDF("_norm"))
    val ref = texts
      .withColumn("_sh", graft.ext.TextOps.shingles("_norm", 8, 4))
      .select(graft.ext.TextOps.minhashSig("_sh", 8).as("ref"),
        expr("minhash_sig(_norm, 8, 8, 4)").as("fast"))
    assert(ref.where(col("fast") =!= col("ref")).count() == 0)
    assert(spark.sql("select minhash_sig(cast(null as string), 8, 8, 4)")
      .head().isNullAt(0))
  }

  test("GraftExtensions installs both the rewrites and the full function family") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext) // must accept every descriptor
    assert(graft.functions.GraftFunctions.descriptors.map(_._1.funcName).toSet ==
      Set("md5prefix64", "md5lanes4", "norm_alnum", "ngram_stats", "minhash_sig",
        "misra_gries", "bitset_agg", "pq_encode", "top_gram_share", "simhash16",
        "cosine_sim"))
  }

  test("optimizer rule rewrites built-in chains to native expressions in user SQL") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // parquet-backed (a literal relation would be constant-folded whole)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text").as("s"))
    df.createOrReplaceTempView("rw_probe")
    // user writes the documented portable chains; the optimizer swaps in
    // norm_alnum / md5prefix64 (GraftRewrites via extraOptimizations)
    val q = spark.sql(
      """select trim(regexp_replace(lower(s), '[^a-z0-9]+', ' ')) as n,
        |       cast(conv(substr(md5(cast(s as binary)), 1, 15), 16, 10) as bigint) as h
        |from rw_probe""".stripMargin)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("norm_alnum"), opt)
    assert(opt.contains("md5prefix64"), opt)
    assert(!opt.contains("regexp_replace"), opt)
    // and the rewritten plan computes the same values
    val rows = q.collect().map(r => (r.getString(0), r.getLong(1)))
    val ref = df.select(
      expr("norm_alnum(s)"), expr("md5prefix64(cast(s as binary))"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == ref.toSeq)
  }

  test("md5prefix64 survives whole-stage codegen (no interpreted fallback)") {
    // force evaluation through a codegen'd projection over a real scan
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr("md5prefix64(cast(text as binary))").as("h"))
    assert(df.agg(countDistinct(col("h"))).head().getLong(0) > 400)
    // the expression must not be CodegenFallback
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.functions.Md5Prefix64]))
  }
}
