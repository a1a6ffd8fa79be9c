package graft

import org.apache.spark.sql.functions._

import graft.ext.Contam

/** Decontamination at corpus scale: 10^6 documents swept against a
  * 5,000-needle eval suite through the broadcast Aho-Corasick automaton —
  * one forward pass per document regardless of needle count. 50k
  * documents carry a PLANTED needle spliced mid-text; the spec asserts
  * every planted hit is found, zero false hits, and reports wall time.
  * (`SPARK_GRAFT_CONTAM_N` shrinks the corpus for local iteration.)
  */
class ContamScaleSpec extends SparkSpec {

  private val n: Long = sys.env.get("SPARK_GRAFT_CONTAM_N").map(_.toLong)
    .getOrElse(1000000L)
  private val nNeedles = 5000L
  private val nPlanted: Long = n / 20

  test(s"broadcast Aho-Corasick at $n docs x $nNeedles needles: all " +
      "planted hits found, none invented") {
    // needle k = a distinctive 3-token phrase; document words are 5-char
    // base36 tokens, so needles (prefixed 'qq') can never occur by chance
    def needleExpr(k: String): String =
      s"concat('qq', CAST($k AS STRING), ' eval phrase ', CAST($k AS STRING))"
    val needles = spark.range(0, nNeedles).toDF("needle_id")
      .withColumn("needle", expr(needleExpr("needle_id")))
    val baseText =
      s"""array_join(transform(sequence(0, 29),
         |  j -> lpad(conv(CAST(abs(hash(concat(CAST(id AS STRING), '-',
         |       CAST(j AS STRING)))) % 999983 AS STRING), 10, 36), 5, 'z')),
         | ' ')""".stripMargin
    // planted docs (id < nPlanted) splice needle (id % nNeedles) mid-text
    val docs = spark.range(0, n).toDF("id")
      .withColumn("text",
        when(col("id") < nPlanted,
          concat(expr(baseText), lit(" "),
            expr(needleExpr(s"(id % ${nNeedles}L)")), lit(" tail")))
          .otherwise(expr(baseText)))

    val t0 = System.nanoTime()
    val hits = Contam.exactSubstringsAC(docs, needles,
      "text", "id", "needle_id", "needle").localCheckpoint()
    val nHits = hits.count()
    val wallS = (System.nanoTime() - t0) / 1e9

    val correct = hits.where(col("id") < nPlanted &&
      col("needle_id") === col("id") % nNeedles).count()
    println(f"CONTAMSCALE n=$n needles=$nNeedles wall=${wallS}%.1f " +
      f"hits=$nHits correct=$correct")
    info(f"CONTAM-SCALE n=$n wall=${wallS}%.1f s, $nHits hits")
    assert(correct == nPlanted, s"missed planted needles: $correct/$nPlanted")
    assert(nHits == nPlanted, s"invented hits: $nHits total vs $nPlanted planted")
  }
}
