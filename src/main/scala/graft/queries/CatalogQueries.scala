package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.GraftSchema
import graft.table.GraftTableGenerator

/** One JVM-wide catalog warehouse: the `spark.sql.catalog.graft.warehouse`
  * conf is session-global, so every catalog consumer (queries, specs)
  * points at the SAME directory — a per-consumer warehouse would race the
  * conf under sbt's concurrent suite execution. */
object CatalogFixture {
  lazy val warehouse: String =
    Files.createTempDirectory("graft-catalog-wh").toString
  def ensure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
  }
}

/** Declared keys for the DSv2 catalog surface (SQL by table name —
  * SELECT / INSERT / DELETE / UPDATE / MERGE / time travel). Fixtures are
  * spark.range-derived (exact integer arithmetic), built once per JVM with
  * ALL mutation (the SQL DML under test) inside the builder, so the query
  * functions are pure reads and re-runnable by the bench harness.
  *
  * The fixtures REQUIRE the session to carry
  * `spark.sql.extensions=graft.plans.GraftExtensions` (scan substitution +
  * DML capture are analyzer rules, which cannot be injected post-hoc) —
  * Verify/Bench/Smoke and the shared test session all do.
  */
object CatalogQueries {

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def idVal: GraftSchema = GraftSchema.of(
    "id" -> LongType, "part" -> StringType, "val" -> LongType)

  private def baseRows(spark: SparkSession, n: Int): DataFrame =
    spark.range(0, n).toDF("id")
      .withColumn("part", when(col("id") < n / 2, lit("a")).otherwise(lit("b")))
      .withColumn("val", col("id") * 2)

  /** ids 0..399 (part a/b at 200), val = 2·id; SQL DELETE kills id%10=7. */
  private def scanT(spark: SparkSession): Unit =
    built.computeIfAbsent("scan_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "scan_t")
        .create(idVal, Seq("part"))
        .appendData(baseRows(spark, 400)).commit()
      spark.sql("DELETE FROM graft.cq.scan_t WHERE id % 10 = 7")
      "scan_t"
    })

  /** ids 0..99 part a; SQL INSERT VALUES (part c) + INSERT SELECT (part d). */
  private def insT(spark: SparkSession): Unit =
    built.computeIfAbsent("ins_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "ins_t")
        .create(idVal, Seq("part"))
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("part", lit("a")).withColumn("val", col("id") * 2))
        .commit()
      spark.sql("INSERT INTO graft.cq.ins_t VALUES " +
        "(1000, 'c', 7), (1001, 'c', 9), (1002, 'c', 11)")
      spark.sql("INSERT INTO graft.cq.ins_t " +
        "SELECT id, 'd' AS part, id * 5 AS val FROM range(2000, 2050)")
      "ins_t"
    })

  /** ids 0..399; DELETE of part a's whole range (metadata-tier file drop)
    * then a modulo DELETE (positional tombstones) on the rest. */
  private def delT(spark: SparkSession): Unit =
    built.computeIfAbsent("del_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "del_t")
        .create(idVal, Seq("part"))
        .appendData(baseRows(spark, 400)).commit()
      spark.sql("DELETE FROM graft.cq.del_t WHERE id >= 0 AND id <= 199")
      spark.sql("DELETE FROM graft.cq.del_t WHERE id % 7 = 0")
      "del_t"
    })

  /** ids 0..199; two SQL UPDATEs: constant-set over a range, then an
    * expression set (val = val + 1) over another. */
  private def updT(spark: SparkSession): Unit =
    built.computeIfAbsent("upd_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "upd_t")
        .create(idVal, Seq("part"))
        .appendData(baseRows(spark, 200)).commit()
      spark.sql("UPDATE graft.cq.upd_t SET val = id * 10 " +
        "WHERE id >= 50 AND id <= 99")
      spark.sql("UPDATE graft.cq.upd_t SET val = val + 1 WHERE id < 10")
      "upd_t"
    })

  /** The mor_merge twin driven from SQL: base ids 0..399 val 2·id, source
    * 300..499 val 3·id with op D on id%10=0; MERGE INTO with conditional
    * DELETE / UPDATE SET * / INSERT *. End state must hash-match the API
    * twin's oracle. */
  private def mergeT(spark: SparkSession): Unit =
    built.computeIfAbsent("merge_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "merge_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 400).toDF("id")
          .withColumn("val", col("id") * 2))
        .commit()
      spark.range(300, 500).toDF("id")
        .withColumn("val", col("id") * 3)
        .withColumn("op",
          when(col("id") % 10 === 0, lit("D")).otherwise(lit("U")))
        .createOrReplaceTempView("graft_sql_merge_src")
      spark.sql(
        """MERGE INTO graft.cq.merge_t t USING graft_sql_merge_src s
          |ON t.id = s.id
          |WHEN MATCHED AND s.op = 'D' THEN DELETE
          |WHEN MATCHED AND s.id % 7 <> 0 THEN UPDATE SET *
          |WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *
          |""".stripMargin)
      "merge_t"
    })

  /** Catalog views over MoR state: base ids 0..299 val 2·id with a modulo
    * DELETE; `view_v` projects+renames under a column list, `view_agg`
    * nests a view over the view, and `view_v1` pins VERSION AS OF 1 inside
    * its body. */
  private def viewT(spark: SparkSession): Unit =
    built.computeIfAbsent("view_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "view_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 200).toDF("id")
          .withColumn("val", col("id") * 2))
        .commit()
      spark.sql("INSERT INTO graft.cq.view_t " +
        "SELECT id, id * 2 AS val FROM range(200, 300)")
      spark.sql("DELETE FROM graft.cq.view_t WHERE id % 10 = 3")
      spark.sql("CREATE VIEW graft.cq.view_v (vid, vval) AS " +
        "SELECT id, val FROM graft.cq.view_t WHERE id < 250")
      spark.sql("CREATE VIEW graft.cq.view_agg AS " +
        "SELECT vid % 7 AS g, COUNT(*) AS n, SUM(vval) AS s " +
        "FROM graft.cq.view_v GROUP BY vid % 7")
      spark.sql("CREATE VIEW graft.cq.view_v1 AS " +
        "SELECT COUNT(*) AS n FROM graft.cq.view_t VERSION AS OF 1")
      "view_t"
    })

  /** Atomic CREATE OR REPLACE (idempotent-pipeline CoR-TAS): v1 is ids
    * 0..49 under one schema; the pipeline then runs its CoR-TAS TWICE
    * (idempotency — same output either way) producing ids 0..79 with a
    * different schema. REPLACE preserves nothing from v1. */
  private def replaceT(spark: SparkSession): Unit =
    built.computeIfAbsent("replace_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.replace_t (id BIGINT, part STRING) " +
        "PARTITIONED BY (part)")
      spark.sql("INSERT INTO graft.cq.replace_t " +
        "SELECT id, 'a' AS part FROM range(0, 50)")
      for (_ <- 1 to 2)
        spark.sql("CREATE OR REPLACE TABLE graft.cq.replace_t AS " +
          "SELECT id, id * 7 AS sept FROM range(0, 80)")
      "replace_t"
    })

  /** Semi/anti-join DELETE via subqueries: ids 0..299 val 2·id; the source
    * view holds ids 0..249 with keep = id%4. `DELETE WHERE EXISTS(id match
    * AND keep = 0)` kills the id%4=0 rows the source covers (one eq-delete
    * file straight off the subquery — zero target scans), then `DELETE
    * WHERE NOT EXISTS(id match)` is the retention idiom — rows absent from
    * the source (250..299) die by anti-join. */
  private def existsT(spark: SparkSession): Unit =
    built.computeIfAbsent("exists_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "exists_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 300).toDF("id")
          .withColumn("val", col("id") * 2))
        .commit()
      spark.range(0, 250).toDF("id").withColumn("keep", col("id") % 4)
        .createOrReplaceTempView("graft_sql_exists_src")
      spark.sql(
        """DELETE FROM graft.cq.exists_t t WHERE EXISTS (
          |  SELECT 1 FROM graft_sql_exists_src s
          |  WHERE s.id = t.id AND s.keep = 0)""".stripMargin)
      spark.sql(
        """DELETE FROM graft.cq.exists_t t WHERE NOT EXISTS (
          |  SELECT 1 FROM graft_sql_exists_src s WHERE s.id = t.id)""".stripMargin)
      "exists_t"
    })

  /** Semi/anti-join UPDATE via subqueries: ids 0..99 val 2·id; source
    * keys 0..59 (with duplicates — id%60 over 0..119, which must not trip
    * merge cardinality). EXISTS adds 1000 to covered rows; NOT EXISTS
    * stamps the uncovered rest with -1. */
  private def updExistsT(spark: SparkSession): Unit =
    built.computeIfAbsent("updex_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "updex_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("val", col("id") * 2))
        .commit()
      spark.range(0, 120).selectExpr("id % 60 AS k")
        .createOrReplaceTempView("graft_sql_updex_src")
      spark.sql(
        """UPDATE graft.cq.updex_t t SET val = t.val + 1000 WHERE EXISTS (
          |  SELECT 1 FROM graft_sql_updex_src s WHERE s.k = t.id)""".stripMargin)
      spark.sql(
        """UPDATE graft.cq.updex_t t SET val = -1 WHERE NOT EXISTS (
          |  SELECT 1 FROM graft_sql_updex_src s WHERE s.k = t.id)""".stripMargin)
      "updex_t"
    })

  /** Non-star MERGE: target ids 0..199 val 2·id; source 100..299 carries
    * only (id, bonus = id%7) — no val column. Matched rows (unless
    * id%10=5) take `val = t.val + s.bonus` (an expression over BOTH
    * sides); unmatched insert via an explicit column list. */
  private def mergeExprT(spark: SparkSession): Unit =
    built.computeIfAbsent("mexpr_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "mexpr_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 200).toDF("id")
          .withColumn("val", col("id") * 2))
        .commit()
      spark.range(100, 300).toDF("id").withColumn("bonus", col("id") % 7)
        .createOrReplaceTempView("graft_sql_mexpr_src")
      spark.sql(
        """MERGE INTO graft.cq.mexpr_t t USING graft_sql_mexpr_src s
          |ON t.id = s.id
          |WHEN MATCHED AND s.id % 10 <> 5 THEN UPDATE SET val = t.val + s.bonus
          |WHEN NOT MATCHED THEN INSERT (id, val) VALUES (s.id, s.bonus * 100)
          |""".stripMargin)
      "mexpr_t"
    })

  /** Static partition overwrite: parts a (0..9) and b (10..29); INSERT
    * OVERWRITE PARTITION (part='a') replaces ONLY partition a with ids
    * 100..102 (metadata-tier file drop + append, one snapshot). */
  private def ovwPartT(spark: SparkSession): Unit =
    built.computeIfAbsent("ovwp_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.ovwp_t (id BIGINT, part STRING) " +
        "PARTITIONED BY (part)")
      spark.sql("INSERT INTO graft.cq.ovwp_t SELECT id, 'a' FROM range(0, 10)")
      spark.sql("INSERT INTO graft.cq.ovwp_t SELECT id, 'b' FROM range(10, 30)")
      spark.sql("INSERT OVERWRITE graft.cq.ovwp_t PARTITION (part = 'a') " +
        "SELECT id FROM range(100, 103)")
      "ovwp_t"
    })

  /** UPDATE SET with a correlated-by-key scalar AGGREGATE subquery (the
    * enrichment JOIN): covered keys take the per-key aggregate (+10),
    * uncovered keys take NULL, untouched rows keep 2·id. */
  private def updCorrT(spark: SparkSession): Unit =
    built.computeIfAbsent("ucorr_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "ucorr_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("val", col("id") * 2)).commit()
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "ucorr_src")
        .create(GraftSchema.of("id" -> LongType, "w" -> LongType), Nil)
        .appendData(spark.range(0, 50).toDF("id")
          .withColumn("w", col("id") % 7)).commit()
      spark.sql("UPDATE graft.cq.ucorr_t SET val = (SELECT MAX(w) " +
        "FROM graft.cq.ucorr_src s WHERE s.id = ucorr_t.id) + 10 " +
        "WHERE id % 2 = 0")
      "ucorr_t"
    })

  /** UPDATE WHERE [NOT] EXISTS with a non-equality correlated conjunct
    * (the event-time-band enrichment): ids 0..299 ts=10·id val=2·id;
    * source covers 0..199 with sts in the ±5 band iff even — and even
    * ids < 100 carry TWO in-band witnesses (EXISTS semantics must not
    * trip any cardinality rule). EXISTS adds 1000 to in-band rows; the
    * NOT EXISTS leg (with a target-only scan conjunct) stamps unwitnessed
    * rows under 100 with -1. */
  private def updExistsResidT(spark: SparkSession): Unit =
    built.computeIfAbsent("updexres_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "updexres_t")
        .create(GraftSchema.of("id" -> LongType, "ts" -> LongType,
          "val" -> LongType), Nil)
        .appendData(spark.range(0, 300).toDF("id")
          .withColumn("ts", col("id") * 10)
          .withColumn("val", col("id") * 2)).commit()
      spark.range(0, 200).toDF("id")
        .withColumn("sts", col("id") * 10 +
          when(col("id") % 2 === 0, lit(3L)).otherwise(lit(50L)))
        .unionByName(spark.range(0, 100).toDF("id")
          .withColumn("sts", col("id") * 10 +
            when(col("id") % 2 === 0, lit(5L)).otherwise(lit(60L))))
        .createOrReplaceTempView("graft_sql_updexres_src")
      spark.sql(
        """UPDATE graft.cq.updexres_t SET val = val + 1000 WHERE EXISTS (
          |  SELECT 1 FROM graft_sql_updexres_src s
          |  WHERE s.id = updexres_t.id
          |    AND s.sts BETWEEN updexres_t.ts - 5 AND updexres_t.ts + 5)
          |""".stripMargin)
      spark.sql(
        """UPDATE graft.cq.updexres_t SET val = -1 WHERE NOT EXISTS (
          |  SELECT 1 FROM graft_sql_updexres_src s
          |  WHERE s.id = updexres_t.id
          |    AND s.sts BETWEEN updexres_t.ts - 5 AND updexres_t.ts + 5)
          |  AND id < 100
          |""".stripMargin)
      "updexres_t"
    })

  /** UPDATE SET with a correlated COUNT subquery — the empty-group-is-0
    * shape the grouped decorrelation must get right on BOTH uncovered
    * legs: source rows are (k = id%60, x = id) over 0..149 with the
    * count filtered to x >= 120, so even keys 0..29 count 1, even keys
    * 30..59 count 0 (covered key, every row filtered out — the group
    * vanishes), even keys 60..98 count 0 (key never in the source). */
  private def updCorrCountT(spark: SparkSession): Unit =
    built.computeIfAbsent("ucorrcnt_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "ucorrcnt_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("val", col("id") * 2)).commit()
      spark.range(0, 150).selectExpr("id % 60 AS k", "id AS x")
        .createOrReplaceTempView("graft_sql_ucorrcnt_src")
      spark.sql("UPDATE graft.cq.ucorrcnt_t SET val = (SELECT COUNT(*) " +
        "FROM graft_sql_ucorrcnt_src s WHERE s.k = ucorrcnt_t.id " +
        "AND s.x >= 120) WHERE id % 2 = 0")
      "ucorrcnt_t"
    })

  /** UPDATE SET with TWO correlated scalar aggregate subqueries over
    * DIFFERENT sources (same key): the decorrelated per-key aggregates
    * full-outer join on the key, and each on-empty value substitutes
    * independently — MAX over an uncovered key reads NULL, COUNT reads 0
    * even where the other aggregate matched. */
  private def updCorrMultiT(spark: SparkSession): Unit =
    built.computeIfAbsent("ucorrm_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "ucorrm_t")
        .create(GraftSchema.of("id" -> LongType, "a" -> LongType,
          "b" -> LongType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("a", col("id"))
          .withColumn("b", col("id"))).commit()
      spark.range(0, 50).toDF("id").withColumn("w", col("id") % 7)
        .createOrReplaceTempView("graft_sql_ucorrm_s1")
      spark.range(0, 150).selectExpr("id % 60 AS k", "id AS x")
        .createOrReplaceTempView("graft_sql_ucorrm_s2")
      spark.sql(
        """UPDATE graft.cq.ucorrm_t SET
          |  a = (SELECT MAX(w) FROM graft_sql_ucorrm_s1 s
          |       WHERE s.id = ucorrm_t.id),
          |  b = (SELECT COUNT(*) FROM graft_sql_ucorrm_s2 s
          |       WHERE s.k = ucorrm_t.id AND s.x >= 120)""".stripMargin)
      "ucorrm_t"
    })

  /** DELETE WHERE EXISTS with a non-equality correlated conjunct (the
    * event-time band): ids 0..299 ts=10·id; source ids 0..199 with
    * sts = 10·id + (3 if id even else 50) — in the ±5 band iff even. */
  private def existsResidT(spark: SparkSession): Unit =
    built.computeIfAbsent("exres_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "exres_t")
        .create(GraftSchema.of("id" -> LongType, "ts" -> LongType,
          "val" -> LongType), Nil)
        .appendData(spark.range(0, 300).toDF("id")
          .withColumn("ts", col("id") * 10)
          .withColumn("val", col("id") * 2)).commit()
      spark.range(0, 200).toDF("id")
        .withColumn("sts", col("id") * 10 +
          when(col("id") % 2 === 0, lit(3L)).otherwise(lit(50L)))
        .createOrReplaceTempView("graft_sql_exres_src")
      spark.sql(
        """DELETE FROM graft.cq.exres_t WHERE EXISTS (
          |  SELECT 1 FROM graft_sql_exres_src s
          |  WHERE s.id = exres_t.id
          |    AND s.sts BETWEEN exres_t.ts - 5 AND exres_t.ts + 5)
          |""".stripMargin)
      "exres_t"
    })

  /** Multiple conditioned MERGE actions with expression assignments:
    * first-match-wins across an interleaved UPDATE/DELETE/UPDATE matched
    * group and a two-action INSERT group. */
  private def mergeMultiT(spark: SparkSession): Unit =
    built.computeIfAbsent("mmulti_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "mmulti_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType,
          "note" -> StringType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("val", col("id") * 2)
          .withColumn("note", lit("base"))).commit()
      spark.range(50, 150).toDF("id").withColumn("bonus", col("id") % 5)
        .createOrReplaceTempView("graft_sql_mmulti_src")
      spark.sql(
        """MERGE INTO graft.cq.mmulti_t t USING graft_sql_mmulti_src s
          |ON t.id = s.id
          |WHEN MATCHED AND s.id % 10 = 0 THEN UPDATE SET val = -1, note = 'ten'
          |WHEN MATCHED AND s.id % 10 = 1 THEN DELETE
          |WHEN MATCHED AND s.id % 2 = 0 THEN UPDATE SET val = t.val + s.bonus
          |WHEN NOT MATCHED AND s.id % 10 = 0 THEN INSERT (id, val, note)
          |  VALUES (s.id, -100, 'newten')
          |WHEN NOT MATCHED AND s.id % 2 = 1 THEN INSERT (id, val)
          |  VALUES (s.id, s.bonus)
          |""".stripMargin)
      "mmulti_t"
    })

  /** UPDATE SET with an uncorrelated scalar subquery (the enrichment
    * idiom): the subquery runs once at execute time and substitutes as a
    * literal. usub_src ids 0..49 → MAX(id)=49. */
  private def updSubqT(spark: SparkSession): Unit =
    built.computeIfAbsent("usub_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "usub_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("val", col("id") * 2)).commit()
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "usub_src")
        .create(GraftSchema.of("id" -> LongType), Nil)
        .appendData(spark.range(0, 50).toDF("id")).commit()
      spark.sql("UPDATE graft.cq.usub_t " +
        "SET val = (SELECT MAX(id) FROM graft.cq.usub_src) + id " +
        "WHERE id % 3 = 0")
      "usub_t"
    })

  /** Composite multi-column IN (<subquery>) DELETE: the tuple IN plus a
    * target-only conjunct routes to the semi-join with the conjunct as
    * the scan filter — ids 0..199 (grp = id%3, val = id); the source
    * covers (id, grp) for ids 0..99; even covered ids die. */
  private def delInCompT(spark: SparkSession): Unit =
    built.computeIfAbsent("delincomp_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "delincomp_t")
        .create(GraftSchema.of("id" -> LongType, "grp" -> LongType,
          "val" -> LongType), Nil)
        .appendData(spark.range(0, 200).toDF("id")
          .withColumn("grp", col("id") % 3)
          .withColumn("val", col("id"))).commit()
      spark.range(0, 100).toDF("id").withColumn("grp", col("id") % 3)
        .createOrReplaceTempView("graft_sql_delincomp_src")
      spark.sql(
        """DELETE FROM graft.cq.delincomp_t
          |WHERE (id, grp) IN (SELECT id, grp FROM graft_sql_delincomp_src)
          |  AND val % 2 = 0""".stripMargin)
      "delincomp_t"
    })

  /** Composite multi-column IN (<subquery>) UPDATE — the DELETE twin:
    * even covered ids stamp val = -1 through the semi-join update. */
  private def updInCompT(spark: SparkSession): Unit =
    built.computeIfAbsent("updincomp_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "updincomp_t")
        .create(GraftSchema.of("id" -> LongType, "grp" -> LongType,
          "val" -> LongType), Nil)
        .appendData(spark.range(0, 200).toDF("id")
          .withColumn("grp", col("id") % 3)
          .withColumn("val", col("id"))).commit()
      spark.range(0, 100).toDF("id").withColumn("grp", col("id") % 3)
        .createOrReplaceTempView("graft_sql_updincomp_src")
      spark.sql(
        """UPDATE graft.cq.updincomp_t SET val = -1
          |WHERE (id, grp) IN (SELECT id, grp FROM graft_sql_updincomp_src)
          |  AND id % 2 = 0""".stripMargin)
      "updincomp_t"
    })

  /** `k NOT IN (<subquery>)` DELETE with SQL three-valued logic: a NULL
    * in the subquery makes the delete a NO-OP; against the clean source
    * (ids 0..59) the uncovered 60..99 die while the NULL-key target row
    * SURVIVES (NOT IN is UNKNOWN there — unlike NOT EXISTS). */
  private def delNotInT(spark: SparkSession): Unit =
    built.computeIfAbsent("delnotin_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "delnotin_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("val", col("id") * 2)
          .unionByName(spark.sql(
            "SELECT CAST(NULL AS BIGINT) AS id, CAST(-5 AS BIGINT) AS val")))
        .commit()
      spark.range(0, 60).toDF("id")
        .unionByName(spark.sql("SELECT CAST(NULL AS BIGINT) AS id"))
        .createOrReplaceTempView("graft_sql_delnotin_withnull")
      spark.range(0, 60).toDF("id")
        .createOrReplaceTempView("graft_sql_delnotin_clean")
      spark.sql("DELETE FROM graft.cq.delnotin_t WHERE id NOT IN " +
        "(SELECT id FROM graft_sql_delnotin_withnull)") // NULL → no-op
      spark.sql("DELETE FROM graft.cq.delnotin_t WHERE id NOT IN " +
        "(SELECT id FROM graft_sql_delnotin_clean)")
      "delnotin_t"
    })

  /** `ALTER TABLE … WRITE ORDERED BY id` DDL: later INSERTs lay rows out
    * sorted on id ((id·37) mod 1000 is a permutation, so the insert
    * arrives shuffled); content must round-trip exactly. Envelope
    * disjointness is spec-gated (CatalogSpec). */
  private def writeOrdDdlT(spark: SparkSession): Unit =
    built.computeIfAbsent("wodd_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.wodd_t (id BIGINT, v BIGINT)")
      spark.sql("ALTER TABLE graft.cq.wodd_t WRITE ORDERED BY id")
      spark.sql("INSERT INTO graft.cq.wodd_t " +
        "SELECT (id * 37) % 1000 AS id, id AS v FROM range(0, 1000)")
      "wodd_t"
    })

  /** `k NOT IN (<subquery>)` UPDATE — the DELETE twin: the with-NULL
    * source no-ops, the clean source stamps the uncovered ids, and the
    * NULL-key row never updates (the predicate is UNKNOWN there). */
  private def updNotInT(spark: SparkSession): Unit =
    built.computeIfAbsent("updnotin_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "updnotin_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("val", col("id") * 2)
          .unionByName(spark.sql(
            "SELECT CAST(NULL AS BIGINT) AS id, CAST(-5 AS BIGINT) AS val")))
        .commit()
      spark.range(0, 60).toDF("id")
        .unionByName(spark.sql("SELECT CAST(NULL AS BIGINT) AS id"))
        .createOrReplaceTempView("graft_sql_updnotin_withnull")
      spark.range(0, 60).toDF("id")
        .createOrReplaceTempView("graft_sql_updnotin_clean")
      spark.sql("UPDATE graft.cq.updnotin_t SET val = -1 WHERE id NOT IN " +
        "(SELECT id FROM graft_sql_updnotin_withnull)") // NULL → no-op
      spark.sql("UPDATE graft.cq.updnotin_t SET val = -1 WHERE id NOT IN " +
        "(SELECT id FROM graft_sql_updnotin_clean)")
      "updnotin_t"
    })

  /** MERGE with UNCORRELATED scalar subqueries in the assignments: each
    * materializes once at execute time as a literal (the UPDATE-SET
    * treatment). bsrc is range(0,8) → MAX(b)=7, COUNT(*)=8. */
  private def mergeSubqT(spark: SparkSession): Unit =
    built.computeIfAbsent("msub_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "msub_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("val", col("id") * 2)).commit()
      spark.range(50, 150).toDF("id")
        .createOrReplaceTempView("graft_sql_msub_src")
      spark.range(0, 8).toDF("b")
        .createOrReplaceTempView("graft_sql_msub_b")
      spark.sql(
        """MERGE INTO graft.cq.msub_t t USING graft_sql_msub_src s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET
          |  val = t.val + (SELECT MAX(b) FROM graft_sql_msub_b)
          |WHEN NOT MATCHED THEN INSERT (id, val)
          |  VALUES (s.id, (SELECT COUNT(*) FROM graft_sql_msub_b))
          |""".stripMargin)
      "msub_t"
    })

  /** CORRELATED scalar-aggregate comparisons in DELETE/UPDATE WHERE
    * (`v > (SELECT max(x) FROM aux WHERE aux.g = t.grp)`): decorrelated
    * per-key aggregates riding the residual-aware semi joins. grps 0..4
    * covered (MAX = 10g+40, AVG = 10g+20), 5..9 uncovered (NULL
    * comparison — rows untouched). */
  private def dmlCorrScalarT(spark: SparkSession): Unit =
    built.computeIfAbsent("dcorrs_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "dcorrs_t")
        .create(GraftSchema.of("id" -> LongType, "grp" -> LongType,
          "v" -> LongType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("grp", col("id") % 10).withColumn("v", col("id")))
        .commit()
      spark.range(0, 5).selectExpr("id AS g", "id * 10 AS x")
        .union(spark.range(0, 5).selectExpr("id AS g", "id * 10 + 40 AS x"))
        .createOrReplaceTempView("graft_sql_dcorrs_aux")
      spark.sql("DELETE FROM graft.cq.dcorrs_t WHERE v > " +
        "(SELECT MAX(x) FROM graft_sql_dcorrs_aux a WHERE a.g = dcorrs_t.grp)")
      spark.sql("UPDATE graft.cq.dcorrs_t SET v = v + 1000 WHERE v >= " +
        "(SELECT AVG(x) FROM graft_sql_dcorrs_aux a WHERE a.g = dcorrs_t.grp)")
      "dcorrs_t"
    })

  /** SHOW CREATE TABLE rides Spark's native DSv2 rendering — the key pins
    * the engine's schema / partitioning / properties surface as exposed
    * through GraftSparkTable. */
  private def showCreateT(spark: SparkSession): Unit =
    built.computeIfAbsent("showcr_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE IF NOT EXISTS graft.cq.showcr_t " +
        "(id BIGINT, part STRING, v DOUBLE) PARTITIONED BY (part) " +
        "TBLPROPERTIES ('write.parquet.compression-codec' = 'zstd')")
      "showcr_t"
    })

  /** DELETE/UPDATE with an UNCORRELATED scalar-subquery comparison in
    * WHERE — folded in as an execute-once literal. Exercises the
    * empty-subquery leg too (NULL comparison deletes nothing, per SQL). */
  private def dmlScalarT(spark: SparkSession): Unit =
    built.computeIfAbsent("dmlscal_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "dmlscal_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("val", col("id"))).commit()
      spark.range(0, 60).toDF("x")
        .createOrReplaceTempView("graft_sql_dmlscal_src")
      // MAX = 59: rows with val > 59 go
      spark.sql("DELETE FROM graft.cq.dmlscal_t WHERE val > " +
        "(SELECT MAX(x) FROM graft_sql_dmlscal_src)")
      // empty subquery → NULL comparison → deletes nothing
      spark.sql("DELETE FROM graft.cq.dmlscal_t WHERE val < " +
        "(SELECT MIN(x) FROM graft_sql_dmlscal_src WHERE x < 0)")
      // AVG = 29.5: ids 0..29 read val + COUNT (60)
      spark.sql("UPDATE graft.cq.dmlscal_t SET val = val + " +
        "(SELECT COUNT(*) FROM graft_sql_dmlscal_src) WHERE id < " +
        "(SELECT AVG(x) FROM graft_sql_dmlscal_src)")
      "dmlscal_t"
    })

  /** MERGE with CORRELATED scalar-aggregate subqueries in assignments —
    * decorrelated into the source as grouped aggregates. aux covers ids
    * divisible by 3 with two rows each (x = id and x = 1): matched rows
    * read SUM = id+1 where covered, NULL where not (SUM over zero rows);
    * inserted rows read COUNT = 2 where covered, 0 where not. */
  private def mergeCorrT(spark: SparkSession): Unit =
    built.computeIfAbsent("mcorr_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "mcorr_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("val", col("id") * 2)).commit()
      spark.range(50, 150).toDF("id")
        .createOrReplaceTempView("graft_sql_mcorr_src")
      spark.range(0, 150).filter(col("id") % 3 === 0)
        .select(col("id").as("k"), col("id").as("x"))
        .union(spark.range(0, 150).filter(col("id") % 3 === 0)
          .select(col("id").as("k"), lit(1L).as("x")))
        .createOrReplaceTempView("graft_sql_mcorr_aux")
      spark.sql(
        """MERGE INTO graft.cq.mcorr_t t USING graft_sql_mcorr_src s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET
          |  val = (SELECT SUM(x) FROM graft_sql_mcorr_aux a WHERE a.k = t.id)
          |WHEN NOT MATCHED THEN INSERT (id, val)
          |  VALUES (s.id, (SELECT COUNT(*) FROM graft_sql_mcorr_aux a
          |                 WHERE a.k = s.id))
          |""".stripMargin)
      "mcorr_t"
    })

  /** MERGE ON with a non-equi residual (the CDC event-time band): target
    * ids 0..299 ts=10·id; source ids 0..399 ts=10·id+(id%9), in the ±5
    * band iff id%9 ≤ 5 — in-band rows update, out-of-band rows insert a
    * sibling, uncovered ids insert. */
  private def mergeRangeT(spark: SparkSession): Unit =
    built.computeIfAbsent("mrange_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "mrange_t")
        .create(GraftSchema.of(
          "id" -> LongType, "ts" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 300).toDF("id")
          .withColumn("ts", col("id") * 10)
          .withColumn("val", col("id"))).commit()
      spark.range(0, 400).toDF("id")
        .withColumn("ts", col("id") * 10 + col("id") % 9)
        .withColumn("val", col("id") + 1000)
        .createOrReplaceTempView("graft_sql_mrange_src")
      spark.sql(
        """MERGE INTO graft.cq.mrange_t t USING graft_sql_mrange_src s
          |ON t.id = s.id AND s.ts BETWEEN t.ts - 5 AND t.ts + 5
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |""".stripMargin)
      "mrange_t"
    })

  /** Dynamic partition overwrite: partitions a and d replaced/created by
    * the batch under partitionOverwriteMode=dynamic; b untouched. */
  private def ovwDynT(spark: SparkSession): Unit =
    built.computeIfAbsent("ovwd_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.ovwd_t (id BIGINT, part STRING) " +
        "PARTITIONED BY (part)")
      spark.sql("INSERT INTO graft.cq.ovwd_t SELECT id, 'a' FROM range(0, 10)")
      spark.sql("INSERT INTO graft.cq.ovwd_t SELECT id, 'b' FROM range(10, 30)")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try spark.sql("INSERT OVERWRITE graft.cq.ovwd_t " +
        "SELECT id, CASE WHEN id < 203 THEN 'a' ELSE 'd' END AS part " +
        "FROM range(200, 206)")
      finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      "ovwd_t"
    })

  /** MERGE WITH SCHEMA EVOLUTION: target (id, val) ids 0..199 val 2·id;
    * the source adds a `note` column (n<id>) for ids 100..299. The merge
    * evolves the schema through the catalog's addColumn, then updates
    * matched rows and inserts the rest; pre-existing unmatched rows read
    * NULL for the new column. */
  private def mergeEvolveT(spark: SparkSession): Unit =
    built.computeIfAbsent("mevolve_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "mevolve_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 200).toDF("id")
          .withColumn("val", col("id") * 2))
        .commit()
      spark.range(100, 300).toDF("id")
        .withColumn("val", col("id") * 3)
        .withColumn("note", concat(lit("n"), col("id")))
        .createOrReplaceTempView("graft_sql_mevolve_src")
      spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO graft.cq.mevolve_t t
          |USING graft_sql_mevolve_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |""".stripMargin)
      "mevolve_t"
    })

  /** Full-snapshot reconciliation (MERGE `WHEN NOT MATCHED BY SOURCE`):
    * target ids 0..199 val 2·id; the source is the NEW snapshot 100..299
    * val 3·id. Matched rows take the source value, new rows insert, and
    * rows ABSENT from the source (0..99) are reconciled by the NMBS
    * clauses — id%5=0 deleted, else id%3=0 marked by val+1000. id%15=0
    * satisfies BOTH NMBS conditions, pinning SQL clause order (the DELETE
    * is listed first, so it wins). */
  private def nmbsT(spark: SparkSession): Unit =
    built.computeIfAbsent("nmbs_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "nmbs_t")
        .create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 200).toDF("id")
          .withColumn("val", col("id") * 2))
        .commit()
      spark.range(100, 300).toDF("id")
        .withColumn("val", col("id") * 3)
        .createOrReplaceTempView("graft_sql_nmbs_src")
      spark.sql(
        """MERGE INTO graft.cq.nmbs_t t USING graft_sql_nmbs_src s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |WHEN NOT MATCHED BY SOURCE AND t.id % 5 = 0 THEN DELETE
          |WHEN NOT MATCHED BY SOURCE AND t.id % 3 = 0
          |  THEN UPDATE SET val = t.val + 1000
          |""".stripMargin)
      "nmbs_t"
    })

  /** ids 0..99; ALTER adds `bonus` with DEFAULT 5 (old rows read it as an
    * initial default), renames `val`→`score`, then an INSERT carries REAL
    * bonus values for ids 100..119. */
  private def alterT(spark: SparkSession): Unit =
    built.computeIfAbsent("alter_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "alter_t")
        .create(idVal, Seq("part"))
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("part", lit("a")).withColumn("val", col("id") * 2))
        .commit()
      spark.sql("ALTER TABLE graft.cq.alter_t ADD COLUMN bonus BIGINT DEFAULT 5")
      spark.sql("ALTER TABLE graft.cq.alter_t RENAME COLUMN val TO score")
      spark.sql("INSERT INTO graft.cq.alter_t " +
        "SELECT id, 'b' AS part, id * 3 AS score, id AS bonus FROM range(100, 120)")
      "alter_t"
    })

  /** ids 0..399; INSERT OVERWRITE replaces everything with 500..549 ('z',
    * val 7·id) in one metadata-truncate + append snapshot. */
  private def overwriteT(spark: SparkSession): Unit =
    built.computeIfAbsent("ovw_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "ovw_t")
        .create(idVal, Seq("part"))
        .appendData(baseRows(spark, 400)).commit()
      spark.sql("INSERT OVERWRITE graft.cq.ovw_t " +
        "SELECT id, 'z' AS part, id * 7 AS val FROM range(500, 550)")
      "ovw_t"
    })

  /** CTAS from scan_t's live rows below 100 — the catalog's non-atomic
    * CREATE TABLE AS SELECT (createTable + one bulk write). */
  private def ctasT(spark: SparkSession): Unit =
    built.computeIfAbsent("ctas_t", _ => {
      scanT(spark)
      spark.sql("CREATE TABLE graft.cq.ctas_t AS " +
        "SELECT id, part, val FROM graft.cq.scan_t WHERE id < 100")
      "ctas_t"
    })

  /** ids 0..199, SQL DELETE id%10=3, then `CALL graft.system.compact` —
    * the post-compact state must still hash the pre-compact live rows. */
  private def callCompactT(spark: SparkSession): Unit =
    built.computeIfAbsent("callc_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "callc_t")
        .create(idVal, Seq("part"))
        .appendData(baseRows(spark, 200)).commit()
      spark.sql("DELETE FROM graft.cq.callc_t WHERE id % 10 = 3")
      spark.sql("CALL graft.system.compact(table => 'cq.callc_t')")
      "callc_t"
    })

  /** two appends + compact, then `CALL expire_snapshots(keep_last => 1)` —
    * the rebased baseline must read identically. */
  private def callExpireT(spark: SparkSession): Unit =
    built.computeIfAbsent("callx_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "callx_t")
        .create(idVal, Seq("part"))
        .appendData(baseRows(spark, 200).where(col("id") < 100)).commit()
        .appendData(baseRows(spark, 200).where(col("id") >= 100)).commit()
      spark.sql("CALL graft.system.compact(table => 'cq.callx_t')")
      spark.sql("CALL graft.system.expire_snapshots(" +
        "table => 'cq.callx_t', keep_last => 1)")
      "callx_t"
    })

  /** snapshot 1 = ids 0..99, snapshot 2 = 100..199, then
    * `CALL rollback_to_snapshot(1)` — reads rewind to the first append. */
  private def callRollbackT(spark: SparkSession): Unit =
    built.computeIfAbsent("callr_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "callr_t")
        .create(idVal, Seq("part"))
        .appendData(baseRows(spark, 200).where(col("id") < 100)).commit()
        .appendData(baseRows(spark, 200).where(col("id") >= 100)).commit()
      spark.sql("CALL graft.system.rollback_to_snapshot(" +
        "table => 'cq.callr_t', snapshot_id => 1)")
      "callr_t"
    })

  /** Hidden bucket(4, id) partitioning through SQL DDL + DML: CREATE
    * PARTITIONED BY (bucket(4, id)), bulk INSERT, point DELETE — the
    * bucket-pruned read path (CatalogSpec gates the planned-file count). */
  private def bucketT(spark: SparkSession): Unit =
    built.computeIfAbsent("bucket_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.bucket_t (id BIGINT, val BIGINT) " +
        "PARTITIONED BY (bucket(4, id))")
      spark.sql("INSERT INTO graft.cq.bucket_t " +
        "SELECT id, id * 2 AS val FROM range(0, 400)")
      spark.sql("DELETE FROM graft.cq.bucket_t WHERE id = 77")
      "bucket_t"
    })

  /** Partition-spec evolution through SQL: identity(part) epoch →
    * `CALL graft.system.update_spec` evolves to bucket(4,id) — epoch-1
    * files keep their layout, epoch-2 INSERTs bucket. The read is the
    * union across epochs (the hidden-partitioning evolution contract). */
  private def specEvolT(spark: SparkSession): Unit =
    built.computeIfAbsent("spec_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.spec_t (id BIGINT, part STRING, " +
        "val BIGINT) PARTITIONED BY (part)")
      spark.sql("INSERT INTO graft.cq.spec_t " +
        "SELECT id, CASE WHEN id < 100 THEN 'a' ELSE 'b' END, id * 2 " +
        "FROM range(0, 200)")
      spark.sql("CALL graft.system.update_spec(table => 'cq.spec_t', " +
        "add => 'bucket(4,id)', drop => 'part')")
      spark.sql("INSERT INTO graft.cq.spec_t " +
        "SELECT id, 'c', id * 3 FROM range(200, 300)")
      "spec_t"
    })

  /** The spec_t twin driven by the Iceberg SQL-extension DDL the injected
    * parser recognizes (`ALTER TABLE … ADD/DROP PARTITION FIELD`) instead
    * of CALL update_spec — same epochs, same end state. */
  private def specDdlT(spark: SparkSession): Unit =
    built.computeIfAbsent("spec_ddl_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.spec_ddl_t (id BIGINT, part STRING, " +
        "val BIGINT) PARTITIONED BY (part)")
      spark.sql("INSERT INTO graft.cq.spec_ddl_t " +
        "SELECT id, CASE WHEN id < 100 THEN 'a' ELSE 'b' END, id * 2 " +
        "FROM range(0, 200)")
      spark.sql("ALTER TABLE graft.cq.spec_ddl_t ADD PARTITION FIELD bucket(4, id)")
      spark.sql("ALTER TABLE graft.cq.spec_ddl_t DROP PARTITION FIELD part")
      spark.sql("INSERT INTO graft.cq.spec_ddl_t " +
        "SELECT id, 'c', id * 3 FROM range(200, 300)")
      "spec_ddl_t"
    })

  /** Branch lifecycle through CALL procedures: create_branch, API writes
    * routed to the branch (invisible to main), fast_forward publishes. */
  private def branchLifeT(spark: SparkSession): Unit =
    built.computeIfAbsent("branch_t", _ => {
      CatalogFixture.ensure(spark)
      val g = new GraftTableGenerator(spark,
        s"${CatalogFixture.warehouse}/cq", "branch_t")
        .create(idVal, Nil)
        .appendData(baseRows(spark, 100)).commit()
      spark.sql("CALL graft.system.create_branch(" +
        "table => 'cq.branch_t', branch => 'ingest')")
      g.refresh().writeTo("ingest")
        .appendData(spark.range(100, 160).toDF("id")
          .withColumn("part", lit("x")).withColumn("val", col("id") * 2))
        .commit()
      // branch rows must be invisible to main until fast-forward
      require(spark.sql("SELECT COUNT(*) AS n FROM graft.cq.branch_t")
        .collect()(0).getLong(0) == 100L, "branch leaked into main")
      spark.sql("CALL graft.system.fast_forward(" +
        "table => 'cq.branch_t', branch => 'ingest')")
      "branch_t"
    })

  /** WAP publish: audit branch write + `CALL cherrypick_snapshot` onto
    * main; the audit branch is then dropped. */
  private def wapPublishT(spark: SparkSession): Unit =
    built.computeIfAbsent("wap_t", _ => {
      CatalogFixture.ensure(spark)
      val g = new GraftTableGenerator(spark,
        s"${CatalogFixture.warehouse}/cq", "wap_t")
        .create(idVal, Nil)
        .appendData(baseRows(spark, 100)).commit()
      spark.sql("CALL graft.system.create_branch(" +
        "table => 'cq.wap_t', branch => 'audit')")
      g.refresh().writeTo("audit")
        .appendData(spark.range(500, 540).toDF("id")
          .withColumn("part", lit("w")).withColumn("val", col("id") * 5))
        .commit()
      val auditHead = graft.meta.SnapshotLog(
        s"${CatalogFixture.warehouse}/cq/wap_t").load()
        .snapshots.filter(_.branch == "audit").last.id
      spark.sql("CALL graft.system.cherrypick_snapshot(" +
        s"table => 'cq.wap_t', snapshot_id => $auditHead)")
      spark.sql("CALL graft.system.drop_branch(" +
        "table => 'cq.wap_t', branch => 'audit')")
      "wap_t"
    })

  /** snapshot 1 = ids 0..99 (a), snapshot 2 = ids 100..199 (b). */
  private def travelT(spark: SparkSession): Unit =
    built.computeIfAbsent("travel_t", _ => {
      CatalogFixture.ensure(spark)
      val g = new GraftTableGenerator(spark,
        s"${CatalogFixture.warehouse}/cq", "travel_t")
      g.create(idVal, Seq("part"))
        .appendData(spark.range(0, 100).toDF("id")
          .withColumn("part", lit("a")).withColumn("val", col("id") * 2))
        .commit()
        .appendData(spark.range(100, 200).toDF("id")
          .withColumn("part", lit("b")).withColumn("val", col("id") * 2))
        .commit()
      "travel_t"
    })

  /** Declared-write-order fixture: CALL write_ordered BEFORE any data,
    * then INSERT a permuted id sequence ((id·173) mod 400 — gcd(173,400)=1)
    * — the sink lays the rows out sorted on id, so per-file envelopes are
    * disjoint from the first write. */
  private def writeOrdT(spark: SparkSession): Unit =
    built.computeIfAbsent("word_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.word_t (id BIGINT, val BIGINT)")
      spark.sql("CALL graft.system.write_ordered(" +
        "table => 'cq.word_t', columns => 'id')")
      spark.sql("INSERT INTO graft.cq.word_t " +
        "SELECT (id * 173) % 400 AS id, ((id * 173) % 400) * 3 AS val " +
        "FROM range(0, 400) AS t(id)")
      "word_t"
    })

  /** rewrite_sorted fixture: four permuted INSERTs (overlapping per-file
    * envelopes), then CALL rewrite_sorted re-clusters on id — content
    * intact, band scans pruned (plan-gated in CatalogSpec). */
  private def rewriteSortT(spark: SparkSession): Unit =
    built.computeIfAbsent("rsort_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.rsort_t (id BIGINT, val BIGINT)")
      (0 until 4).foreach { k =>
        spark.sql("INSERT INTO graft.cq.rsort_t " +
          s"SELECT (id * 173 + $k) % 400 AS id, ((id * 173 + $k) % 400) * 3 " +
          s"AS val FROM range(0, 100) AS t(id)")
      }
      spark.sql("CALL graft.system.rewrite_sorted(" +
        "table => 'cq.rsort_t', columns => 'id', rows_per_file => 100)")
      "rsort_t"
    })

  /** WAP-by-conf fixture: with `spark.graft.wap.branch.<table>` set, the
    * INSERT and DELETE land on the audit branch (main untouched); the
    * CALL fast_forward publishes them. */
  private def wapConfT(spark: SparkSession): Unit =
    built.computeIfAbsent("wapc_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.wapc_t (id BIGINT, val BIGINT)")
      spark.sql("INSERT INTO graft.cq.wapc_t " +
        "SELECT id, id * 2 AS val FROM range(0, 100)")
      val key = "spark.graft.wap.branch.cq.wapc_t"
      spark.conf.set(key, "audit")
      try {
        spark.sql("INSERT INTO graft.cq.wapc_t " +
          "SELECT id, id * 2 AS val FROM range(100, 150)")
        spark.sql("DELETE FROM graft.cq.wapc_t WHERE id % 10 = 4")
      } finally spark.conf.unset(key)
      spark.sql("CALL graft.system.fast_forward(" +
        "table => 'cq.wapc_t', branch => 'audit')")
      "wapc_t"
    })

  /** ALTER VIEW SET/UNSET TBLPROPERTIES + ALTER NAMESPACE properties:
    * both persisted in warehouse metadata documents and read back. */
  private def viewPropsT(spark: SparkSession): Unit =
    built.computeIfAbsent("vprops_v", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.vprops_t (id BIGINT)")
      spark.sql("INSERT INTO graft.cq.vprops_t SELECT id FROM range(0, 10)")
      spark.sql("CREATE VIEW graft.cq.vprops_v AS " +
        "SELECT id FROM graft.cq.vprops_t WHERE id < 3")
      spark.sql("ALTER VIEW graft.cq.vprops_v SET TBLPROPERTIES " +
        "('team' = 'graft', 'scratch' = 'y')")
      spark.sql("ALTER VIEW graft.cq.vprops_v SET TBLPROPERTIES ('team' = 'g2')")
      spark.sql("ALTER VIEW graft.cq.vprops_v UNSET TBLPROPERTIES ('scratch')")
      spark.sql("ALTER NAMESPACE graft.cq SET PROPERTIES ('tier' = 'gold')")
      "vprops_v"
    })

  /** Branch/tag SQL DDL end-to-end: ALTER TABLE CREATE BRANCH, write to
    * it through the WAP conf, publish via fast_forward, DROP BRANCH. */
  private def branchDdlT(spark: SparkSession): Unit =
    built.computeIfAbsent("brddl_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.brddl_t (id BIGINT, val BIGINT)")
      spark.sql("INSERT INTO graft.cq.brddl_t " +
        "SELECT id, id * 2 AS val FROM range(0, 100)")
      spark.sql("ALTER TABLE graft.cq.brddl_t CREATE BRANCH wapb")
      spark.sql("ALTER TABLE graft.cq.brddl_t CREATE TAG base_tag")
      val key = "spark.graft.wap.branch.cq.brddl_t"
      spark.conf.set(key, "wapb")
      try {
        spark.sql("INSERT INTO graft.cq.brddl_t " +
          "SELECT id, id * 3 AS val FROM range(100, 140)")
        spark.sql("DELETE FROM graft.cq.brddl_t WHERE id % 10 = 7")
      } finally spark.conf.unset(key)
      spark.sql("CALL graft.system.fast_forward(" +
        "table => 'cq.brddl_t', branch => 'wapb')")
      spark.sql("ALTER TABLE graft.cq.brddl_t DROP BRANCH IF EXISTS wapb")
      spark.sql("ALTER TABLE graft.cq.brddl_t DROP BRANCH IF EXISTS ghost")
      "brddl_t"
    })

  /** Delete-maintenance fixtures: accumulate tombstones / eq deletes, then
    * CALL the rewrite procedures; content must be unchanged. */
  private def rewritePosT(spark: SparkSession): Unit =
    built.computeIfAbsent("rwpos_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "rwpos_t")
        .create(idVal, Nil)
        .appendData(baseRows(spark, 300)).commit()
      spark.sql("DELETE FROM graft.cq.rwpos_t WHERE id % 7 = 0")
      spark.sql("DELETE FROM graft.cq.rwpos_t WHERE id % 11 = 3")
      spark.sql("DELETE FROM graft.cq.rwpos_t WHERE id % 13 = 5")
      spark.sql("CALL graft.system.rewrite_position_deletes(" +
        "table => 'cq.rwpos_t')")
      "rwpos_t"
    })

  private def convertEqT(spark: SparkSession): Unit =
    built.computeIfAbsent("cveq_t", _ => {
      CatalogFixture.ensure(spark)
      val g = new GraftTableGenerator(spark,
        s"${CatalogFixture.warehouse}/cq", "cveq_t")
      g.create(GraftSchema.of("id" -> LongType, "val" -> LongType), Nil)
        .appendData(spark.range(0, 300).toDF("id")
          .withColumn("val", col("id") * 2)).commit()
      // two upsert waves leave two equality-delete files behind
      g.upsert(spark.range(50, 100).toDF("id")
        .withColumn("val", col("id") * 5), Seq("id")).commit()
      g.upsert(spark.range(80, 120).toDF("id")
        .withColumn("val", col("id") * 9), Seq("id")).commit()
      spark.sql("CALL graft.system.convert_equality_deletes(" +
        "table => 'cq.cveq_t')")
      "cveq_t"
    })

  /** Bloom-property fixture: `write.bloom.columns` via TBLPROPERTIES, four
    * residue-interleaved INSERTs (file id-envelopes fully overlap, so only
    * the manifest Bloom filters can prune a point probe). */
  private def bloomPropT(spark: SparkSession): Unit =
    built.computeIfAbsent("bloomp_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.bloomp_t (id BIGINT, val BIGINT) " +
        "TBLPROPERTIES ('write.bloom.columns'='id')")
      (0 until 4).foreach { k =>
        spark.sql("INSERT INTO graft.cq.bloomp_t " +
          s"SELECT id * 4 + $k AS id, (id * 4 + $k) * 7 AS val " +
          "FROM range(0, 100) AS t(id)")
      }
      "bloomp_t"
    })

  /** Table-property evolution fixture: CREATE with TBLPROPERTIES, then
    * SET (merge + overwrite) and UNSET via SQL — final persisted map is
    * {quality.tier=gold, write.note=v2}. */
  private def propsT(spark: SparkSession): Unit =
    built.computeIfAbsent("props_t", _ => {
      CatalogFixture.ensure(spark)
      spark.sql("CREATE TABLE graft.cq.props_t (id BIGINT, val BIGINT) " +
        "TBLPROPERTIES ('write.note'='v1','parquet.block.size'='1048576')")
      spark.sql("INSERT INTO graft.cq.props_t " +
        "SELECT id, id * 2 AS val FROM range(0, 10)")
      spark.sql("ALTER TABLE graft.cq.props_t SET TBLPROPERTIES " +
        "('write.note'='v2','quality.tier'='gold')")
      spark.sql("ALTER TABLE graft.cq.props_t " +
        "UNSET TBLPROPERTIES ('parquet.block.size')")
      "props_t"
    })

  /** 3-partition table with a nullable column for the grouped metadata
    * aggregates: part a = ids 0..99, b = 100..159, c = 160..179; val NULL
    * on every 10th id, else 3·id. */
  private def groupT(spark: SparkSession): Unit =
    built.computeIfAbsent("group_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "group_t")
        .create(idVal, Seq("part"))
        .appendData(spark.range(0, 180).toDF("id")
          .withColumn("part", when(col("id") < 100, lit("a"))
            .when(col("id") < 160, lit("b")).otherwise(lit("c")))
          .withColumn("val", when(col("id") % 10 === 0, lit(null).cast("long"))
            .otherwise(col("id") * 3)))
        .commit()
      "group_t"
    })

  /** add_files adoption: native ids 0..199 (part a/b), then an EXTERNAL
    * hive-layout parquet dir of ids 200..399 (part c: <300, d: >=300 —
    * files physically carry the part column) adopted in place via
    * `CALL graft.system.add_files`. A post-adoption SQL DELETE proves
    * adopted files participate in MoR like native ones. */
  private def addFilesT(spark: SparkSession): Unit =
    built.computeIfAbsent("add_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "add_t")
        .create(idVal, Seq("part"))
        .appendData(baseRows(spark, 200)).commit()
      val ext = s"${CatalogFixture.warehouse}/ext_add_files"
      val src = spark.range(200, 400).toDF("id")
        .withColumn("part", when(col("id") < 300, lit("c")).otherwise(lit("d")))
        .withColumn("val", col("id") * 2)
      // plain parquet writes INTO part=<v> dirs: hive layout, but every
      // file still physically carries the part column (the addFiles
      // contract — partitionBy would strip it)
      src.where(col("part") === "c").coalesce(1).write
        .mode("overwrite").parquet(s"$ext/part=c")
      src.where(col("part") === "d").coalesce(1).write
        .mode("overwrite").parquet(s"$ext/part=d")
      spark.sql(s"CALL graft.system.add_files('cq.add_t', '$ext')")
      spark.sql("DELETE FROM graft.cq.add_t WHERE id % 10 = 3")
      "add_t"
    })

  /** snapshot-table adoption: an external unpartitioned parquet dir
    * becomes a graft table (schema inferred, files adopted in place),
    * then SQL DELETE runs against it — a migrated table is a full MoR
    * citizen from the first commit. */
  private def snapT(spark: SparkSession): Unit =
    built.computeIfAbsent("snap_t", _ => {
      CatalogFixture.ensure(spark)
      val ext = s"${CatalogFixture.warehouse}/ext_snapshot_src"
      spark.range(0, 500).toDF("id")
        .withColumn("val", col("id") * 3)
        .repartition(2).write.mode("overwrite").parquet(ext)
      spark.sql(s"CALL graft.system.snapshot('$ext', 'cq.snap_t')")
      spark.sql("DELETE FROM graft.cq.snap_t WHERE id % 5 = 0")
      "snap_t"
    })

  /** Known entry ledger for the manifest-introspection metadata tables:
    * snap 1 appends one file per partition (a/b, 100 rows each), snap 2
    * positional-deletes id%10=3 (one pos file per partition, 10 positions
    * each), snap 3 compacts (2 fresh data files; removes 2 data + 2
    * delete files). */
  private def metaLedgerT(spark: SparkSession): Unit =
    built.computeIfAbsent("metal_t", _ => {
      CatalogFixture.ensure(spark)
      new GraftTableGenerator(spark, s"${CatalogFixture.warehouse}/cq", "metal_t")
        .create(idVal, Seq("part"))
        .appendData(baseRows(spark, 200)).commit()
        .positionalDelete(col("id") % 10 === 3).commit()
        .compact().commit()
      "metal_t"
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the per-snapshot manifest-entry ledger (Iceberg entries table):
    // added/deleted on both sides — the audit surface proving the
    // compaction rewrite removed exactly what it re-expressed
    "sql_meta_entries" -> ((s, _) => {
      metaLedgerT(s)
      s.sql("SELECT snapshot_id, status, content, COUNT(*) AS n, " +
        "SUM(record_count) AS rows_declared " +
        "FROM graft.cq.metal_t.entries " +
        "GROUP BY snapshot_id, status, content " +
        "ORDER BY snapshot_id, status, content")
    }),

    // the manifest-list view (Iceberg manifests table): inline units with
    // per-unit counts/row sums — sharded group units are spec-gated in
    // ShardedManifestSpec (their stats come from the persisted legend)
    "sql_meta_manifests" -> ((s, _) => {
      metaLedgerT(s)
      s.sql("SELECT snapshot_id, content, manifest, file_count, added_rows " +
        "FROM graft.cq.metal_t.manifests ORDER BY snapshot_id, content")
    }),

    // the position_deletes CONTENT view, pinned by VERSION AS OF to the
    // pre-compaction snapshot (live tombstones at head fold away in snap
    // 3): 10 positions per partition file, pos = row index in its file
    "sql_meta_pos_deletes" -> ((s, _) => {
      metaLedgerT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(pos) AS pos_sum, " +
        "COUNT(DISTINCT file_path) AS n_files " +
        "FROM graft.cq.metal_t.position_deletes VERSION AS OF 2")
    }),

    // adopted-in-place external files (Iceberg add_files parity): grouped
    // content over native + adopted partitions, after a MoR delete that
    // spans both — manifest stats/pruning on adopted entries are
    // plan-gated in CatalogSpec
    "sql_call_add_files" -> ((s, _) => {
      addFilesT(s)
      s.sql("SELECT part, COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.add_t GROUP BY part ORDER BY part")
    }),

    // table migrated from plain parquet via CALL snapshot, then mutated
    "sql_call_snapshot" -> ((s, _) => {
      snapT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.snap_t")
    }),

    // GROUP BY the identity partition column answered per-partition from
    // the manifest (file-entry fold at analysis time — zero scan jobs on
    // a clean table; CatalogSpec pins the plan): COUNT(*) trusts declared
    // counts, COUNT(val) subtracts tracked null counts, MIN/MAX fold the
    // per-file envelopes.
    "sql_catalog_fast_groupby" -> ((s, _) => {
      groupT(s)
      s.sql("SELECT part, COUNT(*) AS n, COUNT(val) AS n_val, " +
        "MIN(id) AS mn, MAX(id) AS mx " +
        "FROM graft.cq.group_t GROUP BY part ORDER BY part")
    }),

    // SELECT DISTINCT over the partition column: the live partition
    // tuples straight off the manifest (a Distinct node at analysis time
    // — the rule answers it before the optimizer ever rewrites it).
    "sql_catalog_distinct_part" -> ((s, _) => {
      groupT(s)
      s.sql("SELECT DISTINCT part FROM graft.cq.group_t ORDER BY part")
    }),

    // partition-exact WHERE + the aggregate family: the IN filter drops
    // whole files residue-free (identity partitioning), the rest folds
    // from the surviving entries — the everyday partition-probe COUNT.
    "sql_catalog_fast_count_where" -> ((s, _) => {
      groupT(s)
      s.sql("SELECT COUNT(*) AS n, COUNT(val) AS n_val, " +
        "MIN(id) AS mn, MAX(id) AS mx " +
        "FROM graft.cq.group_t WHERE part IN ('a', 'c')")
    }),
    // SELECT by name: the MoR merge (positional deletes applied) behind
    // plain SQL — the catalog's read path
    "sql_catalog_scan" -> ((s, _) => {
      scanT(s)
      s.sql("SELECT part, COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.scan_t GROUP BY part ORDER BY part")
    }),

    // SQL WHERE → manifest file pruning (partition value + id range reach
    // the planner; CatalogSpec gates the planned-file count)
    "sql_catalog_prune" -> ((s, _) => {
      scanT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum FROM graft.cq.scan_t " +
        "WHERE part = 'a' AND id >= 50 AND id <= 149")
    }),

    "sql_catalog_insert" -> ((s, _) => {
      insT(s)
      s.sql("SELECT part, COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.ins_t GROUP BY part ORDER BY part")
    }),

    "sql_catalog_delete" -> ((s, _) => {
      delT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, MIN(id) AS min_id, " +
        "MAX(id) AS max_id FROM graft.cq.del_t")
    }),

    "sql_catalog_update" -> ((s, _) => {
      updT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(val) AS val_sum FROM graft.cq.upd_t")
    }),

    "sql_merge_into" -> ((s, _) => {
      mergeT(s)
      s.sql("SELECT id, val FROM graft.cq.merge_t")
    }),

    "sql_merge_nmbs" -> ((s, _) => {
      nmbsT(s)
      s.sql("SELECT id, val FROM graft.cq.nmbs_t")
    }),

    "sql_merge_expr" -> ((s, _) => {
      mergeExprT(s)
      s.sql("SELECT id, val FROM graft.cq.mexpr_t")
    }),

    "sql_merge_evolve" -> ((s, _) => {
      mergeEvolveT(s)
      s.sql("SELECT id, val, note FROM graft.cq.mevolve_t")
    }),

    "sql_catalog_overwrite_part" -> ((s, _) => {
      ovwPartT(s)
      s.sql("SELECT part, COUNT(*) AS n, SUM(id) AS id_sum " +
        "FROM graft.cq.ovwp_t GROUP BY part ORDER BY part")
    }),

    "sql_catalog_update_corr" -> ((s, _) => {
      updCorrT(s)
      s.sql("SELECT id, val FROM graft.cq.ucorr_t")
    }),

    "sql_catalog_delete_exists_residual" -> ((s, _) => {
      existsResidT(s)
      s.sql("SELECT id, ts, val FROM graft.cq.exres_t")
    }),

    "sql_catalog_update_corr_count" -> ((s, _) => {
      updCorrCountT(s)
      s.sql("SELECT id, val FROM graft.cq.ucorrcnt_t")
    }),

    "sql_catalog_update_exists_residual" -> ((s, _) => {
      updExistsResidT(s)
      s.sql("SELECT id, ts, val FROM graft.cq.updexres_t")
    }),

    "sql_merge_multi_action" -> ((s, _) => {
      mergeMultiT(s)
      s.sql("SELECT id, val, note FROM graft.cq.mmulti_t")
    }),

    "sql_catalog_update_subq" -> ((s, _) => {
      updSubqT(s)
      s.sql("SELECT id, val FROM graft.cq.usub_t")
    }),

    "sql_merge_range" -> ((s, _) => {
      mergeRangeT(s)
      s.sql("SELECT id, ts, val FROM graft.cq.mrange_t")
    }),

    "sql_merge_subq_assign" -> ((s, _) => {
      mergeSubqT(s)
      s.sql("SELECT id, val FROM graft.cq.msub_t")
    }),

    // correlated scalar-aggregate subqueries in MERGE assignments,
    // decorrelated into the source (UPDATE correlates on the target ON
    // key, INSERT on a source column; mixed coverage both ways)
    "sql_merge_corr_assign" -> ((s, _) => {
      mergeCorrT(s)
      s.sql("SELECT id, val FROM graft.cq.mcorr_t")
    }),

    // uncorrelated scalar-subquery comparisons in DELETE/UPDATE WHERE
    // (execute-once literals; empty subquery → NULL → no rows)
    "sql_catalog_dml_scalar_where" -> ((s, _) => {
      dmlScalarT(s)
      s.sql("SELECT id, val FROM graft.cq.dmlscal_t")
    }),

    // SHOW CREATE TABLE (native DSv2 rendering over the engine's
    // schema/partitioning/properties surface)
    "sql_show_create" -> ((s, _) => {
      showCreateT(s)
      s.sql("SHOW CREATE TABLE graft.cq.showcr_t")
    }),

    // correlated scalar-aggregate comparisons in DELETE/UPDATE WHERE
    // (the decorrelated per-key aggregate semi-join routes)
    "sql_catalog_dml_corr_scalar" -> ((s, _) => {
      dmlCorrScalarT(s)
      s.sql("SELECT id, grp, v FROM graft.cq.dcorrs_t")
    }),

    "sql_catalog_delete_in_composite" -> ((s, _) => {
      delInCompT(s)
      s.sql("SELECT id, grp, val FROM graft.cq.delincomp_t")
    }),

    // SHOW PARTITIONS answered off the snapshot log's live manifest (the
    // .partitions metadata tier — no data file opened)
    "sql_show_partitions" -> ((s, _) => {
      scanT(s)
      s.sql("SHOW PARTITIONS graft.cq.scan_t")
    }),

    "sql_catalog_update_in_composite" -> ((s, _) => {
      updInCompT(s)
      s.sql("SELECT id, grp, val FROM graft.cq.updincomp_t")
    }),

    "sql_catalog_delete_not_in" -> ((s, _) => {
      delNotInT(s)
      s.sql("SELECT id, val FROM graft.cq.delnotin_t")
    }),

    "sql_catalog_update_corr_multi" -> ((s, _) => {
      updCorrMultiT(s)
      s.sql("SELECT id, a, b FROM graft.cq.ucorrm_t")
    }),

    "sql_catalog_update_not_in" -> ((s, _) => {
      updNotInT(s)
      s.sql("SELECT id, val FROM graft.cq.updnotin_t")
    }),

    "sql_write_order_ddl" -> ((s, _) => {
      writeOrdDdlT(s)
      s.sql("SELECT id, v FROM graft.cq.wodd_t")
    }),

    "sql_catalog_overwrite_dyn" -> ((s, _) => {
      ovwDynT(s)
      s.sql("SELECT part, COUNT(*) AS n, SUM(id) AS id_sum " +
        "FROM graft.cq.ovwd_t GROUP BY part ORDER BY part")
    }),

    "sql_catalog_delete_exists" -> ((s, _) => {
      existsT(s)
      s.sql("SELECT id, val FROM graft.cq.exists_t")
    }),

    "sql_catalog_update_exists" -> ((s, _) => {
      updExistsT(s)
      s.sql("SELECT id, val FROM graft.cq.updex_t")
    }),

    "sql_catalog_replace" -> ((s, _) => {
      replaceT(s)
      s.sql("SELECT id, sept FROM graft.cq.replace_t")
    }),

    "sql_catalog_view" -> ((s, _) => {
      viewT(s)
      s.sql("SELECT a.g, a.n, a.s, b.n AS base_n " +
        "FROM graft.cq.view_agg a CROSS JOIN graft.cq.view_v1 b ORDER BY a.g")
    }),

    // manifest-answered COUNT(*) (Iceberg count pushdown): the plan is a
    // LocalTableScan — CatalogSpec gates the absence of any file scan
    "sql_catalog_fast_count" -> ((s, _) => {
      travelT(s)
      s.sql("SELECT COUNT(*) AS n FROM graft.cq.travel_t")
    }),

    // manifest-answered MIN/MAX (Iceberg aggregate pushdown): per-file
    // metric envelopes fold on the driver — zero scans (plan-gated in
    // CatalogSpec; the delete-fallback exactness is gated there too)
    "sql_catalog_fast_minmax" -> ((s, _) => {
      travelT(s)
      s.sql("SELECT MIN(id) AS mn, MAX(id) AS mx, MIN(val) AS mnv, " +
        "MAX(val) AS mxv, COUNT(*) AS n FROM graft.cq.travel_t")
    }),

    "sql_catalog_overwrite" -> ((s, _) => {
      overwriteT(s)
      s.sql("SELECT part, COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.ovw_t GROUP BY part ORDER BY part")
    }),

    "sql_catalog_alter" -> ((s, _) => {
      alterT(s)
      s.sql("SELECT part, COUNT(*) AS n, SUM(score) AS score_sum, " +
        "SUM(bonus) AS bonus_sum FROM graft.cq.alter_t " +
        "GROUP BY part ORDER BY part")
    }),

    "sql_catalog_travel" -> ((s, _) => {
      travelT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum " +
        "FROM graft.cq.travel_t VERSION AS OF 1")
    }),

    // metadata aggregates under time travel: the analysis-time fast path
    // folds the manifest AT the pinned snapshot (plan-gated to a
    // LocalTableScan in CatalogSpec — snapshot 1 sees only partition 'a')
    "sql_catalog_travel_agg" -> ((s, _) => {
      travelT(s)
      s.sql("SELECT COUNT(*) AS n, MIN(id) AS mn, MAX(id) AS mx, " +
        "MAX(val) AS mxv FROM graft.cq.travel_t VERSION AS OF 1")
    }),

    // declared write order from SQL (CALL write_ordered): the permuted
    // INSERT lands sorted — full content intact, and a range slice reads
    // the same answer off the sorted layout (file pruning is plan-gated
    // in CatalogSpec)
    "sql_call_write_ordered" -> ((s, _) => {
      writeOrdT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum, " +
        "SUM(CASE WHEN id BETWEEN 100 AND 149 THEN val END) AS band_sum " +
        "FROM graft.cq.word_t")
    }),

    // write-audit-publish BY SESSION CONF (spark.graft.wap.branch —
    // Iceberg's spark.wap.branch shape): staged INSERT + DELETE commit to
    // the audit branch with the pipeline's SQL unchanged, main stays
    // untouched until CALL fast_forward publishes (isolation is
    // spec-gated in CatalogSpec)
    // view + namespace properties persisted and read back: the values
    // fold into literal columns so the oracle hash-gates them
    "sql_view_props" -> ((s, _) => {
      viewPropsT(s)
      val cat = s.sessionState.catalogManager.catalog("graft")
        .asInstanceOf[graft.catalog.GraftCatalog]
      val v = cat.loadView(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("cq"), "vprops_v"))
      val team = v.properties().get("team")
      val scratch = String.valueOf(v.properties().containsKey("scratch"))
      val tier = cat.loadNamespaceMetadata(Array("cq")).get("tier")
      s.sql("SELECT COUNT(*) AS n FROM graft.cq.vprops_v")
        .withColumn("team", lit(team))
        .withColumn("scratch_present", lit(scratch))
        .withColumn("ns_tier", lit(tier))
    }),

    // Iceberg ref DDL: CREATE/DROP BRANCH|TAG through ALTER TABLE text
    "sql_branch_ddl" -> ((s, _) => {
      branchDdlT(s)
      s.sql("SELECT id, val FROM graft.cq.brddl_t")
    }),

    "sql_wap_branch_conf" -> ((s, _) => {
      wapConfT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.wapc_t")
    }),

    // CALL rewrite_position_deletes: three tombstone waves fold into one
    // vector per touched file; live rows unchanged (delete-file
    // convergence is spec-gated in CatalogSpec)
    "sql_call_rewrite_pos_deletes" -> ((s, _) => {
      rewritePosT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.rwpos_t")
    }),

    // CALL convert_equality_deletes: upsert-era eq deletes become position
    // vectors; the overlapping-upsert end state is exactly preserved
    "sql_call_convert_eq_deletes" -> ((s, _) => {
      convertEqT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(val) AS val_sum FROM graft.cq.cveq_t")
    }),

    // manifest Bloom filters declared as a TABLE PROPERTY: catalog
    // INSERTs carry them with no API call, SQL point probes prune files
    // whose envelopes all overlap (plan-gated in CatalogSpec)
    "sql_catalog_bloom" -> ((s, _) => {
      bloomPropT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.bloomp_t WHERE id IN (42, 137, 298)")
    }),

    // CALL rewrite_sorted: content intact through the sort rewrite; the
    // re-clustered envelopes' pruning is plan-gated in CatalogSpec
    "sql_call_rewrite_sorted" -> ((s, _) => {
      rewriteSortT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum, " +
        "SUM(CASE WHEN id BETWEEN 100 AND 149 THEN val END) AS band_sum " +
        "FROM graft.cq.rsort_t")
    }),

    // table-property evolution (Iceberg SET/UNSET TBLPROPERTIES):
    // properties live in table metadata — SHOW reads the persisted map,
    // so SET/UNSET survive catalog cache drops and re-opens
    "sql_catalog_tblprops" -> ((s, _) => {
      propsT(s)
      s.sql("SHOW TBLPROPERTIES graft.cq.props_t").orderBy("key")
    }),

    "sql_catalog_ctas" -> ((s, _) => {
      ctasT(s)
      s.sql("SELECT part, COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.ctas_t GROUP BY part ORDER BY part")
    }),

    // CALL compact: live rows unchanged through the rewrite (the file
    // convergence itself is spec-gated in CatalogSpec)
    "sql_call_compact" -> ((s, _) => {
      callCompactT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.callc_t")
    }),

    "sql_call_expire" -> ((s, _) => {
      callExpireT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.callx_t")
    }),

    "sql_call_rollback" -> ((s, _) => {
      callRollbackT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.callr_t")
    }),

    // bucket-partitioned table: point lookups open one bucket's files
    "sql_catalog_bucket" -> ((s, _) => {
      bucketT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.bucket_t WHERE id IN (42, 77, 200)")
    }),

    // partition-spec evolution via CALL update_spec: union across epochs
    "sql_catalog_spec_evol" -> ((s, _) => {
      specEvolT(s)
      s.sql("SELECT part, COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.spec_t GROUP BY part ORDER BY part")
    }),

    // partition-spec evolution via the SQL-extension DDL (injected parser)
    "sql_catalog_spec_evol_ddl" -> ((s, _) => {
      specDdlT(s)
      s.sql("SELECT part, COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.spec_ddl_t GROUP BY part ORDER BY part")
    }),

    // branch lifecycle via CALL create_branch/fast_forward
    "sql_branch_lifecycle" -> ((s, _) => {
      branchLifeT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.branch_t")
    }),

    // WAP: audit-branch write published by CALL cherrypick_snapshot
    "sql_wap_publish" -> ((s, _) => {
      wapPublishT(s)
      s.sql("SELECT COUNT(*) AS n, SUM(id) AS id_sum, SUM(val) AS val_sum " +
        "FROM graft.cq.wap_t")
    }),

    // Iceberg reserved metadata columns through SQL: _file / _pos /
    // _row_id ride the MoR plan's internal columns
    "sql_meta_columns" -> ((s, _) => {
      travelT(s)
      s.sql("SELECT COUNT(DISTINCT _file) AS n_files, SUM(_pos) AS pos_sum, " +
        "COUNT(DISTINCT _row_id) AS n_row_ids FROM graft.cq.travel_t")
    }),

    // Iceberg-style dotted metadata tables: graft.db.t.snapshots / .partitions
    "sql_meta_snapshots" -> ((s, _) => {
      travelT(s)
      s.sql("SELECT snapshot_id, operation, added_rows " +
        "FROM graft.cq.travel_t.snapshots ORDER BY snapshot_id")
    }),

    "sql_meta_partitions" -> ((s, _) => {
      scanT(s)
      s.sql("SELECT partition, record_count " +
        "FROM graft.cq.scan_t.partitions ORDER BY partition")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // native a/b (ids 0..199 by id<100... part split at 100) + adopted
    // c/d (200..399 split at 300), val 2·id, minus the id%10=3 delete
    "sql_call_add_files" ->
      """SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(SUM(id * 2) AS BIGINT) AS val_sum
        |FROM (SELECT range AS id,
        |             CASE WHEN range < 100 THEN 'a' WHEN range < 200 THEN 'b'
        |                  WHEN range < 300 THEN 'c' ELSE 'd' END AS part
        |      FROM range(0, 400) WHERE range % 10 <> 3)
        |GROUP BY part ORDER BY part""".stripMargin,

    // ids 0..499 val 3·id, minus the id%5=0 delete
    "sql_call_snapshot" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(SUM(id * 3) AS BIGINT) AS val_sum
        |FROM range(0, 500) t(id) WHERE id % 5 <> 0""".stripMargin,

    // live = ids 0..399 minus id%10=7, part by id<200, val 2·id
    "sql_catalog_scan" ->
      """SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(SUM(id * 2) AS BIGINT) AS val_sum
        |FROM (SELECT range AS id,
        |             CASE WHEN range < 200 THEN 'a' ELSE 'b' END AS part
        |      FROM range(0, 400) WHERE range % 10 <> 7)
        |GROUP BY part ORDER BY part""".stripMargin,

    "sql_catalog_prune" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(id) AS BIGINT) AS id_sum
        |FROM (SELECT range AS id FROM range(50, 150) WHERE range % 10 <> 7)""".stripMargin,

    // a: 0..99 val 2·id; c: 3 literal rows; d: 2000..2049 val 5·id
    "sql_catalog_insert" ->
      """SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(SUM(val) AS BIGINT) AS val_sum
        |FROM (
        |  SELECT range AS id, 'a' AS part, range * 2 AS val FROM range(0, 100)
        |  UNION ALL SELECT * FROM (VALUES (1000, 'c', 7), (1001, 'c', 9),
        |                                  (1002, 'c', 11)) v(id, part, val)
        |  UNION ALL
        |  SELECT range, 'd', range * 5 FROM range(2000, 2050)
        |) GROUP BY part ORDER BY part""".stripMargin,

    // survivors: 200..399 where id % 7 <> 0
    "sql_catalog_delete" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(MIN(id) AS BIGINT) AS min_id, CAST(MAX(id) AS BIGINT) AS max_id
        |FROM (SELECT range AS id FROM range(200, 400) WHERE range % 7 <> 0)""".stripMargin,

    // val: 0..9 → 2id+1, 10..49 → 2id, 50..99 → 10id, 100..199 → 2id
    "sql_catalog_update" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(val) AS BIGINT) AS val_sum
        |FROM (SELECT CASE WHEN range < 10 THEN range * 2 + 1
        |                  WHEN range BETWEEN 50 AND 99 THEN range * 10
        |                  ELSE range * 2 END AS val
        |      FROM range(0, 200))""".stripMargin,

    // identical to the API twin mor_merge's end state
    "sql_merge_into" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(val AS BIGINT) AS val FROM (
        |  SELECT range AS id, range * 2 AS val FROM range(0, 300)
        |  UNION ALL
        |  SELECT range, CASE WHEN range % 7 = 0 THEN range * 2
        |                     ELSE range * 3 END
        |  FROM range(300, 400) WHERE range % 10 <> 0
        |  UNION ALL
        |  SELECT range, range * 3 FROM range(400, 500) WHERE range % 10 <> 0
        |)""".stripMargin,

    // replace_t end state: the CoR-TAS definition, run twice (idempotent)
    "sql_catalog_replace" ->
      """SELECT CAST(range AS BIGINT) AS id, CAST(range * 7 AS BIGINT) AS sept
        |FROM range(0, 80)""".stripMargin,

    // view_agg over view_v over view_t (ids < 250 live minus %10==3,
    // val 2id, grouped by id%7); view_v1 pins snapshot 1 (200 rows)
    "sql_catalog_view" ->
      """SELECT a.g, a.n, a.s, b.n AS base_n FROM (
        |  SELECT CAST(range % 7 AS BIGINT) AS g,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(range * 2) AS BIGINT) AS s
        |  FROM range(0, 250) WHERE range % 10 <> 3 GROUP BY range % 7
        |) a CROSS JOIN (SELECT CAST(200 AS BIGINT) AS n) b ORDER BY a.g""".stripMargin,

    // exists_t end state: source covers 0..249 (keep=0 on %4==0) — EXISTS
    // deletes those, NOT EXISTS deletes the uncovered 250..299
    "sql_catalog_delete_exists" ->
      """SELECT CAST(range AS BIGINT) AS id, CAST(range * 2 AS BIGINT) AS val
        |FROM range(0, 250) WHERE range % 4 <> 0""".stripMargin,

    // ucorr_t end state: even covered ids take id%7+10, even uncovered
    // take NULL (max over zero rows, +10 keeps NULL), odd keep 2·id
    "sql_catalog_update_corr" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(CASE WHEN range % 2 = 0 AND range < 50
        |                 THEN range % 7 + 10
        |            WHEN range % 2 = 0 THEN NULL
        |            ELSE range * 2 END AS BIGINT) AS val
        |FROM range(0, 100)""".stripMargin,

    // exres_t end state: even ids 0..198 were in-band and died; odd ids
    // under 200 (out-of-band) and 200..299 (uncovered) survive
    "sql_catalog_delete_exists_residual" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(id * 10 AS BIGINT) AS ts,
        |       CAST(id * 2 AS BIGINT) AS val FROM (
        |  SELECT range AS id FROM range(0, 200) WHERE range % 2 = 1
        |  UNION ALL SELECT range FROM range(200, 300)
        |)""".stripMargin,

    // updexres_t end state: in-band (even, covered) ids took +1000; rows
    // with NO in-band witness and id < 100 (the odd ids under 100) took
    // -1; everything else kept 2·id
    "sql_catalog_update_exists_residual" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(id * 10 AS BIGINT) AS ts,
        |       CAST(val AS BIGINT) AS val FROM (
        |  SELECT range AS id, range * 2 + 1000 AS val FROM range(0, 200)
        |  WHERE range % 2 = 0
        |  UNION ALL SELECT range, -1 FROM range(0, 100) WHERE range % 2 = 1
        |  UNION ALL SELECT range, range * 2 FROM range(100, 200)
        |  WHERE range % 2 = 1
        |  UNION ALL SELECT range, range * 2 FROM range(200, 300)
        |)""".stripMargin,

    // ucorrcnt_t end state: even covered ids < 30 count 1 (only x=k+120
    // clears the filter), every other even id counts 0 — whether the key
    // was covered-but-filtered-empty (30..58) or never covered (60..98) —
    // odd ids keep 2·id
    "sql_catalog_update_corr_count" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(CASE WHEN range % 2 = 1 THEN range * 2
        |            WHEN range < 30 THEN 1 ELSE 0 END AS BIGINT) AS val
        |FROM range(0, 100)""".stripMargin,

    // mmulti_t end state: first-match-wins across the ordered actions
    "sql_merge_multi_action" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(val AS BIGINT) AS val, note
        |FROM (
        |  SELECT range AS id, range * 2 AS val, 'base' AS note
        |  FROM range(0, 50)
        |  UNION ALL SELECT range,
        |    CASE WHEN range % 10 = 0 THEN -1
        |         WHEN range % 2 = 0 THEN range * 2 + range % 5
        |         ELSE range * 2 END,
        |    CASE WHEN range % 10 = 0 THEN 'ten' ELSE 'base' END
        |  FROM range(50, 100) WHERE range % 10 <> 1
        |  UNION ALL SELECT range, -100, 'newten'
        |  FROM range(100, 150) WHERE range % 10 = 0
        |  UNION ALL SELECT range, range % 5, NULL
        |  FROM range(100, 150) WHERE range % 2 = 1
        |)""".stripMargin,

    // usub_t end state: id%3==0 → 49+id (the materialized MAX), else 2·id
    "sql_catalog_update_subq" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(CASE WHEN range % 3 = 0 THEN 49 + range
        |            ELSE range * 2 END AS BIGINT) AS val
        |FROM range(0, 100)""".stripMargin,

    // scan_t live partitions (Hive-rendered)
    "sql_show_partitions" ->
      """SELECT * FROM (VALUES ('part=a'), ('part=b')) v(partition)
        |ORDER BY partition""".stripMargin,

    // wodd_t: the shuffled permutation insert round-trips exactly
    "sql_write_order_ddl" ->
      """SELECT CAST((range * 37) % 1000 AS BIGINT) AS id,
        |       CAST(range AS BIGINT) AS v FROM range(0, 1000)""".stripMargin,

    // updnotin_t end state: with-NULL source no-oped; clean source
    // stamped 60..99 with -1; the NULL-key row kept -5
    "sql_catalog_update_not_in" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(val AS BIGINT) AS val FROM (
        |  SELECT range AS id, range * 2 AS val FROM range(0, 60)
        |  UNION ALL SELECT range, -1 FROM range(60, 100)
        |  UNION ALL SELECT NULL, -5
        |)""".stripMargin,

    // ucorrm_t end state: a = per-key MAX (NULL where s1 uncovered),
    // b = filtered per-key COUNT (0 where empty), independently
    "sql_catalog_update_corr_multi" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(CASE WHEN range < 50 THEN range % 7
        |            ELSE NULL END AS BIGINT) AS a,
        |       CAST(CASE WHEN range < 30 THEN 1 ELSE 0 END AS BIGINT) AS b
        |FROM range(0, 100)""".stripMargin,

    // updincomp_t end state: even covered ids stamped -1
    "sql_catalog_update_in_composite" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(range % 3 AS BIGINT) AS grp,
        |       CAST(CASE WHEN range < 100 AND range % 2 = 0 THEN -1
        |            ELSE range END AS BIGINT) AS val
        |FROM range(0, 200)""".stripMargin,

    // delnotin_t end state: the with-NULL source made delete #1 a no-op;
    // the clean source killed 60..99; the NULL-key row survives
    "sql_catalog_delete_not_in" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(range * 2 AS BIGINT) AS val FROM range(0, 60)
        |UNION ALL SELECT NULL, CAST(-5 AS BIGINT)""".stripMargin,

    // delincomp_t end state: even covered ids (0..98) died; odd covered
    // and all uncovered ids survive
    "sql_catalog_delete_in_composite" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(range % 3 AS BIGINT) AS grp,
        |       CAST(range AS BIGINT) AS val
        |FROM range(0, 200)
        |WHERE NOT (range < 100 AND range % 2 = 0)""".stripMargin,

    // msub_t end state: matched 50..99 took 2·id + MAX(b)=7; unmatched
    // 100..149 inserted COUNT(*)=8; untouched 0..49 keep 2·id
    "sql_merge_subq_assign" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(CASE WHEN range < 50 THEN range * 2
        |            WHEN range < 100 THEN range * 2 + 7
        |            ELSE 8 END AS BIGINT) AS val
        |FROM range(0, 150)""".stripMargin,

    // dcorrs_t: DuckDB replays the same correlated DML semantics
    // (a genuine differential, not a hand-enumerated end state)
    "sql_catalog_dml_corr_scalar" ->
      """WITH t AS (SELECT range AS id, range % 10 AS grp, range AS v
        |           FROM range(0, 100)),
        |     aux AS (SELECT range AS g, range * 10 AS x FROM range(0, 5)
        |             UNION ALL
        |             SELECT range, range * 10 + 40 FROM range(0, 5)),
        |     d AS (SELECT * FROM t WHERE NOT coalesce(
        |             v > (SELECT MAX(x) FROM aux a WHERE a.g = t.grp),
        |             FALSE))
        |SELECT CAST(id AS BIGINT) AS id, CAST(grp AS BIGINT) AS grp,
        |       CAST(CASE WHEN coalesce(
        |              v >= (SELECT AVG(x) FROM aux a WHERE a.g = d.grp),
        |              FALSE) THEN v + 1000 ELSE v END AS BIGINT) AS v
        |FROM d""".stripMargin,

    // the exact Spark-rendered DDL text (trailing newline included)
    "sql_show_create" ->
      """SELECT 'CREATE TABLE graft.cq.showcr_t (' || chr(10) ||
        |       '  id BIGINT,' || chr(10) ||
        |       '  part STRING,' || chr(10) ||
        |       '  v DOUBLE)' || chr(10) ||
        |       'PARTITIONED BY (part)' || chr(10) ||
        |       'TBLPROPERTIES (' || chr(10) ||
        |       '  ''write.parquet.compression-codec'' = ''zstd'')' ||
        |       chr(10) AS createtab_stmt""".stripMargin,

    // dmlscal_t end state: ids 60..99 deleted (MAX=59); the empty-subquery
    // DELETE is a no-op; ids 0..29 (AVG=29.5) read val + 60 (COUNT)
    "sql_catalog_dml_scalar_where" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(CASE WHEN range < 30 THEN range + 60 ELSE range END
        |            AS BIGINT) AS val
        |FROM range(0, 60)""".stripMargin,

    // mcorr_t end state: 0..49 untouched; 50..99 matched (SUM = id+1 where
    // id%3=0, else NULL — SUM over zero rows); 100..149 inserted (COUNT =
    // 2 where id%3=0, else 0)
    "sql_merge_corr_assign" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(CASE WHEN range < 50 THEN range * 2
        |            WHEN range < 100 THEN
        |              CASE WHEN range % 3 = 0 THEN range + 1 END
        |            ELSE CASE WHEN range % 3 = 0 THEN 2 ELSE 0 END
        |            END AS BIGINT) AS val
        |FROM range(0, 150)""".stripMargin,

    // mrange_t end state: in-band (id%9<=5) updated; out-of-band old rows
    // survive with an inserted sibling; 300..399 inserted
    "sql_merge_range" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(ts AS BIGINT) AS ts,
        |       CAST(val AS BIGINT) AS val FROM (
        |  SELECT range AS id, range*10 + range%9 AS ts, range + 1000 AS val
        |  FROM range(0, 300) WHERE range % 9 <= 5
        |  UNION ALL SELECT range, range*10, range
        |  FROM range(0, 300) WHERE range % 9 > 5
        |  UNION ALL SELECT range, range*10 + range%9, range + 1000
        |  FROM range(0, 300) WHERE range % 9 > 5
        |  UNION ALL SELECT range, range*10 + range%9, range + 1000
        |  FROM range(300, 400)
        |)""".stripMargin,

    // ovwd_t end state (dynamic overwrite): a replaced by 200..202,
    // d created with 203..205, b untouched
    "sql_catalog_overwrite_dyn" ->
      """SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(id) AS BIGINT) AS id_sum
        |FROM (
        |  SELECT range AS id, 'a' AS part FROM range(200, 203)
        |  UNION ALL SELECT range, 'b' FROM range(10, 30)
        |  UNION ALL SELECT range, 'd' FROM range(203, 206)
        |) GROUP BY part ORDER BY part""".stripMargin,

    // ovwp_t end state: partition a replaced by 100..102, b untouched
    "sql_catalog_overwrite_part" ->
      """SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(id) AS BIGINT) AS id_sum
        |FROM (
        |  SELECT range AS id, 'a' AS part FROM range(100, 103)
        |  UNION ALL SELECT range, 'b' FROM range(10, 30)
        |) GROUP BY part ORDER BY part""".stripMargin,

    // mevolve_t end state: 0..99 keep 2id with NULL note; 100..299 take
    // the source's 3id + n<id>
    "sql_merge_evolve" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(val AS BIGINT) AS val, note FROM (
        |  SELECT range AS id, range * 2 AS val, CAST(NULL AS VARCHAR) AS note
        |  FROM range(0, 100)
        |  UNION ALL
        |  SELECT range, range * 3, 'n' || CAST(range AS VARCHAR)
        |  FROM range(100, 300)
        |)""".stripMargin,

    // mexpr_t end state: 0..99 untouched; 100..199 2id+id%7 unless %10=5;
    // 200..299 inserted as (id%7)*100
    "sql_merge_expr" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(val AS BIGINT) AS val FROM (
        |  SELECT range AS id, range * 2 AS val FROM range(0, 100)
        |  UNION ALL
        |  SELECT range, CASE WHEN range % 10 = 5 THEN range * 2
        |                     ELSE range * 2 + range % 7 END
        |  FROM range(100, 200)
        |  UNION ALL
        |  SELECT range, (range % 7) * 100 FROM range(200, 300)
        |)""".stripMargin,

    // updex_t end state: ids < 60 get 2id+1000 (EXISTS), the rest -1
    "sql_catalog_update_exists" ->
      """SELECT CAST(range AS BIGINT) AS id,
        |       CAST(CASE WHEN range < 60 THEN range * 2 + 1000
        |                 ELSE -1 END AS BIGINT) AS val
        |FROM range(0, 100)""".stripMargin,

    // nmbs_t end state: 0..99 minus id%5=0, with id%3=0 at 2id+1000,
    // others 2id; 100..299 take the source's 3id (matched update / insert)
    "sql_merge_nmbs" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(val AS BIGINT) AS val FROM (
        |  SELECT range AS id,
        |         CASE WHEN range % 3 = 0 THEN range * 2 + 1000
        |              ELSE range * 2 END AS val
        |  FROM range(0, 100) WHERE range % 5 <> 0
        |  UNION ALL
        |  SELECT range, range * 3 FROM range(100, 300)
        |)""".stripMargin,

    "sql_catalog_fast_count" ->
      """SELECT CAST(200 AS BIGINT) AS n""",

    // travel_t: ids 0..199, val = 2·id, no deletes → exact manifest bounds
    // a: 0..99 (10 nulls), b: 100..159 (6 nulls), c: 160..179 (2 nulls)
    "sql_catalog_fast_groupby" ->
      """SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(COUNT(val) AS BIGINT) AS n_val,
        |       CAST(MIN(id) AS BIGINT) AS mn, CAST(MAX(id) AS BIGINT) AS mx
        |FROM (SELECT range AS id,
        |        CASE WHEN range < 100 THEN 'a'
        |             WHEN range < 160 THEN 'b' ELSE 'c' END AS part,
        |        CASE WHEN range % 10 = 0 THEN NULL ELSE range * 3 END AS val
        |      FROM range(0, 180))
        |GROUP BY part ORDER BY part""".stripMargin,

    "sql_catalog_distinct_part" ->
      """SELECT 'a' AS part UNION ALL SELECT 'b' UNION ALL SELECT 'c'
        |ORDER BY part""".stripMargin,

    // a: 100 rows (90 non-null val), c: 20 rows (18 non-null val)
    "sql_catalog_fast_count_where" ->
      """SELECT CAST(120 AS BIGINT) AS n, CAST(108 AS BIGINT) AS n_val,
        |       CAST(0 AS BIGINT) AS mn, CAST(179 AS BIGINT) AS mx""".stripMargin,

    "sql_catalog_fast_minmax" ->
      """SELECT CAST(0 AS BIGINT) AS mn, CAST(199 AS BIGINT) AS mx,
        |       CAST(0 AS BIGINT) AS mnv, CAST(398 AS BIGINT) AS mxv,
        |       CAST(200 AS BIGINT) AS n""".stripMargin,

    "sql_catalog_overwrite" ->
      """SELECT 'z' AS part, CAST(50 AS BIGINT) AS n,
        |       CAST(SUM(range) AS BIGINT) AS id_sum,
        |       CAST(SUM(range * 7) AS BIGINT) AS val_sum
        |FROM range(500, 550)""".stripMargin,

    // a: ids 0..99, score 2·id, bonus = initial default 5;
    // b: ids 100..119, score 3·id, bonus = id
    "sql_catalog_alter" ->
      """SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(score) AS BIGINT) AS score_sum,
        |       CAST(SUM(bonus) AS BIGINT) AS bonus_sum
        |FROM (
        |  SELECT 'a' AS part, range * 2 AS score, 5 AS bonus FROM range(0, 100)
        |  UNION ALL
        |  SELECT 'b', range * 3, range FROM range(100, 120)
        |) GROUP BY part ORDER BY part""".stripMargin,

    "sql_catalog_travel" ->
      """SELECT CAST(100 AS BIGINT) AS n, CAST(4950 AS BIGINT) AS id_sum""".stripMargin,

    // snapshot 1 of travel_t: ids 0..99, val = 2·id
    "sql_catalog_travel_agg" ->
      """SELECT CAST(100 AS BIGINT) AS n, CAST(0 AS BIGINT) AS mn,
        |       CAST(99 AS BIGINT) AS mx, CAST(198 AS BIGINT) AS mxv""".stripMargin,

    // props_t final persisted map after SET(merge)+UNSET
    "sql_catalog_tblprops" ->
      """SELECT 'quality.tier' AS key, 'gold' AS value
        |UNION ALL SELECT 'write.note', 'v2' ORDER BY key""".stripMargin,

    // word_t: ids 0..399 (permuted insert order), val = 3·id
    "sql_call_write_ordered" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(range) AS BIGINT) AS id_sum,
        |       CAST(SUM(range * 3) AS BIGINT) AS val_sum,
        |       CAST(SUM(CASE WHEN range BETWEEN 100 AND 149
        |                     THEN range * 3 END) AS BIGINT) AS band_sum
        |FROM range(0, 400)""".stripMargin,

    // scan_t live rows below 100: part 'a', id%10<>7
    "sql_catalog_ctas" ->
      """SELECT 'a' AS part, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(range) AS BIGINT) AS id_sum,
        |       CAST(SUM(range * 2) AS BIGINT) AS val_sum
        |FROM range(0, 100) WHERE range % 10 <> 7""".stripMargin,

    // ids 0..199 minus id%10=3, val 2·id — unchanged by the rewrite
    "sql_call_compact" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(range) AS BIGINT) AS id_sum,
        |       CAST(SUM(range * 2) AS BIGINT) AS val_sum
        |FROM range(0, 200) WHERE range % 10 <> 3""".stripMargin,

    // full 0..199 — unchanged by compaction + history expiry
    "sql_call_expire" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(range) AS BIGINT) AS id_sum,
        |       CAST(SUM(range * 2) AS BIGINT) AS val_sum
        |FROM range(0, 200)""".stripMargin,

    // rolled back to snapshot 1 = ids 0..99
    "sql_call_rollback" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(range) AS BIGINT) AS id_sum,
        |       CAST(SUM(range * 2) AS BIGINT) AS val_sum
        |FROM range(0, 100)""".stripMargin,

    // probes 42 and 200 live (val 2·id); 77 was SQL-deleted
    "sql_catalog_bucket" ->
      """SELECT CAST(2 AS BIGINT) AS n, CAST(242 AS BIGINT) AS id_sum,
        |       CAST(484 AS BIGINT) AS val_sum""".stripMargin,

    // epoch 1 (identity part): a = 0..99 val 2id, b = 100..199 val 2id;
    // epoch 2 (bucket(4,id)): c = 200..299 val 3id
    "sql_catalog_spec_evol" ->
      """SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(SUM(val) AS BIGINT) AS val_sum
        |FROM (
        |  SELECT range AS id,
        |         CASE WHEN range < 100 THEN 'a' ELSE 'b' END AS part,
        |         range * 2 AS val FROM range(0, 200)
        |  UNION ALL SELECT range, 'c', range * 3 FROM range(200, 300)
        |) GROUP BY part ORDER BY part""".stripMargin,

    // identical end state to sql_catalog_spec_evol — the DDL twin
    "sql_catalog_spec_evol_ddl" ->
      """SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(SUM(val) AS BIGINT) AS val_sum
        |FROM (
        |  SELECT range AS id,
        |         CASE WHEN range < 100 THEN 'a' ELSE 'b' END AS part,
        |         range * 2 AS val FROM range(0, 200)
        |  UNION ALL SELECT range, 'c', range * 3 FROM range(200, 300)
        |) GROUP BY part ORDER BY part""".stripMargin,

    // base 0..99 (val 2id) + fast-forwarded branch rows 100..159 (val 2id)
    "sql_branch_lifecycle" ->
      """SELECT CAST(160 AS BIGINT) AS n,
        |       CAST(SUM(range) AS BIGINT) AS id_sum,
        |       CAST(SUM(range * 2) AS BIGINT) AS val_sum
        |FROM range(0, 160)""".stripMargin,

    // vprops_v: 3 rows; team overwritten to g2, scratch unset, ns tier set
    "sql_view_props" ->
      """SELECT CAST(3 AS BIGINT) AS n, 'g2' AS team,
        |       'false' AS scratch_present, 'gold' AS ns_tier""".stripMargin,

    // brddl_t end state: 0..99 (2id) + branch-written 100..139 (3id),
    // minus the branch DELETE id%10==7, published by fast_forward
    "sql_branch_ddl" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(val AS BIGINT) AS val FROM (
        |  SELECT range AS id, range * 2 AS val FROM range(0, 100)
        |  UNION ALL SELECT range, range * 3 FROM range(100, 140)
        |) WHERE id % 10 <> 7""".stripMargin,

    // base 0..99 (val 2id) + cherry-picked audit rows 500..539 (val 5id)
    "sql_wap_publish" ->
      """SELECT CAST(140 AS BIGINT) AS n,
        |       CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(SUM(val) AS BIGINT) AS val_sum
        |FROM (
        |  SELECT range AS id, range * 2 AS val FROM range(0, 100)
        |  UNION ALL SELECT range, range * 5 FROM range(500, 540)
        |)""".stripMargin,

    // travel_t: 2 one-file appends of 100 rows → pos 0..99 twice,
    // 200 distinct row ids
    "sql_meta_columns" ->
      """SELECT CAST(2 AS BIGINT) AS n_files, CAST(9900 AS BIGINT) AS pos_sum,
        |       CAST(200 AS BIGINT) AS n_row_ids""".stripMargin,

    // travel_t: two appends of 100 rows each
    "sql_meta_snapshots" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'append', CAST(100 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'append', CAST(100 AS BIGINT)))
        |  v(snapshot_id, operation, added_rows)
        |ORDER BY snapshot_id""".stripMargin,

    // partitions view is delete-unaware: full 200 per partition
    "sql_meta_partitions" ->
      """SELECT * FROM (VALUES
        |  ('part=a', CAST(200 AS BIGINT)), ('part=b', CAST(200 AS BIGINT)))
        |  v(partition, record_count)
        |ORDER BY partition""".stripMargin,

    // published state: ids 0..149 minus %10=4, val = 2·id
    "sql_wap_branch_conf" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(SUM(id * 2) AS BIGINT) AS val_sum
        |FROM range(0, 150) t(id) WHERE id % 10 <> 4""".stripMargin,

    // survivors of three modulo deletes over ids 0..299, val = 2·id
    "sql_call_rewrite_pos_deletes" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(SUM(id * 2) AS BIGINT) AS val_sum
        |FROM range(0, 300) t(id)
        |WHERE id % 7 <> 0 AND id % 11 <> 3 AND id % 13 <> 5""".stripMargin,

    // val: 9·id on 80..119 (second wave wins), 5·id on 50..79, else 2·id
    "sql_call_convert_eq_deletes" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN id BETWEEN 80 AND 119 THEN id * 9
        |                     WHEN id BETWEEN 50 AND 79 THEN id * 5
        |                     ELSE id * 2 END) AS BIGINT) AS val_sum
        |FROM range(0, 300) t(id)""".stripMargin,

    // ids 0..399 complete (4 interleaved residue classes), val = 7·id
    "sql_catalog_bloom" ->
      """SELECT CAST(3 AS BIGINT) AS n,
        |       CAST(42 + 137 + 298 AS BIGINT) AS id_sum,
        |       CAST((42 + 137 + 298) * 7 AS BIGINT) AS val_sum""".stripMargin,

    // four permuted 100-row inserts of (id·173+k) % 400, val = 3·id
    "sql_call_rewrite_sorted" ->
      """WITH r AS (
        |  SELECT (id * 173 + k) % 400 AS id
        |  FROM range(0, 100) t(id), range(0, 4) u(k))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(id) AS BIGINT) AS id_sum,
        |       CAST(SUM(id * 3) AS BIGINT) AS val_sum,
        |       CAST(SUM(CASE WHEN id BETWEEN 100 AND 149 THEN id * 3 END)
        |            AS BIGINT) AS band_sum
        |FROM r""".stripMargin,

    // snap 1: +2 data files (200 rows); snap 2: +2 pos-delete files;
    // snap 3 (compact): +2 data (180 live rows), -2 data, -2 deletes
    "sql_meta_entries" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'added',   'data',    CAST(2 AS BIGINT), CAST(200 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'added',   'deletes', CAST(2 AS BIGINT), CAST(NULL AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'added',   'data',    CAST(2 AS BIGINT), CAST(180 AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'deleted', 'data',    CAST(2 AS BIGINT), CAST(NULL AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'deleted', 'deletes', CAST(2 AS BIGINT), CAST(NULL AS BIGINT)))
        |  v(snapshot_id, status, content, n, rows_declared)
        |ORDER BY snapshot_id, status, content""".stripMargin,

    "sql_meta_manifests" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'data',    'inline', 2, CAST(200 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'deletes', 'inline', 2, CAST(NULL AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'data',    'inline', 2, CAST(180 AS BIGINT)))
        |  v(snapshot_id, content, manifest, file_count, added_rows)
        |ORDER BY snapshot_id, content""".stripMargin,

    // ids 3,13,..,93 in each partition's single 100-row file → pos = 3..93
    // step 10 (Σ=480) twice
    "sql_meta_pos_deletes" ->
      """SELECT CAST(20 AS BIGINT) AS n, CAST(960 AS BIGINT) AS pos_sum,
        |       CAST(2 AS BIGINT) AS n_files""".stripMargin
  )
}
