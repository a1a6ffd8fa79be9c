package graft

import org.apache.spark.sql.functions._

/** INSERT OVERWRITE with a static PARTITION spec must replace ONLY that
  * partition (metadata-tier drop + append, one snapshot) — not truncate
  * the table, not error. */
class OverwritePartitionSpec extends SparkSpec {
  test("INSERT OVERWRITE t PARTITION (part='a') replaces one partition") {
    graft.queries.CatalogFixture.ensure(spark)
    spark.sql("CREATE TABLE graft.db.t_ovwp (id BIGINT, part STRING) " +
      "PARTITIONED BY (part)")
    spark.sql("INSERT INTO graft.db.t_ovwp SELECT id, 'a' FROM range(0, 10)")
    spark.sql("INSERT INTO graft.db.t_ovwp SELECT id, 'b' FROM range(10, 30)")
    spark.sql("INSERT OVERWRITE graft.db.t_ovwp PARTITION (part = 'a') " +
      "SELECT id FROM range(100, 103)")
    val got = spark.sql("SELECT part, count(*) AS n, sum(id) AS s " +
      "FROM graft.db.t_ovwp GROUP BY part ORDER BY part")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 3L, 303L), ("b", 20L, (10L until 30L).sum)),
      s"got $got")
    spark.sql("DROP TABLE graft.db.t_ovwp")
  }

  test("dynamic partition overwrite replaces ONLY the partitions present " +
      "in the batch, untouched partitions keep their exact files, one snapshot") {
    graft.queries.CatalogFixture.ensure(spark)
    val wh = graft.queries.CatalogFixture.warehouse
    spark.sql("CREATE TABLE graft.db.t_ovwd (id BIGINT, part STRING) " +
      "PARTITIONED BY (part)")
    spark.sql("INSERT INTO graft.db.t_ovwd SELECT id, 'a' FROM range(0, 10)")
    spark.sql("INSERT INTO graft.db.t_ovwd SELECT id, 'b' FROM range(10, 30)")
    spark.sql("INSERT INTO graft.db.t_ovwd SELECT id, 'c' FROM range(30, 35)")
    // MoR state inside an untouched partition must ALSO survive
    spark.sql("DELETE FROM graft.db.t_ovwd WHERE part = 'b' AND id = 10")
    val log = graft.meta.SnapshotLog(s"$wh/db/t_ovwd")
    def liveByPart: Map[String, Set[String]] = {
      val st = log.load()
      st.dataFiles.groupBy(_.partition.getOrElse("part", "?"))
        .map { case (k, fs) => k -> fs.map(_.path).toSet }
    }
    val before = liveByPart
    val preSnap = log.lastSnapshotId
    val caps = new graft.catalog.GraftSparkTable("db.t_ovwd", s"$wh/db/t_ovwd")
      .capabilities()
    assert(caps.contains(
      org.apache.spark.sql.connector.catalog.TableCapability.OVERWRITE_DYNAMIC),
      s"capabilities: $caps")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the batch touches partitions a (replaced) and d (new); b, c stay
      spark.sql("INSERT OVERWRITE graft.db.t_ovwd " +
        "SELECT id, CASE WHEN id < 102 THEN 'a' ELSE 'd' END AS part " +
        "FROM range(100, 106)")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(log.lastSnapshotId == preSnap + 1,
      "dynamic overwrite must publish exactly ONE snapshot")
    val after = liveByPart
    assert(after("b") == before("b") && after("c") == before("c"),
      s"untouched partitions must keep their exact files:\n$before\n$after")
    assert(after("a").intersect(before("a")).isEmpty,
      "overwritten partition must not keep any old file")
    val got = spark.sql("SELECT part, count(*) AS n, sum(id) AS s " +
      "FROM graft.db.t_ovwd GROUP BY part ORDER BY part")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("a", 2L, 201L),                        // 100, 101
      ("b", 19L, (11L until 30L).sum),        // id=10 deleted pre-overwrite
      ("c", 5L, (30L until 35L).sum),
      ("d", 4L, (102L until 106L).sum)), s"got $got")
    // static mode is untouched by the capability: whole-table overwrite
    spark.sql("INSERT OVERWRITE graft.db.t_ovwd SELECT id, 'z' FROM range(0, 4)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.t_ovwd")
      .collect()(0).getLong(0) == 4L,
      "static-mode INSERT OVERWRITE must still truncate-and-append")
    spark.sql("DROP TABLE graft.db.t_ovwd")
  }
}
