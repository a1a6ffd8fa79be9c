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
}
