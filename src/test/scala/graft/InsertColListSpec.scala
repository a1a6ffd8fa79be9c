package graft

import org.apache.spark.sql.functions._

/** INSERT with an explicit COLUMN LIST: unnamed columns take their
  * declared DEFAULT (or NULL) — the SUPPORT_COLUMN_DEFAULT_VALUE path
  * through the V1 write conformance. */
class InsertColListSpec extends SparkSpec {
  test("INSERT INTO t (cols...) pads missing columns with defaults/NULL") {
    graft.queries.CatalogFixture.ensure(spark)
    val wh = graft.queries.CatalogFixture.warehouse
    spark.sql("CREATE TABLE graft.db.t_inscols " +
      "(id BIGINT, val BIGINT DEFAULT 77, note STRING)")
    spark.sql("INSERT INTO graft.db.t_inscols (id) VALUES (1), (2)")
    spark.sql("INSERT INTO graft.db.t_inscols (id, note) VALUES (3, 'x')")
    spark.sql("INSERT INTO graft.db.t_inscols VALUES (4, 5, 'y')")
    val got = spark.sql("SELECT id, val, note FROM graft.db.t_inscols")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2)).getOrElse("-"))).toSet
    assert(got == Set((1L, 77L, "-"), (2L, 77L, "-"), (3L, 77L, "x"),
      (4L, 5L, "y")), s"got $got")
    spark.sql("DROP TABLE graft.db.t_inscols")
  }

  test("explicit DEFAULT keyword in VALUES and UPDATE SET") {
    graft.queries.CatalogFixture.ensure(spark)
    spark.sql("CREATE TABLE graft.db.t_defkw " +
      "(id BIGINT, val BIGINT DEFAULT 9)")
    spark.sql("INSERT INTO graft.db.t_defkw VALUES (1, DEFAULT), (2, 3)")
    spark.sql("UPDATE graft.db.t_defkw SET val = DEFAULT WHERE id = 2")
    val got = spark.sql("SELECT id, val FROM graft.db.t_defkw")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 9L, 2L -> 9L), s"got $got")
    spark.sql("DROP TABLE graft.db.t_defkw")
  }

  test("partitioned CTAS lays data out under the declared spec") {
    graft.queries.CatalogFixture.ensure(spark)
    val wh = graft.queries.CatalogFixture.warehouse
    spark.sql("CREATE TABLE graft.db.t_ctaspart " +
      "PARTITIONED BY (part) AS " +
      "SELECT id, CASE WHEN id < 5 THEN 'a' ELSE 'b' END AS part " +
      "FROM range(0, 10)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.t_ctaspart " +
      "WHERE part = 'a'").collect()(0).getLong(0) == 5L)
    val st = graft.meta.SnapshotLog(s"$wh/db/t_ctaspart").load().mainOnly
    assert(st.dataFiles.forall(_.partition.contains("part")),
      s"CTAS files must carry the partition tuple: " +
        s"${st.dataFiles.map(_.partition)}")
    spark.sql("DROP TABLE graft.db.t_ctaspart")
  }
}
