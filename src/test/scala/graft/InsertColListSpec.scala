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
}
