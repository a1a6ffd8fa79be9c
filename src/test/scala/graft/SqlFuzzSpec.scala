package graft

import org.apache.spark.sql.functions._

import graft.gen.Bundles
import graft.scenarios.Scenarios

/** Model-based fuzz over the SQL surface: the same id-level MoR model as
  * [[FuzzModelSpec]], but every mutation goes through the CATALOG — INSERT
  * INTO / DELETE FROM / MERGE INTO / UPDATE / INSERT OVERWRITE / ALTER
  * TABLE / CALL procedures — so random interleavings exercise the
  * analyzer substitution, the DML command capture, the cast-tolerant
  * predicate router (metadata-tier vs positional deletes), the
  * manifest COUNT(*) fast path, and SQL time travel, all against one
  * reference model. Seeds are fixed — fully deterministic. */
class SqlFuzzSpec extends SparkSpec {

  private val seeds: Seq[Long] = sys.env.get("SPARK_GRAFT_SQLFUZZ_SEEDS")
    .map(_.split(",").toSeq.map(_.trim.toLong))
    .getOrElse(Seq(11L, 23L))
  private val steps: Int =
    sys.env.get("SPARK_GRAFT_SQLFUZZ_STEPS").map(_.toInt).getOrElse(14)

  private def runFuzz(seed: Long, tableName: String, partitionDdl: String): Unit = {
    graft.queries.CatalogFixture.ensure(spark)
    val qname = s"graft.fz.$tableName"
    val rnd = new scala.util.Random(seed)
    spark.sql(s"CREATE TABLE $qname (order_id INT, order_year INT, " +
      s"order_date TIMESTAMP_NTZ, source_id INT, product_name STRING, " +
      s"amount DOUBLE)$partitionDdl")
    var nextId = 0L
    val live = scala.collection.mutable.Set.empty[Long]
    var snapId = 0L
    var history = Vector.empty[(Long, Set[Long])]
    var extraCols = Vector.empty[(String, Int)]

    def withExtras(df: org.apache.spark.sql.DataFrame) =
      extraCols.foldLeft(df) { case (d, (c, v)) => d.withColumn(c, lit(v)) }

    def freshView(start: Long, n: Int, withOp: Boolean): String = {
      val base = withExtras(Bundles.ordersUnpartitioned()
        .frame(spark, start, n, None, Scenarios.OrdersSchema))
      val df = if (withOp)
        base.withColumn("op",
          when(col("order_id") % 3 === 0, lit("D")).otherwise(lit("U")))
      else base
      df.createOrReplaceTempView("sqlfz_src")
      "sqlfz_src"
    }

    def insertRows(): Unit = {
      val v = freshView(nextId, 20, withOp = false)
      spark.sql(s"INSERT INTO $qname SELECT * FROM $v")
      (nextId until nextId + 20).foreach(live += _)
      nextId += 20
    }

    insertRows(); snapId += 1
    history :+= (snapId, live.toSet)

    for (step <- 1 to steps) {
      var commits = 1
      rnd.nextInt(17) match {
        case 16 => // correlated scalar-aggregate WHERE comparison over the
          // semi-join route: per covered id MIN(a.order_id) = order_id, so
          // `>=` is TRUE for exactly the window's live ids; uncovered ids
          // read NULL (never TRUE) and must survive. Correlates on the
          // key itself — amount drifts under earlier update steps, so a
          // value-column comparison would not have a closed-form model.
          val start = rnd.nextLong(math.max(nextId - 10, 1L))
          val n = 1 + rnd.nextInt(10)
          val v = freshView(start, n, withOp = false)
          spark.sql(
            s"""DELETE FROM $qname t WHERE t.order_id >= (
               |  SELECT MIN(a.order_id) FROM $v a
               |  WHERE a.order_id = t.order_id)""".stripMargin)
          live.filterInPlace(i => i < start || i >= start + n)
        case 15 => // correlated scalar-aggregate assignment: the COUNT
          // decorrelates into the source (covered keys read 2×-windowed
          // counts, uncovered read 0); id-liveness no-op, gates apply
          val start = rnd.nextLong(math.max(nextId - 10, 1L))
          val n = 1 + rnd.nextInt(10)
          val v = freshView(start, n, withOp = false)
          spark.sql(
            s"""MERGE INTO $qname t USING $v s ON t.order_id = s.order_id
               |WHEN MATCHED THEN UPDATE SET amount = t.amount +
               |  (SELECT COUNT(*) FROM $v a WHERE a.order_id = t.order_id)
               |""".stripMargin)
        case 14 => // NOT IN delete (three-valued logic; this model has no
          // NULL keys, source non-empty): survivors are exactly the ids
          // the source window covers
          val start = rnd.nextLong(math.max(nextId - 10, 1L))
          val n = 1 + rnd.nextInt(10)
          val v = freshView(start, n, withOp = false)
          spark.sql(s"DELETE FROM $qname WHERE order_id NOT IN " +
            s"(SELECT order_id FROM $v)")
          live.filterInPlace(i => i >= start && i < start + n)
        case 13 => // UPDATE WHERE EXISTS with a non-equality correlated
          // conjunct → the residual-aware semi-join update; id-liveness
          // no-op (one delete+append snapshot), COUNT/MIN/MAX gates apply
          val start = rnd.nextLong(math.max(nextId - 10, 1L))
          val n = 1 + rnd.nextInt(10)
          val v = freshView(start, n, withOp = false)
          spark.sql(
            s"""UPDATE $qname t SET amount = amount + 1 WHERE EXISTS (
               |  SELECT 1 FROM $v s
               |  WHERE s.order_id = t.order_id
               |    AND s.amount >= t.amount - 1000000)""".stripMargin)
        case 12 => // residual-ON MERGE: key equality routes, the residual
          // (source-side modulo) narrows matches; no INSERT action so the
          // id-liveness model stays a set
          val start = rnd.nextLong(math.max(nextId - 10, 1L))
          val n = 1 + rnd.nextInt(10)
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          val v = freshView(start, n, withOp = true)
          spark.sql(
            s"""MERGE INTO $qname t USING $v s
               |ON t.order_id = s.order_id AND s.order_id % $m = $r
               |WHEN MATCHED AND s.op = 'D' THEN DELETE
               |WHEN MATCHED THEN UPDATE SET *
               |""".stripMargin)
          live.filterInPlace(i =>
            !(i >= start && i < start + n && i % m == r && i % 3 == 0))
        case 0 | 1 => insertRows()
        case 11 => // MERGE NMBS: full-snapshot reconcile — target rows the
          // source window does NOT cover drop when order_id % 4 == 0
          val start = rnd.nextLong(math.max(nextId - 10, 1L))
          val n = 1 + rnd.nextInt(10)
          val v = freshView(start, n, withOp = false)
          spark.sql(
            s"""MERGE INTO $qname t USING $v s ON t.order_id = s.order_id
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *
               |WHEN NOT MATCHED BY SOURCE AND t.order_id % 4 = 0 THEN DELETE
               |""".stripMargin)
          (start until start + n).foreach(live += _)
          live.filterInPlace(i => (i >= start && i < start + n) || i % 4 != 0)
        case 10 => // adopt an external parquet batch in place (add_files)
          if (partitionDdl.nonEmpty) insertRows() // identity-only op
          else {
            val dir = java.nio.file.Files
              .createTempDirectory("sqlfz-adopt").toString
            withExtras(Bundles.ordersUnpartitioned()
              .frame(spark, nextId, 20, None, Scenarios.OrdersSchema))
              .coalesce(1).write.mode("overwrite").parquet(dir)
            spark.sql(s"CALL graft.system.add_files(" +
              s"table => 'fz.$tableName', source_dir => '$dir')")
            (nextId until nextId + 20).foreach(live += _)
            nextId += 20
          }
        case 2 => // modulo DELETE → positional tombstones
          val m = 2 + rnd.nextInt(9); val r = rnd.nextInt(m)
          spark.sql(s"DELETE FROM $qname WHERE order_id % $m = $r")
          live.filterInPlace(_ % m != r)
        case 3 => // band DELETE → the metadata tier (deleteWhere routing)
          val a = rnd.nextLong(math.max(nextId, 1L)); val b = a + rnd.nextInt(40)
          spark.sql(s"DELETE FROM $qname WHERE order_id >= $a AND order_id <= $b")
          live.filterInPlace(i => i < a || i > b)
        case 4 => // conditional MERGE over an id window (op-9 model)
          val start = rnd.nextLong(math.max(nextId - 10, 1L))
          val n = 1 + rnd.nextInt(10)
          val v = freshView(start, n, withOp = true)
          spark.sql(
            s"""MERGE INTO $qname t USING $v s ON t.order_id = s.order_id
               |WHEN MATCHED AND s.op = 'D' THEN DELETE
               |WHEN MATCHED AND s.order_id % 5 <> 0 THEN UPDATE SET *
               |WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *
               |""".stripMargin)
          (start until start + n).foreach { i =>
            if (live(i)) { if (i % 3 == 0) live -= i }
            else if (i % 3 != 0) live += i
          }
        case 5 => // UPDATE: id-liveness no-op, one delete+append snapshot
          val m = 2 + rnd.nextInt(9)
          spark.sql(s"UPDATE $qname SET amount = amount + 1 " +
            s"WHERE order_id % $m = 0")
        case 6 =>
          spark.sql(s"CALL graft.system.compact(table => 'fz.$tableName')")
        case 7 => // expiry trims time travel, rebases — no new snapshot
          val keep = 1 + rnd.nextInt(3)
          spark.sql(s"CALL graft.system.expire_snapshots(" +
            s"table => 'fz.$tableName', keep_last => $keep)")
          // retained = rebased baseline (id = snapId - keep floor) + tail
          history = history.filter(_._1 >= snapId - keep)
          commits = 0
        case 8 => // INSERT OVERWRITE: truncate + append in ONE snapshot
          val v = freshView(nextId, 20, withOp = false)
          spark.sql(s"INSERT OVERWRITE $qname SELECT * FROM $v")
          live.clear()
          (nextId until nextId + 20).foreach(live += _)
          nextId += 20
        case 9 => // ALTER: add a defaulted column (or drop the newest)
          if (extraCols.nonEmpty && rnd.nextBoolean()) {
            val (c, _) = extraCols.last
            spark.sql(s"ALTER TABLE $qname DROP COLUMN $c")
            extraCols = extraCols.init
          } else {
            val c = s"fz_c$step"; val dv = rnd.nextInt(100)
            spark.sql(s"ALTER TABLE $qname ADD COLUMN $c INT DEFAULT $dv")
            extraCols :+= (c -> dv)
          }
      }
      snapId += commits
      if (commits > 0) history :+= (snapId, live.toSet)
      val got = spark.sql(s"SELECT order_id FROM $qname")
        .collect().map(_.getInt(0).toLong).toSet
      assert(got == live.toSet,
        s"seed=$seed step=$step: engine=${got.size} model=${live.size}; " +
          s"missing=${(live.toSet -- got).take(5)} extra=${(got -- live).take(5)}")
      // SQL COUNT(*) must agree whichever path it takes (manifest
      // LocalRelation fold or exact scan)
      val n = spark.sql(s"SELECT COUNT(*) AS n FROM $qname")
        .collect()(0).getLong(0)
      assert(n == live.size, s"seed=$seed step=$step: COUNT(*)=$n model=${live.size}")
      // SQL MIN/MAX must agree whichever path they take (manifest envelope
      // fold or exact scan) — the aggregate-pushdown twin of the COUNT gate
      val mm = spark.sql(s"SELECT MIN(order_id) AS mn, MAX(order_id) AS mx " +
        s"FROM $qname").collect()(0)
      if (live.isEmpty) assert(mm.isNullAt(0) && mm.isNullAt(1),
        s"seed=$seed step=$step: MIN/MAX of empty table must be NULL")
      else assert(mm.getInt(0).toLong == live.min && mm.getInt(1).toLong == live.max,
        s"seed=$seed step=$step: MIN/MAX=(${mm.get(0)},${mm.get(1)}) " +
          s"model=(${live.min},${live.max})")
      // defaulted columns read their default everywhere (pre-add rows
      // included) — a per-column aggregate catches projection misses
      extraCols.foreach { case (c, dv) =>
        val bad = spark.sql(
          s"SELECT COUNT(*) AS n FROM $qname WHERE $c IS NULL OR $c <> $dv")
          .collect()(0).getLong(0)
        assert(bad == 0L, s"seed=$seed step=$step: column $c default $dv violated")
      }
    }

    // SQL time travel replays every retained model state
    for ((sid, ids) <- history) {
      val got = spark.sql(
        s"SELECT order_id FROM $qname VERSION AS OF $sid")
        .collect().map(_.getInt(0).toLong).toSet
      assert(got == ids, s"seed=$seed: VERSION AS OF $sid diverged")
    }
    spark.sql(s"DROP TABLE $qname")
  }

  test("random SQL op sequences match the id-level model (unpartitioned)") {
    for (seed <- seeds) runFuzz(seed, s"sqlfz_$seed", "")
  }

  test("random SQL op sequences match the model over hidden bucket(4) partitioning") {
    for (seed <- seeds)
      runFuzz(seed, s"sqlfzb_$seed", " PARTITIONED BY (bucket(4, order_id))")
  }
}
