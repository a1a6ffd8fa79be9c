package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.gen.Bundles
import graft.read.MorReader
import graft.scenarios.Scenarios
import graft.table.GraftTableGenerator

/** Model-based fuzz over random op sequences (fixed seeds — fully
  * deterministic): the engine's live row set after EVERY commit must match
  * an id-level reference model of the MoR semantics, and time travel must
  * replay each retained model state. This guards the interactions no
  * hand-written scenario covers — delete waves over upserted keys,
  * compaction between delete generations, expiry mid-history, sorted and
  * z-order rewrites interleaved with everything.
  *
  * Model rules (the reference semantics at id granularity — order_id == the
  * generator's monotonic row id):
  *   - append: new ids become live (fresh ids are never reused by append).
  *   - equality/positional delete: currently-live ids matching the
  *     predicate die. (Strict-seq re-insert survival is exercised because
  *     upserts re-add previously-deleted ids at HIGHER sequence numbers.)
  *   - upsert over an id window: every id in the window is live after.
  *   - conditional merge over an id window (delete ids ≡ 0 mod 3, update
  *     the rest when ≢ 0 mod 5, insert unmatched non-deletes): matched
  *     multiples of 3 die, unmatched non-multiples of 3 become live,
  *     everything else keeps its liveness.
  *   - compact / compactSorted / compactZOrder / compactPositionDeletes /
  *     expireSnapshots: live set unchanged (pure layout/metadata
  *     maintenance).
  */
class FuzzModelSpec extends SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft-fuzz-wh").toString

  /** Default 3 seeds keep the suite fast; heavier sweeps run via
    * `SPARK_GRAFT_FUZZ_SEEDS=100,101,...` (used for one-off deep soaks). */
  private val seeds: Seq[Long] = sys.env.get("SPARK_GRAFT_FUZZ_SEEDS")
    .map(_.split(",").toSeq.map(_.trim.toLong))
    .getOrElse(Seq(1L, 7L, 42L))
  private val steps: Int =
    sys.env.get("SPARK_GRAFT_FUZZ_STEPS").map(_.toInt).getOrElse(18)

  /** One fuzz run; `spec` selects the partition layout (hidden transforms
    * included) and `appendViaData` routes appends through `appendData`
    * (required for transformed specs — the reference `append` path takes
    * literal partition values). */
  private def runFuzz(seed: Long, tableName: String, spec: Seq[String],
                      appendViaData: Boolean): Unit = {
      val rnd = new scala.util.Random(seed)
      val g = new GraftTableGenerator(spark, wh, tableName)
      g.create(Scenarios.OrdersSchema, spec)
      var nextId = 0L
      val live = scala.collection.mutable.Set.empty[Long]
      var snapId = 0L
      var history = Vector.empty[(Long, Set[Long])]
      // columns added by mid-sequence schema evolution (name -> default);
      // generated frames must carry them, and evolved tables must append
      // through appendData (the reference append path conforms strictly)
      var extraCols = Vector.empty[(String, Int)]

      def withExtras(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        extraCols.foldLeft(df) { case (d, (c, v)) => d.withColumn(c, lit(v)) }

      def appendFile(target: scala.collection.mutable.Set[Long] = live): Unit = {
        if (appendViaData || extraCols.nonEmpty)
          g.appendData(withExtras(Bundles.ordersUnpartitioned()
            .frame(spark, nextId, 20, None, Scenarios.OrdersSchema)))
        else g.append(Bundles.ordersUnpartitioned(), 1, 20)
        (nextId until nextId + 20).foreach(target += _)
        nextId += 20
      }

      appendFile(); g.commit(); snapId += 1
      history :+= (snapId, live.toSet)

      val debug = sys.env.contains("SPARK_GRAFT_FUZZ_DEBUG")
      for (step <- 1 to steps) {
        var committed = true
        val op = rnd.nextInt(13)
        if (debug) println(s"FUZZDBG step=$step op=$op")
        op match {
          case 11 => // branch cycle: fork, 1-3 branch ops, FF or drop.
            // Branch commits must stay invisible to main throughout; a
            // fast-forward publishes the branch model as the main model, a
            // drop discards it (ids stay consumed — claimIds advanced).
            val bname = s"br$step"
            g.createBranch(bname); g.writeTo(bname)
            val braLive = live.clone()
            for (bi <- 1 to 1 + rnd.nextInt(3)) {
              val bop = rnd.nextInt(3)
              if (debug) println(s"FUZZDBG step=$step branch op#$bi bop=$bop")
              bop match {
                case 0 => appendFile(braLive); g.commit()
                case 1 =>
                  val m = 2 + rnd.nextInt(9); val r = rnd.nextInt(m)
                  g.equalityDelete(col("order_id") % m === r,
                    Seq("order_id")).commit()
                  braLive.filterInPlace(_ % m != r)
                case 2 =>
                  val a = rnd.nextLong(math.max(nextId, 1L))
                  val b = a + 1 + rnd.nextInt(40)
                  g.positionalDelete(col("order_id") >= a &&
                    col("order_id") < b).commit()
                  braLive.filterInPlace(i => i < a || i >= b)
              }
              // main untouched mid-branch; the branch tracks its model
              val mainGot = MorReader.read(spark, g.tableDir.toString)
                .select("order_id").collect().map(_.getInt(0).toLong).toSet
              assert(mainGot == live.toSet,
                s"seed=$seed step=$step: branch write leaked into main")
              val braGot = g.read
                .select("order_id").collect().map(_.getInt(0).toLong).toSet
              assert(braGot == braLive.toSet,
                s"seed=$seed step=$step: branch lineage diverged from model")
            }
            g.writeTo("main")
            if (rnd.nextBoolean()) {
              g.fastForward(bname)
              live.clear(); live ++= braLive
            } else g.dropBranch(bname)
            // resync to the log's id line (FF adopted branch ids; drop
            // freed them for reuse) and re-anchor time-travel history at
            // the published head only
            snapId = graft.meta.SnapshotLog(g.tableDir.toString).lastSnapshotId
            history = history.filter(_._1 <= snapId) :+ (snapId, live.toSet)
            committed = false
          case 0 | 1 => appendFile(); g.commit()
          case 2 => // equality-delete a modulo class
            val m = 2 + rnd.nextInt(9); val r = rnd.nextInt(m)
            g.equalityDelete(col("order_id") % m === r, Seq("order_id")).commit()
            live.filterInPlace(_ % m != r)
          case 3 => // delete an inclusive id band [a, b] — randomly as a
            // classic tombstone file, a NATIVE merged deletion vector, or
            // the metadata-accelerated deleteWhere (file drops + overlap
            // tombstones). Model identical for all three.
            val a = rnd.nextLong(math.max(nextId, 1L)); val b = a + rnd.nextInt(40)
            rnd.nextInt(3) match {
              case 0 =>
                g.positionalDelete(col("order_id") >= a &&
                  col("order_id") <= b).commit()
              case 1 =>
                g.vectorDeletes(true)
                  .positionalDelete(col("order_id") >= a &&
                    col("order_id") <= b).commit()
                g.vectorDeletes(false)
              case 2 => g.deleteWhere("order_id", a, b).commit()
            }
            live.filterInPlace(i => i < a || i > b)
          case 4 => // upsert an existing-id window (re-adds deleted ids)
            val start = rnd.nextLong(math.max(nextId - 10, 1L))
            val n = 1 + rnd.nextInt(10)
            val incoming = withExtras(Bundles.ordersUnpartitioned()
              .frame(spark, start, n, None, Scenarios.OrdersSchema))
            g.upsert(incoming, Seq("order_id")).commit()
            (start until start + n).foreach(live += _)
          case 5 => g.compact().commit()
          case 6 => g.compactSorted("order_id", 64).commit()
          case 7 => g.compactZOrder(Seq("order_id", "source_id"), 64).commit()
          case 9 => // conditional merge over an id window
            val start = rnd.nextLong(math.max(nextId - 10, 1L))
            val n = 1 + rnd.nextInt(10)
            val src = withExtras(Bundles.ordersUnpartitioned()
              .frame(spark, start, n, None, Scenarios.OrdersSchema))
              .withColumn("op",
                when(col("order_id") % 3 === 0, lit("D")).otherwise(lit("U")))
            g.mergeInto(src, Seq("order_id"),
              updateWhen = col("order_id") % 5 =!= 0,
              deleteWhen = col("op") === "D",
              insertWhen = col("op") =!= "D").commit()
            (start until start + n).foreach { i =>
              if (live(i)) { if (i % 3 == 0) live -= i }
              else if (i % 3 != 0) live += i
            }
          case 10 => // all three delete-file rewrites are model no-ops
            rnd.nextInt(3) match {
              case 0 => g.compactPositionDeletes().commit()
              case 1 => g.rewritePositionDeletesToDVs().commit()
              case 2 => g.rewriteEqualityDeletes().commit()
            }
          case 12 => // schema evolution mid-sequence: add a DEFAULTED
            // column (pure metadata — every pre-add row reads the
            // default), sometimes dropping the newest one instead. The id
            // model is untouched; what this stresses is the epoch
            // projection interleaved with every other op.
            if (extraCols.nonEmpty && rnd.nextBoolean()) {
              val (c, _) = extraCols.last
              g.updateSchema(Nil, Seq(c))
              extraCols = extraCols.init
            } else {
              val c = s"fz_c$step"; val v = rnd.nextInt(100)
              g.addColumn(c, org.apache.spark.sql.types.IntegerType,
                Some(v.toString))
              extraCols :+= (c -> v)
            }
            g.commit() // metadata-only snapshot stamps the new schemaV
          case 8 => // expiry: no commit, drops time travel past the horizon
            val keep = 1 + rnd.nextInt(3)
            g.expireSnapshots(keep)
            history = history.filter(_._1 >= snapId - keep)
            committed = false
        }
        if (committed) { snapId += 1; history :+= (snapId, live.toSet) }
        val got = g.read.select("order_id").collect().map(_.getInt(0).toLong).toSet
        assert(got == live.toSet,
          s"seed=$seed step=$step snap=$snapId: engine=${got.size} model=${live.size}; " +
            s"missing=${(live.toSet -- got).take(5)} extra=${(got -- live).take(5)}")
        // the metadata-count/min-max paths must agree with the model after
        // EVERY commit, whichever path (manifest fold or scan) they take
        val (fc, _) = MorReader.fastCount(spark, g.tableDir.toString)
        assert(fc == live.size,
          s"seed=$seed step=$step: fastCount=$fc model=${live.size}")
        val (mm, _) = MorReader.fastMinMax(spark, g.tableDir.toString, "order_id")
        val want = if (live.isEmpty) None
          else Some((live.min.toString, live.max.toString))
        assert(mm == want, s"seed=$seed step=$step: fastMinMax=$mm want=$want")
        // row lineage: every live row carries an id (all fuzz writers
        // assign) and ids stay unique through every op interleaving —
        // compaction materialization, upsert retirement, DV folds
        val rids = MorReader.readLineage(spark, g.tableDir.toString)
          .select("_row_id").collect()
          .map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
        assert(!rids.contains(-1L), s"seed=$seed step=$step: null row id")
        assert(rids.distinct.length == rids.length,
          s"seed=$seed step=$step: duplicate row ids")
      }

      // time travel replays every retained model state
      for ((sid, ids) <- history) {
        val got = MorReader.readAt(spark, g.tableDir.toString, sid)
          .select("order_id").collect().map(_.getInt(0).toLong).toSet
        assert(got == ids, s"seed=$seed time travel to snap $sid diverged")
      }
  }

  test("random op sequences match the id-level model; time travel replays history") {
    for (seed <- seeds) runFuzz(seed, s"fuzz_$seed", Nil, appendViaData = false)
  }

  test("bucketed-spec fuzz: the same op model over hidden bucket(4) partitioning") {
    for (seed <- seeds)
      runFuzz(seed, s"fuzzb_$seed", Seq("bucket(4,order_id)"), appendViaData = true)
  }

  test("multi-spec fuzz: the same op model over a source_id × bucket(2) tuple layout") {
    for (seed <- seeds)
      runFuzz(seed, s"fuzzm_$seed",
        Seq("source_id", "bucket(2,order_id)"), appendViaData = true)
  }
}
