package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** The second whole-operator extension (SURVEY §4 tier (c), sibling of
  * [[AsOfJoin]]): a native POINT-IN-INTERVAL join.
  *
  * Semantics: INNER join of points `(key, t)` against intervals
  * `(key, start, end)` where `start <= t < end` — one output row per
  * matching (point, interval) pair. The event-to-window attribution /
  * IP-to-range / time-slice enrichment shape.
  *
  * Physical contract: both children cluster on their key; points sort by
  * (key, t), intervals by (key, start) — `EnsureRequirements` inserts the
  * exchanges and sorts. Each partition pair then runs ONE forward sweep:
  * as the point cursor advances in time order, intervals with
  * `start <= t` stream into an ACTIVE buffer and intervals whose
  * `end <= t` leave it permanently (future points only grow t within a
  * key). Per-partition cost is O(|P| + |I| + matches·activeScan) with
  * memory bounded by the maximum number of CONCURRENTLY OPEN intervals
  * per key — the quantity that is small by construction in real workloads
  * (a window catalog, a CIDR table), where the composed alternatives pay
  * either a nested loop (the raw theta-join plan) or a bucket-replicated
  * shuffle ([[graft.operators.Ops.bucketedRangeJoin]] — still the right
  * choice when intervals are unbounded-length or massively overlapping).
  *
  * Scope (documented, enforced by the builder): one equi-key per side,
  * times/bounds are long micros, disjoint output names.
  */
case class RangeJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    pointTime: Attribute, start: Attribute, end: Attribute)
    extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(l, r, lk, rk, pt, s, e) =>
      RangeJoinExec(planLater(l), planLater(r), lk, rk, pt, s, e) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    pointTime: Attribute, start: Attribute, end: Attribute)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(pointTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(start, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "maxActive" -> SQLMetrics.createMetric(sparkContext, "max concurrently open intervals"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val maxActive = longMetric("maxActive")
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (pIter, iIter) =>
      val pKey = BindReferences.bindReference[Expression](leftKey, lOut)
      val pTime = BindReferences.bindReference[Expression](pointTime, lOut)
      val iKey = BindReferences.bindReference[Expression](rightKey, rOut)
      val iStart = BindReferences.bindReference[Expression](start, rOut)
      val iEnd = BindReferences.bindReference[Expression](end, rOut)
      val iBuf = iIter.buffered
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)
      // open intervals of the key currently under the cursor: (end, row)
      val active = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]
      var activeKey: Any = null

      pIter.flatMap { pRow =>
        val k = pKey.eval(pRow)
        val t = pTime.eval(pRow)
        if (k == null || t == null) Iterator.empty
        else {
          val tl = t.asInstanceOf[Long]
          if (activeKey == null ||
              keyOrdering.compare(activeKey.asInstanceOf[AnyRef],
                k.asInstanceOf[AnyRef]) != 0) {
            active.clear(); activeKey = k
          }
          // ingest intervals whose start has been reached: keys before
          // ours are dead (their points have passed), our key's intervals
          // with start <= t open now, later starts wait
          var advancing = true
          while (advancing && iBuf.hasNext) {
            val ik = iKey.eval(iBuf.head)
            if (ik == null) { iBuf.next() }
            else {
              val cmp = keyOrdering.compare(ik.asInstanceOf[AnyRef],
                k.asInstanceOf[AnyRef])
              if (cmp < 0) { iBuf.next() }
              else if (cmp == 0) {
                val is = iStart.eval(iBuf.head)
                if (is == null) { iBuf.next() }
                else if (is.asInstanceOf[Long] <= tl) {
                  val row = iBuf.next().copy()
                  val ie = iEnd.eval(row)
                  // already-closed intervals (end <= t) never match a
                  // future point either — drop on ingest
                  if (ie != null && ie.asInstanceOf[Long] > tl)
                    active += ((ie.asInstanceOf[Long], row))
                } else advancing = false
              } else advancing = false
            }
          }
          // evict intervals this point has outlived (t only grows per key)
          var w = 0
          var r = 0
          while (r < active.length) {
            if (active(r)._1 > tl) { active(w) = active(r); w += 1 }
            r += 1
          }
          active.remove(w, active.length - w)
          if (active.length > maxActive.value) maxActive.set(active.length)
          numOutputRows += active.length
          // every remaining open interval matches (start<=t held at
          // ingest, end>t held by eviction). resultProj reuses ONE
          // UnsafeRow buffer — materializing more than one match per
          // point requires a copy per row (same discipline as the
          // buffered side of a sort-merge join)
          active.iterator.map { case (_, iRow) =>
            resultProj(joined(pRow, iRow)).copy()
          }.toArray.iterator
        }
      }
    }
  }
}

/** Builder API + live-session strategy installer (mirrors [[AsOfJoinApi]]). */
object RangeJoinApi {

  def ensureInstalled(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_ eq RangeJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ RangeJoinStrategy
    }
  }

  /** `points JOIN intervals ON points.key = intervals.key AND
    * start <= t < end`, inner. Times must be long micros; output names
    * must be disjoint. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointKey: String, intervalKey: String,
                pointTime: String, startCol: String, endCol: String): DataFrame = {
    val spark = points.sparkSession
    ensureInstalled(spark)
    val lPlan = points.queryExecution.analyzed
    val rPlan = intervals.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val (pt, st, en) =
      (attr(lPlan, pointTime), attr(rPlan, startCol), attr(rPlan, endCol))
    require(pt.dataType == LongType && st.dataType == LongType &&
      en.dataType == LongType,
      s"range-join bounds must be long micros, got " +
        s"${pt.dataType}/${st.dataType}/${en.dataType}")
    val dup = lPlan.output.map(_.name).toSet intersect rPlan.output.map(_.name).toSet
    require(dup.isEmpty, s"range-join sides must expose disjoint names; both have $dup")
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      RangeJoin(lPlan, rPlan, attr(lPlan, pointKey), attr(rPlan, intervalKey),
        pt, st, en))
  }
}
