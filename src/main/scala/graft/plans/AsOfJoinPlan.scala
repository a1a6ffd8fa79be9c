package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** A whole-operator extension (SURVEY §4 tier (c): custom `LogicalPlan` +
  * `Strategy` + `SparkPlan`): the AS-OF JOIN Spark lacks natively.
  *
  * Semantics: for every left row, append the right row with the same key
  * and the LARGEST right time <= the left row's time (null-extended when
  * none exists) — the point-in-time lookup of market-data and event-
  * attribution systems. Exactly one output row per left row.
  *
  * Physical contract: both children cluster on their key and sort by
  * (key, time) — `EnsureRequirements` inserts the exchanges/sorts — then
  * each partition pair merges in ONE forward pass: the right cursor never
  * rewinds because left times are ascending within a key, so the match
  * for the next left row can only be at or after the current right
  * position. O(|L| + |R|) per partition, constant memory (one retained
  * row), no composed join+groupBy re-aggregation (the formulation
  * `join(<=) + groupBy + max` materializes every candidate pair first —
  * this operator never does).
  *
  * Scope (documented, enforced): one equi-key per side, times are long
  * micros (callers project `unix_micros` first), and the two sides must
  * expose disjoint output names (rename before joining — the builder API
  * checks).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node 1:1 onto its exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // one output row per left row, in the left child's partition order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "rows with an as-of match"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyOrdering =
      TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val lOut = left.output
    val rOut = right.output
    val rWidth = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference[Expression](leftKey, lOut)
      val lTime = BindReferences.bindReference[Expression](leftTime, lOut)
      val rKey = BindReferences.bindReference[Expression](rightKey, rOut)
      val rTime = BindReferences.bindReference[Expression](rightTime, rOut)
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rWidth)
      val resultProj = UnsafeProjection.create(output, output)
      // the single retained row: the best (= latest-so-far) right match
      // for the key currently under the cursor
      var matchKey: Any = null
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        if (k == null || t == null) {
          // null key/time never matches; emit null-extended
          numOutputRows += 1
          resultProj(joined(lRow, nullRight))
        } else {
          val tl = t.asInstanceOf[Long]
          // advance the right cursor over rows that can no longer matter:
          // keys before ours, or our key with time <= tl (each of those
          // becomes the new best match — later rows dominate earlier ones
          // because the right side is time-ascending within the key)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rKey.eval(rBuf.head)
            if (rk == null) { rBuf.next() } // null keys sort first; skip
            else {
              val cmp = keyOrdering.compare(rk.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef])
              if (cmp < 0) { rBuf.next() }
              else if (cmp == 0) {
                val rt = rTime.eval(rBuf.head)
                if (rt != null && rt.asInstanceOf[Long] <= tl) {
                  matchRow = rBuf.next().copy()
                  matchKey = rk
                } else if (rt == null) { rBuf.next() } // null time: unusable
                else advancing = false
              } else advancing = false
            }
          }
          numOutputRows += 1
          val hit = matchRow != null && matchKey != null &&
            keyOrdering.compare(matchKey.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef]) == 0
          if (hit) {
            numMatched += 1
            resultProj(joined(lRow, matchRow))
          } else {
            resultProj(joined(lRow, nullRight))
          }
        }
      }
    }
  }
}

/** Builder API + live-session strategy installer. */
object AsOfJoinApi {

  /** Idempotently add the planner strategy to a session built without the
    * extensions config (mirrors [[GraftExtensionsLive]]). */
  def ensureInstalled(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_ eq AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    }
  }

  /** `left ASOF JOIN right ON left.key = right.key AND right.time <=
    * left.time` picking the latest right row. Times must be long micros;
    * output names must be disjoint. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureInstalled(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"as-of times must be long micros, got ${lt.dataType}/${rt.dataType}")
    val dup = lPlan.output.map(_.name).toSet intersect rPlan.output.map(_.name).toSet
    require(dup.isEmpty, s"as-of join sides must expose disjoint names; both have $dup")
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      AsOfJoin(lPlan, rPlan, attr(lPlan, leftKey), attr(rPlan, rightKey), lt, rt))
  }
}
