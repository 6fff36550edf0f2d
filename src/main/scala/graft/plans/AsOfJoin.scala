package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native as-of join (SURVEY.md §2.3 `join_asof`) as a first-class
  * operator: logical node → planner strategy → physical sort-merge
  * execution, registered through GraftExtensions (the tier-(c) custom
  * path the guide reserves for whole-operator semantics Spark lacks).
  *
  * Semantics: for every left row, attach the LAST right row with the
  * same key whose time ≤ the left row's time, breaking right-side time
  * ties by the `rightTie` expression (ascending — the largest wins);
  * left rows with no match get nulls (left-outer as-of).
  *
  * Scale shape: EnsureRequirements co-partitions both sides on the key
  * (one hash shuffle each) and sorts within partitions; the merge
  * itself is a single streaming pass per partition holding ONE buffered
  * right row — no per-key state buildup, no window materialization.
  * The window-idiom twin (`join_asof`) materializes every (left ×
  * candidate-right) pair before row_number() discards all but one;
  * this operator never widens past the output.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // Co-partition on the key; sort (key, time[, tie]) — EnsureRequirements
  // inserts the exchanges/sorts exactly like SortMergeJoin's.
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  /** Primitive accessor pair (isNull, getLong): direct ordinal access
    * when the bound expression is a plain column reference (the common
    * case — avoids a Long box per row per expression), generic eval
    * otherwise. Null handling is explicit: SQL join semantics say a null
    * key or time never matches, so callers must consult the isNull side
    * before reading the long (getLong on a null slot would silently
    * read 0 and match key-0 rows). */
  private def longAccess(e: Expression, schema: Seq[Attribute])
      : (InternalRow => Boolean, InternalRow => Long) =
    BindReferences.bindReference(e, schema) match {
      case b: org.apache.spark.sql.catalyst.expressions.BoundReference
          if b.dataType == org.apache.spark.sql.types.LongType =>
        // dataType guard: getLong on a non-long slot would read garbage
        // silently; anything else takes the eval path and fails loudly
        (row => row.isNullAt(b.ordinal), row => row.getLong(b.ordinal))
      case bound =>
        (row => bound.eval(row) == null,
          row => bound.eval(row).asInstanceOf[Long])
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val (lkNull, lk) = longAccess(leftKey, left.output)
    val (ltNull, lt) = longAccess(leftTime, left.output)
    val (rkNull, rk) = longAccess(rightKey, right.output)
    val (rtNull, rt) = longAccess(rightTime, right.output)
    val nRight = right.output.size
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val toUnsafe = UnsafeProjection.create(allOut, allOut)
      val rBuf = rIter.buffered
      // the single piece of merge state: latest right row (copied) whose
      // (key, time) the scan has passed, plus its key/time
      var cand: InternalRow = null
      var candKey = 0L
      lIter.map { lRow =>
        if (lkNull(lRow) || ltNull(lRow)) {
          // null key/time never matches (nulls sort first, so the right
          // cursor has not advanced yet — nothing to rewind)
          toUnsafe(joined(lRow, nullRight))
        } else {
          val k = lk(lRow)
          val t = lt(lRow)
          // advance the right side to the last row with key==k, time<=t,
          // dropping right rows whose key/time is null (never candidates)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            if (rkNull(head) || rtNull(head)) { rBuf.next(); () }
            else {
              val hk = rk(head)
              if (hk < k || (hk == k && rt(head) <= t)) {
                cand = rBuf.next().copy()
                candKey = hk
              } else advancing = false
            }
          }
          val matched = cand != null && candKey == k
          toUnsafe(joined(lRow, if (matched) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry: `AsOf.join(purchases, clicks, ...)` → DataFrame. Key
  * and time expressions must evaluate to LONG on both sides (cast in
  * the caller); tie breaks equal right-side times deterministically. */
object AsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column, rightTie: Column): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val spark = leftDf.sparkSession
    // defensive runtime injection so the operator also works on sessions
    // built without GraftExtensions (e.g. a harness-owned session)
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    GraftSqlBridge.ofRows(spark,
      AsOfJoin(leftDf.queryExecution.analyzed, rightDf.queryExecution.analyzed,
        GraftSqlBridge.expr(leftKey), GraftSqlBridge.expr(rightKey),
        GraftSqlBridge.expr(leftTime), GraftSqlBridge.expr(rightTime),
        GraftSqlBridge.expr(rightTie)))
  }
}
