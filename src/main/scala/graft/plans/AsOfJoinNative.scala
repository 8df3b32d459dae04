package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/**
 * Native as-of join: custom LogicalPlan + Strategy + SparkPlan — the
 * preference-(c) path from the build rules, for the one time-series
 * operator Spark lacks outright (DuckDB: `ASOF JOIN`; SURVEY.md §2.2).
 *
 * Physical algorithm: both sides hash-clustered on the equi-keys and
 * sorted by (keys, time); one streaming merge pass per partition holds
 * exactly ONE buffered right row (the latest with rTime <= lTime) —
 * O(|L|+|R|) time, O(1) state beyond the iterators.
 *
 * Compared with the composition route (`operators.AsOfJoin`: union +
 * window last()): same single shuffle, but no union blow-up of the row
 * stream, no window buffer, and the merge inner loop is a tight
 * comparator on projected keys. At 100 TB the constant factor is the
 * story — this is the plan a native engine would run.
 */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Attribute, rightTime: Attribute,
                        rightPayload: Seq[Attribute],
                        payloadOut: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  // payloadOut attrs are minted by this operator, not pulled from children
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan) =
    copy(left = l, right = r)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                        leftTime: Attribute, rightTime: Attribute,
                        rightPayload: Seq[Attribute],
                        payloadOut: Seq[Attribute]) extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expression seqs; code-generated
    // projections must be instantiated per-task, inside the closure
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val payloadB = rightPayload
    val outB = output
    val payloadOutB = payloadOut
    val keyTypes = leftKeys.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(lKeysB, lOut)
      val rKeyGen = UnsafeProjection.create(rKeysB, rOut)
      val lTimeOrd: Expression =
        BindReferences.bindReference(lTimeB: Expression, lOut)
      val rTimeOrd: Expression =
        BindReferences.bindReference(rTimeB: Expression, rOut)
      val payloadGen = UnsafeProjection.create(payloadB, rOut)
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(outB, lOut ++ payloadOutB)
      val numPayload = payloadOutB.size
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRow = new GenericInternalRow(numPayload)
        private var rHead: InternalRow = _ // next unconsumed right row
        private var rHeadKey: UnsafeRow = _
        private var bufferedPayload: InternalRow = _ // latest matching right
        private var bufferedKey: UnsafeRow = _
        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKeyGen(rHead).copy()
          } else { rHead = null; rHeadKey = null }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyGen(l)
          val lT = lTimeOrd.eval(l).asInstanceOf[Long]
          // consume right rows with key < lKey, or same key and time <= lT,
          // buffering the last same-key match
          var continue = rHead != null
          while (continue) {
            val cmp = keyOrdering.compare(rHeadKey, lKey)
            if (cmp < 0) { advanceRight(); continue = rHead != null }
            else if (cmp == 0 &&
                rTimeOrd.eval(rHead).asInstanceOf[Long] <= lT) {
              bufferedPayload = payloadGen(rHead).copy()
              bufferedKey = rHeadKey
              advanceRight(); continue = rHead != null
            } else continue = false
          }
          val payload =
            if (bufferedKey != null && keyOrdering.compare(bufferedKey, lKey) == 0)
              bufferedPayload
            else nullRow
          resultProj(joined(l, payload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan) =
    copy(left = l, right = r)
}

object AsOfStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rp, po) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rp, po) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {
  /** Ensure the strategy is registered on this session (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies = strategies :+ AsOfStrategy
  }

  /**
   * Backward as-of join with LEFT OUTER semantics (same contract as
   * operators.AsOfJoin.backward): for every left row, payload columns
   * of the latest right row with rightTime <= leftTime on the same
   * keys; nulls when none exists. Time columns must be LongType ns.
   */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side so its attributes carry FRESH exprIds:
    // when both sides derive from the same base relation (a self
    // as-of join), the analyzer's DeduplicateRelations re-aliases one
    // scan subtree, and expressions built post-analysis against the
    // old ids become ambiguous/unresolvable. Fresh aliases here make
    // the node unambiguous regardless of provenance.
    import org.apache.spark.sql.functions.col
    val rFresh = right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val rPlan = rFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val lt = attr(lPlan, leftTime)
    val rt = attr(rPlan, rightTime)
    require(lt.dataType == LongType && rt.dataType == LongType,
      "native as-of join requires LongType (epoch-ns) time columns")
    val payload = (rightTime +: rightPayload).map(attr(rPlan, _))
    val payloadOut = payload.map(a =>
      AttributeReference(prefix + a.name, a.dataType, nullable = true)())
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      lt, rt, payload, payloadOut)
    ColumnBridge.ofRows(spark, node)
  }
}
