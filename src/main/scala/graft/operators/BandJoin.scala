package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Band (interval-proximity) join: pair rows whose numeric keys differ
 * by at most `tol`, without the O(|L|·|R|) nested-loop plan Spark
 * falls back to for a bare `abs(a − b) <= tol` theta join.
 *
 * Shape: the right side lands in bucket ⌊k/tol⌋; each left row
 * explodes to its bucket and both neighbours (any pair within `tol`
 * must meet in one of the three — for ⌊lk/tol⌋ = b and |rk−lk| ≤ tol,
 * (b−1)·tol ≤ rk < (b+2)·tol), and the exact predicate re-checks on
 * the bucket-equi-join's output. Cost: 3× one side's rows shuffled by
 * bucket + per-bucket-pair comparisons — the classic band-join
 * decomposition Spark's optimizer does not perform itself (a range
 * theta join plans as BroadcastNestedLoopJoin).
 *
 * Keys must be integral (epoch-ns timestamps are the intended use).
 * Column names of `left` and `right` must be disjoint.
 */
object BandJoin {

  def bandJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String, tol: Long,
               extraCondition: Column = lit(true)): DataFrame = {
    require(tol > 0, "tolerance must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint")
    // INTEGER division for the bucket: `/` on longs is double division,
    // and epoch-ns keys (~1.7e18) exceed 2^53 — they round to multiples
    // of 256 before dividing, which can put an in-tolerance pair more
    // than one bucket apart and silently drop it
    def bucket(k: String): Column = expr(s"`$k` div $tol")
    val l = left
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L)))) // neighbours
      .withColumn("__band", col("__off") + bucket(leftKey))
      .drop("__off")
    val r = right.withColumn("__band", bucket(rightKey))
    l.join(r, l("__band") === r("__band") &&
        abs(col(leftKey) - col(rightKey)) <= tol && extraCondition)
      .drop("__band")
  }
}
