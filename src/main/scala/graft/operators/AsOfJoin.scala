package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Backward as-of join (time-series point-in-time lookup).
 *
 * The reference's engine surface includes DuckDB's `ASOF JOIN`
 * (SURVEY.md §2.2); Spark has no native as-of operator, so this
 * composes built-ins (preference (a) from the build rules): tag and
 * union both sides, then a single partitioned, ordered window scan
 * carries the latest right-side values forward onto left rows.
 *
 * Scale properties (the reason for this shape at 100 TB):
 *  - exactly ONE shuffle, by the equi-key — same as any join;
 *  - no row explosion: cost is O(|L|+|R|) after the sort, vs the
 *    O(|L|·|R|) blowup of the naive range-join-then-rank rewrite;
 *  - whole-stage-codegen window execution, spills if a key is huge;
 *  - skewed keys behave like any windowed aggregation (AQE-visible).
 */
object AsOfJoin {

  /**
   * For each left row, attach the latest right row with
   * `right(rightTime) <= left(leftTime)` (inclusive), matched on `keys`.
   * Right-side payload columns are prefixed with `prefix` in the output;
   * the matched right time is `prefix + rightTime`. Left rows with no
   * prior right row get nulls (LEFT OUTER as-of semantics).
   *
   * Time columns must be the same orderable numeric/timestamp type.
   */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val rtCol = prefix + rightTime
    val payloadOut = rightPayload.map(c => prefix + c)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as(rtCol)) ++
        rightPayload.map(c => col(c).as(prefix + c)): _*)
      .withColumn("__asof_side", lit(0))
    val l = left.withColumn("__asof_side", lit(1))
    val combined = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof_t", coalesce(col(leftTime), col(rtCol)))
    // right rows (side=0) sort before left rows at equal time → inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_t"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry ONE struct of (time, payload...) with a single
    // last(ignoreNulls): carrying each payload column independently
    // would substitute an OLDER row's non-null value when the latest
    // matching right row has a null payload field — DuckDB ASOF (and
    // AsOfJoinNative) return the latest row's values as-is, nulls
    // included. The struct is null for left rows (never a match source).
    val carryCols = rtCol +: payloadOut
    val carried = combined
      .withColumn("__asof_pack",
        when(col("__asof_side") === 0, struct(carryCols.map(col): _*)))
      .withColumn("__asof_pack",
        last(col("__asof_pack"), ignoreNulls = true).over(w))
    carryCols.foldLeft(carried) { (df, c) =>
        df.withColumn(c, col("__asof_pack").getField(c))
      }
      .filter(col("__asof_side") === 1)
      .drop("__asof_side", "__asof_t", "__asof_pack")
  }
}
