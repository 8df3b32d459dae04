package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, sum, when}
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Negative-zero detector for gate-facing frames — the enforcement
  * half of the [[graft.functions.GateRound]] convention.
  *
  * The driver's gate hashes result BYTES, so a `-0.0` on either side
  * of the compare is a deterministic hash mismatch that every numeric
  * equality check waves through (the r14 qBQ forensic). Spark's
  * BigDecimal-based `round` can never emit one, but an UNROUNDED
  * float column (a passthrough, a raw product of signed terms) still
  * can — this scan is the loud detector for that class, run by
  * [[Verify]] over every query it dumps and pinned suite-wide at two
  * scale factors by GateRoundSpec. (The oracle side — DuckDB's
  * `round` preserving the sign bit — is swept by `tools/signzero.py`,
  * which replays every oracle SQL and applies the same test.)
  *
  * Detection is pure Spark arithmetic, one aggregate, no collect of
  * data rows: `x == 0.0 && cast(x as string) = '-0.0'` is true exactly
  * for `-0.0` (Java's Double.toString keeps the sign) and false for
  * +0.0, NaN, null, and every non-zero value — no UDF, stays inside
  * codegen. (The tempting `1/x < 0` IEEE probe throws DIVIDE_BY_ZERO
  * under ANSI mode, Spark 4's default.)
  */
object SignZero {
  /** Per-column count of negative zeros across all top-level
    * Float/Double columns; empty map if the frame has none such. */
  def negZeroCounts(df: DataFrame): Map[String, Long] = {
    val floatCols = df.schema.fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
    }
    if (floatCols.isEmpty) return Map.empty
    val aggs = floatCols.map { c =>
      val x = col(c).cast("double")
      sum(when(x === 0.0 && x.cast("string") === lit("-0.0"), 1L)
        .otherwise(0L)).as(c)
    }
    val row = df.select(aggs.toIndexedSeq: _*).head()
    floatCols.zipWithIndex.collect {
      case (c, i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
        c -> row.getLong(i)
    }.toMap
  }
}
