package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/**
 * Gate-facing rounding with the negative zero normalized away — the
 * SIGN axis of the suite's float contract (SCALE.md).
 *
 * Why it exists: the driver's correctness gate hashes result BYTES.
 * `-0.0` and `+0.0` compare equal under every numeric check (`==`,
 * epsilon, `rows_match`) but differ in the IEEE sign bit, so they hash
 * differently. The two engines disagree exactly there: DuckDB's
 * `round()` preserves the sign bit of a tiny negative that rounds to
 * zero (`round(-1e-9, 4) = -0.0`) while Spark's BigDecimal-based
 * `round` cannot represent a signed zero and returns `+0.0`. One such
 * row (qBQ label=8/dim=47 at sf0.01) held the r14 gate red while 639
 * bit-identical rows passed.
 *
 * The convention, applied on BOTH sides of every hash-oracled rounded
 * float column that can go tiny-negative:
 *   - Spark:  `GateRound(c, s)`  =  `round(c, s) + 0.0`
 *   - oracle: `round(expr, s) + 0`
 * IEEE 754 defines `-0.0 + 0.0 = +0.0` (round-to-nearest), so both
 * engines land on the positive-zero bytes; every non-zero value is
 * unchanged (`x + 0.0 = x` exactly for all finite x, and NaN/null
 * propagate as before). The exactness of the underlying value is the
 * FIRST three contract shapes' job (fixed-point / single-partial /
 * margin-bound); this helper only fixes the sign of zero AFTER the
 * round, which none of the three shapes covers.
 *
 * Verified not optimized away: Catalyst has no `x + 0.0` elimination
 * rule for floating point (it would be unsound precisely because of
 * `-0.0`), and GateRoundSpec pins the behavior on a real column.
 */
object GateRound {
  /** For DOUBLE/FLOAT columns. A DecimalType input would silently
    * COERCE to double through the `+ 0.0` (and decimals have no
    * signed zero to normalize anyway) — keep money columns on the
    * long-cents/decimal contracts, not this helper. */
  def apply(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)

  /** For already-exact values that are emitted without rounding but
    * could still carry a computed `-0.0` (e.g. a product or sum of
    * signed terms) — same normalization, no round. */
  def normZero(c: Column): Column = c + lit(0.0)
}
