package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Engine-replayable distinct-count sketches. Spark's own
 * `approx_count_distinct` (q09) is correct but its HLL++ register
 * layout is engine-internal — a byte-hash oracle cannot replay it,
 * so q09 is a rows-only gate pin. [[hllExact]] is the FULL-oracle
 * twin (the q72→qE0 move crossed onto sketches): a classic
 * HyperLogLog (Flajolet et al. 2007) whose every decision is
 * deterministic and SQL-expressible — md5-driven register draws
 * (the [[Sampling.rankKey]] convention: any engine replays the
 * sketch from (value, salt) alone), integer register maxima, an
 * EXACT-long harmonic numerator, and one IEEE division at the end —
 * so DuckDB rebuilds the identical sketch from the same parquet.
 *
 * Draw contract, per non-null value v (duplicates hash identically —
 * that is the point of a distinct sketch):
 *   hex = md5(cast(v as string) || ' ' || salt)
 *   j   = first p/4 hex chars as an integer — the register index
 *         (p ∈ {4, 8, 12, 16} keeps the index hex-char-aligned: a
 *         non-power-of-16 slice would need bit surgery both engines
 *         must mirror; 2^p registers, se ≈ 1.04/√(2^p))
 *   w   = next 10 hex chars — the 40-bit rank draw
 *   ρ   = position of w's highest set bit from the TOP of the 40-bit
 *         window, 1-based: 41 − bitlength(w); w = 0 ⇒ ρ = 41.
 *         Computed STRING-WISE (strip leading '0' hex chars, then a
 *         4-way CASE on the first surviving char) because bitlength
 *         itself has no engine-portable exact form — this one is
 *         pure string algebra, identical everywhere.
 *
 * Estimate contract: register maxima M_j are exact ints; the
 * harmonic sum Σ 2^(−M_j) is scaled by 2⁴¹ into the EXACT long
 * S41 = Σ_hit 2^(41−M_j) + V·2⁴¹ (V = empty registers; max m·2⁴¹ =
 * 2⁵⁷ at p = 16 — long-safe); E_raw = α_m·m²·2⁴¹ / S41 is ONE
 * correctly-rounded IEEE division of a driver literal by an exact
 * long. Small-range correction (E_raw ≤ 2.5m AND V > 0) uses linear
 * counting m·ln(m/V) with the ln QUANTIZED to the 1e-9 grid (the
 * qDP/qEA libm convention) so the branch value is grid-stable; no
 * large-range correction — that corrects 32-bit hash collisions and
 * the 40-bit rank window makes it irrelevant below ~10¹⁰ distinct.
 *
 * Scale shape: one scan → codegen'd string kernel (md5 + slicing) →
 * partial/final hash aggregate to ≤ m rows per group per partition
 * (the shuffle carries REGISTERS, never values) → a second m-bounded
 * aggregate to one row per group. Registers max-merge, so the sketch
 * is embarrassingly mergeable — the property the streaming twin
 * ([[graft.streaming.StreamingHll]]) inherits: max is idempotent and
 * commutative, so even at-least-once redelivery cannot skew it.
 */
object Sketches {

  /** α_m · m² · 2⁴¹ as ONE driver double literal (standard HLL bias
    * constants; the m ≥ 128 closed form above 64). Embedded verbatim
    * in both plans — shortest-roundtrip decimal parses back to the
    * identical double in any engine. */
  private[graft] def alphaM2(m: Int): Double = {
    val alpha =
      if (m == 16) 0.673
      else if (m == 32) 0.697
      else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    alpha * m.toDouble * m.toDouble * 2199023255552.0 // 2^41
  }

  /** (register index, rho) columns for one value — the shared draw
    * kernel (batch and streaming twin build from the SAME columns). */
  private[graft] def registerCols(value: Column, p: Int,
                                  salt: String): (Column, Column) = {
    val hx = Sampling.rankKey(Seq(value), salt)
    val j = conv(substring(hx, 1, p / 4), 16, 10).cast("long")
    val st = ltrim(substring(hx, p / 4 + 1, 10), "0")
    val v1 = conv(substring(st, 1, 1), 16, 10).cast("int")
    val czeros = when(v1 >= 8, lit(0)).when(v1 >= 4, lit(1))
      .when(v1 >= 2, lit(2)).otherwise(lit(3))
    val rho = when(length(st) === 0, lit(41))
      .otherwise(lit(4) * (lit(10) - length(st)) + czeros + lit(1))
    (j, rho.cast("int"))
  }

  /** The estimate columns over (n_hit, __sp) — shared by the batch
    * aggregate and the streaming twin's post-state select so both
    * run the IDENTICAL float dag (one division each, GateRounded). */
  private[graft] def estimateCols(m: Int): Seq[Column] = {
    val vEmpty = lit(m.toLong) - col("n_hit")
    val s41 = col("__sp") + vEmpty * lit(2199023255552L)
    val estRaw = lit(alphaM2(m)) / s41.cast("double")
    val qln = floor(log(lit(m.toDouble) / vEmpty.cast("double")) *
      lit(1e9) + lit(0.5)).cast("long")
    val lc = (lit(m.toLong) * qln).cast("double") / lit(1e9)
    val small = estRaw <= lit(2.5 * m) && vEmpty > 0
    Seq(lit(m.toLong).as("m_registers"), col("n_hit"),
      vEmpty.as("v_empty"), s41.as("s41"),
      graft.functions.GateRound(estRaw, 6).as("est_raw"),
      graft.functions.GateRound(when(small, lc).otherwise(estRaw), 6)
        .as("estimate"),
      small.as("small_range"))
  }

  /**
   * Per-group HyperLogLog distinct estimate with a FULL hash-oracle
   * contract (see object doc). Null groups and null values are
   * dropped (COUNT DISTINCT semantics).
   *
   * @param p register index bits — 2^p registers; must be in
   *          {4, 8, 12, 16} (hex-char-aligned slices)
   * @return one row per group: (byCol, m_registers, n_hit, v_empty,
   *         s41 — the exact harmonic numerator, est_raw, estimate —
   *         GateRounded 6, small_range)
   */
  def hllExact(df: DataFrame, byCol: String, valueCol: String,
               p: Int = 12, salt: String = "s0"): DataFrame = {
    require(Set(4, 8, 12, 16).contains(p),
      s"p must be one of 4, 8, 12, 16 (hex-char-aligned registers), got $p")
    val m = 1 << p
    val (j, rho) = registerCols(col("__v"), p, salt)
    df.filter(col(byCol).isNotNull && col(valueCol).isNotNull)
      .select(col(byCol).as("__g"), col(valueCol).as("__v"))
      .select(col("__g"), j.as("__j"), rho.as("__rho"))
      .groupBy(col("__g"), col("__j"))
      .agg(max(col("__rho")).as("__mj"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_hit"),
        sum(expr("shiftleft(1L, 41 - __mj)")).as("__sp"))
      .select(col("__g").as(byCol) +: estimateCols(m): _*)
  }
}
