package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming HyperLogLog distinct monitor —
 * [[graft.operators.Sketches.hllExact]] lifted onto Structured
 * Streaming: live per-group cardinality (vocabulary growth of an
 * ingest feed, unique users per cohort) with the batch sketch's
 * exact draw contract. Every micro-batch emits the group's current
 * estimate row.
 *
 * Why streamed ≡ batch holds BIT-FOR-BIT — and, uniquely among the
 * twins, holds under REPLAY with no late-row census: the state per
 * group is the register-maximum array (2^p bytes, ρ ≤ 41), and max
 * is idempotent and commutative, so row order, micro-batch
 * boundaries, and at-least-once redelivery all land on the same
 * registers; the estimate is then the batch operator's own
 * [[Sketches.estimateCols]] dag over (n_hit, S41) — the identical
 * one-division float path. No ordering contract is needed at all.
 *
 * Scale shape: the (j, ρ) draw runs in the stateless select (the
 * SHARED [[Sketches.drawFrame]] kernel — codegen'd md5 + string
 * slicing, values never reach the state store); the stateful
 * exchange carries (group, j, ρ) ints and state is a fixed 2^p
 * bytes per group — no payload, no row list, no single-task funnel.
 */
object StreamingHll {

  /** @return Update-mode stream mirroring the batch columns: (byCol,
    *         m_registers, n_hit, v_empty, s41, est_raw, estimate,
    *         small_range). The LAST emission per group is current.
    *         Key-type contract (the [[StreamingCusum]] group-key
    *         convention): byCol is emitted as STRING — the state key
    *         is the group's string rendering, so a non-string batch
    *         group column compares equal only through the same cast;
    *         join the batch sketch on `cast(byCol as string)`. */
  def hll(df: DataFrame, byCol: String, valueCol: String,
          p: Int = 12, salt: String = "s0"): DataFrame = {
    require(Set(4, 8, 12, 16).contains(p),
      s"p must be one of 4, 8, 12, 16 (hex-char-aligned registers), got $p")
    val m = 1 << p
    val spark = df.sparkSession
    import spark.implicits._
    Sketches.drawFrame(
        df.filter(col(byCol).isNotNull && col(valueCol).isNotNull)
          .select(col(byCol).cast("string").as("__g"),
            col(valueCol).as("__v")), p, salt)
      .as[(String, Long, Int)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long, Int)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Byte]]) =>
          val reg = state.getOption.getOrElse(new Array[Byte](m))
          rows.foreach { case (_, ji, ri) =>
            val i = ji.toInt
            if (ri > reg(i)) reg(i) = ri.toByte
          }
          state.update(reg)
          var nHit = 0L
          var sp = 0L
          var i = 0
          while (i < m) {
            if (reg(i) > 0) { nHit += 1; sp += 1L << (41 - reg(i)) }
            i += 1
          }
          (g, nHit, sp)
      }
      .toDF("__g", "n_hit", "__sp")
      .select(col("__g").as(byCol) +: Sketches.estimateCols(m): _*)
  }
}
