package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming SPRT monitor —
 * [[graft.operators.Preference.sprtMonitor]] lifted onto Structured
 * Streaming, which is the test's NATIVE habitat (Wald designed it
 * for sequential observation: the whole point is to stop the eval
 * mid-stream): win/loss verdicts arrive as the A/B eval runs, and
 * per group the state holds the RUNNING (wins, losses) pair, so
 * every micro-batch emits the decision the batch operator would make
 * on everything seen so far — the eval stops the moment a boundary
 * is crossed, not when the batch lands.
 *
 * Float contract: the STATE is two longs (the suite rule); the llr
 * dag and both Wald boundaries replay the batch operator's
 * arithmetic on integer-percent parameters (BigDecimal HALF_UP ≡
 * Spark `round`), and the boundary compares run on the same doubles
 * — streamed decision ≡ batch decision at every prefix, pinned in
 * StreamingSpec.
 *
 * Scale shape: state is two longs per GROUP; the stateful exchange
 * moves one (group, win) row per verdict.
 *
 * At-least-once caveat: a replayed micro-batch re-adds its verdicts;
 * run with exactly-once sinks (the [[StreamingHeavyHitters]]
 * convention).
 */
object StreamingSprt {

  /** @return Update-mode stream of (byCol, n, wins, losses, llr,
    *         decision) — the batch [[graft.operators.Preference
    *         .sprtMonitor]] schema. */
  def sprtMonitor(resp: DataFrame, byCol: String, winCol: String,
                  p0Pct: Int = 50, p1Pct: Int = 60,
                  alphaPct: Int = 5, betaPct: Int = 5): DataFrame = {
    require(0 < p0Pct && p0Pct < p1Pct && p1Pct < 100,
      s"need 0 < p0 < p1 < 100 in percent, got ($p0Pct, $p1Pct)")
    require(0 < alphaPct && alphaPct < 100 && 0 < betaPct && betaPct < 100,
      s"error rates must be percents in (0, 100), got " +
        s"($alphaPct, $betaPct)")
    val spark = resp.sparkSession
    import spark.implicits._
    // StrictMath.log, NOT math.log: Catalyst's Log expression
    // evaluates via StrictMath (fdlibm), while Math.log may take an
    // x86 intrinsic that differs in the last bit on some inputs — a
    // one-ulp llr disagreement at a Wald boundary would flip the
    // streamed decision against batch
    val winLr = StrictMath.log(p1Pct.toDouble / p0Pct.toDouble)
    val lossLr = StrictMath.log(
      (100 - p1Pct).toDouble / (100 - p0Pct).toDouble)
    val upper = StrictMath.log(
      (100 - betaPct).toDouble / alphaPct.toDouble)
    val lower = StrictMath.log(
      betaPct.toDouble / (100 - alphaPct).toDouble)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    resp.filter(col(byCol).isNotNull && col(winCol).isNotNull)
      .select(col(byCol).cast("string").as("g"),
        when(col(winCol), 1L).otherwise(0L).as("w"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long),
                          (String, Long, Long, Long, Double, String)](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long)]) =>
          var (w, l) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { case (_, win) =>
            if (win == 1L) w += 1 else l += 1
          }
          state.update((w, l))
          // the batch dag: boundary compares on the UNROUNDED llr
          val llr = w.toDouble * winLr + l.toDouble * lossLr
          val decision =
            if (llr >= upper) "accept_h1"
            else if (llr <= lower) "accept_h0"
            else "continue"
          // gateRound: BigDecimal HALF_UP then -0.0 normalized away
          (g, w + l, w, l, r6(llr) + 0.0, decision)
      }
      .toDF("src", "n", "wins", "losses", "llr", "decision")
  }
}
