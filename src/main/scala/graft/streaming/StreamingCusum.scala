package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming one-sided upper CUSUM drift monitor —
 * [[graft.operators.Retention.cusum]] lifted onto Structured
 * Streaming: the sequential detector living in its NATIVE habitat (a
 * live metric feed — error rates per batch, latency per tick), the
 * [[StreamingSprt]] question with Page's recursion instead of a
 * parametric likelihood ratio. Every micro-batch emits the current
 * (max S, alarm census, first-alarm seq) per group.
 *
 * Why streamed ≡ batch holds BIT-FOR-BIT at every in-order prefix:
 * the state per group is six longs + the first-alarm option —
 * (high-water seq, running cumulative C, clamped running min of C,
 * max S, n, n_alarms) — and the decision path is 100% integer:
 * Sᵢ = Cᵢ − min(0, min_{j≤i} Cⱼ) is the batch operator's exact
 * closed form evaluated incrementally, the alarm compare S > h and
 * the first-alarm argmin are integer, and no float ever enters the
 * state. No per-row history is kept — O(1) state per group.
 *
 * Ordering contract (the [[StreamingSceneCuts]] convention): the
 * recursion is order-defined, so the monitor sorts each
 * micro-batch's rows by seq and requires monotone progression
 * across batches — a row at or below the group's high-water seq is
 * counted in `n_late` and EXCLUDED from the recursion (where the
 * batch operator REFUSES duplicate seqs outright, a stream absorbs
 * at-least-once redelivery instead — visibly, never silently). A
 * feed that interleaves a group's rows out of order beyond
 * micro-batch granularity needs an upstream per-group ordering
 * stage; n_late makes that condition visible.
 *
 * Scale shape: stateful exchange moves one (group, seq, x) row per
 * observation; state is O(1) per group — no row list, no payload,
 * no single-task funnel.
 */
object StreamingCusum {

  /** @return Update-mode stream of (byCol, n, max_s, n_alarms,
    *         first_alarm_seq — null when never — h echoed, alarmed,
    *         n_late): the batch [[graft.operators.Retention.cusum]]
    *         schema plus the late-delivery census. The LAST emission
    *         per group is current. */
  def cusum(df: DataFrame, byCol: String, seqCol: String, xCol: String,
            target: Long, threshold: Long): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(byCol).isNotNull && col(seqCol).isNotNull &&
        col(xCol).isNotNull)
      .select(col(byCol).cast("string").as("g"),
        col(seqCol).cast("long").as("i"),
        (col(xCol).cast("long") - lit(target)).as("y"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long, Long, Long,
                           Option[Long], Long),
                          (String, Long, Long, Long, Option[Long], Long,
                           Boolean, Long)](GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Long, Long, Long, Long, Long, Long, Option[Long], Long)]) =>
          // (hiSeq, c, minC — clamped at the virtual C0 = 0 — maxS,
          //  n, nAlarms, firstAlarm, nLate)
          var (hi, c, minC, maxS, n, nAlarms, firstAlarm, late) =
            state.getOption
              .getOrElse((Long.MinValue, 0L, 0L, 0L, 0L, 0L,
                None: Option[Long], 0L))
          rows.toSeq.sortBy(_._2).foreach { case (_, i, y) =>
            if (i <= hi && n > 0) late += 1
            else {
              c += y
              if (c < minC) minC = c
              val s = c - minC
              if (s > maxS) maxS = s
              if (s > threshold) {
                nAlarms += 1
                if (firstAlarm.isEmpty) firstAlarm = Some(i)
              }
              hi = i; n += 1
            }
          }
          state.update((hi, c, minC, maxS, n, nAlarms, firstAlarm, late))
          (g, n, maxS, nAlarms, firstAlarm, threshold, nAlarms > 0, late)
      }
      .toDF(byCol, "n", "max_s", "n_alarms", "first_alarm_seq", "h",
        "alarmed", "n_late")
  }
}
