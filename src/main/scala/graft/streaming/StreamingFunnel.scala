package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming ordered event funnel — [[graft.operators.Retention.funnel]]
 * lifted onto Structured Streaming: conversion tracked LIVE as the
 * event feed arrives ("how many users have reached purchase so far"),
 * the product-analytics loop the batch operator closes offline.
 *
 * Why streamed ≡ batch holds at every in-order prefix: the batch
 * chain is GREEDY (t₁ = earliest step-1 ts, tᵢ = earliest step-i ts
 * strictly after tᵢ₋₁), and a greedy chain is incrementally
 * maintainable under in-order delivery — a new event can only ever
 * fill the FIRST unset step whose predecessor is set (set-if-unset,
 * so replays are idempotent), because any earlier candidate would
 * already have been seen. State per user: k step timestamps (−1 =
 * unset) + the high-water ts + a late counter — O(k) longs, no event
 * list, no payload.
 *
 * Ordering contract (the [[StreamingSceneCuts]] convention, tuned
 * for ties): each micro-batch sorts by (ts, step index) — so a view
 * and a click at the SAME instant process view-first, exactly the
 * order the batch min semantics imply — and rows STRICTLY below the
 * user's high-water ts are counted in `n_late` and excluded
 * (at-least-once redelivery of old events is absorbed: a replayed
 * event at the high-water instant re-applies set-if-unset, a no-op).
 * Out-of-order feeds beyond micro-batch granularity need an upstream
 * per-user ordering stage; n_late makes the condition visible.
 */
object StreamingFunnel {

  /** @return Update-mode stream of (userCol, t1..tk — nullable step
    *         timestamps — depth, n_late): the batch
    *         [[graft.operators.Retention.funnel]] schema plus the
    *         late census. The LAST emission per user is current.
    *         `maxSpan` is the batch operator's first-touch-anchored
    *         conversion window — incrementally maintainable because
    *         the window end t₁ + maxSpan is FIXED the moment the
    *         anchor sets (set-if-unset), so each later event faces
    *         the same admission test the batch fold applies. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             maxSpan: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8,
      s"steps must be 1..8, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"steps must be distinct, got $steps")
    maxSpan.foreach(s => require(s > 0, s"maxSpan must be positive, got $s"))
    StreamingKeys.requireIntegral("StreamingFunnel", events, userCol)
    val k = steps.size
    val stepIdx = steps.zipWithIndex.toMap
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(userCol).cast("long").as("u"),
        col(typeCol).cast("string").as("t"),
        col(tsCol).cast("long").as("ts"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Seq[Long], Long, Long),
                          (Long, Seq[Option[Long]], Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (u: Long, rows: Iterator[(Long, String, Long)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Seq[Long], Long, Long)]) =>
          var (ts0, hi, late) = state.getOption
            .getOrElse((Seq.fill(k)(-1L), Long.MinValue, 0L))
          val t = ts0.toArray
          rows.toSeq
            .map { case (_, tp, ts) => (ts, stepIdx.getOrElse(tp, -1), tp) }
            .sortBy { case (ts, s, _) => (ts, s) }
            .foreach { case (ts, s, _) =>
              if (ts < hi) late += 1
              else {
                hi = ts
                if (s == 0 && t(0) < 0L) t(0) = ts
                else if (s > 0 && t(s) < 0L && t(s - 1) >= 0L &&
                  ts > t(s - 1) &&
                  maxSpan.forall(sp => ts <= t(0) + sp)) t(s) = ts
              }
            }
          state.update((t.toSeq, hi, late))
          val opts = t.toSeq.map(x => if (x < 0L) None else Some(x))
          (u, opts, opts.count(_.isDefined).toLong, late)
      }
      .select((col("_1").as(userCol) +:
        steps.indices.map(i => col("_2").getItem(i).as(s"t${i + 1}"))) ++
        Seq(col("_3").as("depth"), col("_4").as("n_late")): _*)
  }
}
