package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/**
 * Streaming HDR percentile monitor —
 * [[graft.operators.Sketches.hdrQuantiles]] lifted onto Structured
 * Streaming: live per-group latency/size percentiles (the thing HDR
 * histograms were invented for) with the batch sketch's all-integer
 * contract. Every micro-batch emits the group's current
 * (permille, n, est) rows.
 *
 * Why streamed ≡ batch holds BIT-FOR-BIT at every in-order prefix:
 * the state per group is the sparse bucket-count map (≤ (64−k+1)·2^k
 * integer entries — no payload, no row list) plus the high-water seq
 * and late census; bucket counts ADD in any order, and the rank walk
 * is the batch operator's pure-integer ⌈n·p/1000⌉ argmin evaluated
 * over the same counts, with [[Sketches.bucketRep]] the shared
 * representative formula. Counts are NOT idempotent (unlike
 * [[StreamingHll]]'s max-registers), so at-least-once redelivery is
 * absorbed the [[StreamingCusum]] way: rows at or below the group's
 * high-water seq land in `n_late` and are EXCLUDED from the counts —
 * visibly, never silently.
 *
 * Scale shape: the bucket kernel runs in the stateless select (the
 * SHARED [[Sketches.withBucketId]] column — codegen'd bin() +
 * shifts); the stateful exchange carries (group, seq, bucket) longs
 * and state is bucket-bounded per group.
 */
object StreamingHdr {

  /** @return Update-mode stream of (byCol, permille, n, est, n_late)
    *         — the batch [[Sketches.hdrQuantiles]] columns plus the
    *         late-delivery census; one row per (group, permille) per
    *         micro-batch, the LAST set per group is current. Key-type
    *         contract: byCol is emitted as STRING (the
    *         [[StreamingCusum]] group-key convention). */
  def hdr(df: DataFrame, byCol: String, seqCol: String, valueCol: String,
          permilles: Seq[Int], subBits: Int = 5): DataFrame = {
    Sketches.validateHdr(permilles, subBits)
    val spark = df.sparkSession
    import spark.implicits._
    val ps = permilles.toArray
    val k = subBits
    Sketches.withBucketId(
        df.filter(col(byCol).isNotNull && col(seqCol).isNotNull &&
            col(valueCol).isNotNull)
          .select(col(byCol).cast("string").as("__g"),
            col(seqCol).cast("long").as("__s"),
            col(valueCol).as("__v")), subBits)
      .select(col("__g"), col("__s"), col("__id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Map[Long, Long]),
                              (String, Int, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Long, Long, Map[Long, Long])]) =>
          var (hi, late, counts) = state.getOption
            .getOrElse((Long.MinValue, 0L, Map.empty[Long, Long]))
          val cm = scala.collection.mutable.Map(counts.toSeq: _*)
          var n = cm.values.sum
          rows.toSeq.sortBy(_._2).foreach { case (_, s, id) =>
            if (s <= hi && n + late > 0) late += 1
            else {
              cm(id) = cm.getOrElse(id, 0L) + 1L
              n += 1
              hi = s
            }
          }
          state.update((hi, late, cm.toMap))
          // the batch rank walk over the sorted sparse buckets
          val sorted = cm.toSeq.sortBy(_._1)
          val cum = sorted.scanLeft(0L)(_ + _._2).drop(1)
          ps.iterator.map { p =>
            val rank = (n * p + 999) / 1000
            val idx = cum.indexWhere(_ >= rank)
            (g, p, n, Sketches.bucketRep(sorted(idx)._1, k), late)
          }
      }
      .toDF(byCol, "permille", "n", "est", "n_late")
  }
}
