package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming scene-cut detection — [[graft.operators.Multimodal.sceneCuts]]
 * lifted onto Structured Streaming: frames fingerprint STATELESSLY in
 * the map stage (payload bytes never reach the state store — the
 * [[StreamingImageDedup]] convention), and per-video state holds only
 * the last seen (frame_idx, fingerprint) plus the running counters,
 * so a live ingest feed reports each video's scene structure as it
 * arrives with O(1) state per video.
 *
 * Ordering contract: cuts are decided between CONSECUTIVE frames, so
 * the monitor sorts each micro-batch's frames by index and requires
 * monotone progression across batches — a frame at or below the
 * video's high-water index is counted in `n_late` and EXCLUDED from
 * the cut logic (replays and shuffled deliveries must not fabricate
 * cuts between non-adjacent frames; at-least-once redelivery of old
 * frames is therefore absorbed, the md5-sampler idempotence idea).
 * A feed that interleaves a video's frames out of order beyond
 * micro-batch granularity needs an upstream per-video ordering stage;
 * the n_late counter makes that condition visible instead of silent.
 *
 * Scale shape: stateful exchange moves one (video, idx, 64-bit
 * fingerprint) row per frame; state is two longs + three counters per
 * video — no frame list, no payload, no single-task funnel.
 */
object StreamingSceneCuts {

  /** @return Update-mode stream of (doc_id, n_frames, n_cuts,
    *         n_scenes, n_late): fingerprinted frames accepted so far,
    *         cuts (consecutive hamming > maxHamming), scenes
    *         (= cuts + 1 once a frame arrived), and frames rejected
    *         for arriving at/below the high-water index. The LAST
    *         emission per video is current. */
  def sceneCuts(frames: DataFrame, maxHamming: Int = 8,
                buckets: Int = 65): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    val spark = frames.sparkSession
    import spark.implicits._
    val fb = Multimodal.FRAME_BITS
    Multimodal.frameFingerprints(frames.as[Multimodal.Frame], buckets)
      .select(shiftright(col("id"), fb).as("vid"),
        col("id").bitwiseAND(lit((1L << fb) - 1)).as("idx"),
        col("simhash"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long, Long),
                          (Long, Long, Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (vid: Long, rows: Iterator[(Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Long, Long, Long, Long, Long)]) =>
          // (highWaterIdx, lastFp, nFrames, nCuts, nLate)
          var (hi, lastFp, n, cuts, late) =
            state.getOption.getOrElse((-1L, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_._2).foreach { case (_, idx, fp) =>
            if (idx <= hi) late += 1 // hi starts at -1: first frame accepts
            else {
              if (n > 0 &&
                  java.lang.Long.bitCount(fp ^ lastFp) > maxHamming)
                cuts += 1
              hi = idx; lastFp = fp; n += 1
            }
          }
          state.update((hi, lastFp, n, cuts, late))
          (vid, n, cuts, if (n > 0) cuts + 1 else 0L, late)
      }
      .toDF("doc_id", "n_frames", "n_cuts", "n_scenes", "n_late")
  }
}
