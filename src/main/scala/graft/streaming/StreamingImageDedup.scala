package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming perceptual image near-dup DETECTION — [[Multimodal.dHash]]
 * + the pigeonhole banding of `Dedup.simhashPairs`, lifted onto
 * Structured Streaming for media-ingestion pipelines: as images
 * arrive, each is hashed map-side (one real ImageIO decode per
 * payload) and checked against everything already seen in its hash
 * bands; pairs within the hamming radius are emitted immediately.
 *
 * Scale shape mirrors the batch operator: the decode+hash runs in the
 * stateless map stage (payload bytes never reach the state store —
 * only 64-bit signatures do), state is per-(band, bucket) signature
 * lists — UNCAPPED by default, matching the batch operator, so the
 * pinned streamed ≡ batch parity holds; an opt-in `maxPerBucket`
 * bounds hot-bucket state (a full bucket still matches new arrivals,
 * it just stops growing, and the saturation is logged) — and
 * completeness at the radius follows from the same pigeonhole
 * argument. A pair colliding in several bands is
 * emitted once per colliding band per batch — dedup downstream, like
 * the text twin ([[StreamingDedup]]). Pinned streamed ≡ batch in
 * StreamingSpec.
 */
object StreamingImageDedup {

  /** @return streaming (id_a, id_b, hamming) pairs with
    *         hamming ≤ `maxHamming`, id_a < id_b */
  def nearDupCandidates(media: Dataset[Multimodal.MediaRow],
                        maxHamming: Int = 3,
                        maxPerBucket: Option[Int] = None): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // stateless stage: decode + hash — undecodable payloads drop out
    // (no signature, stay singletons); only (id, hash) longs flow on
    candidatesFromSignatures(media.mapPartitions { rows =>
      rows.flatMap(r => Multimodal.dHash(r.payload).iterator.map((r.doc_id, _)))
    }, maxHamming, maxPerBucket)
  }

  /**
   * Streaming VIDEO keyframe candidates on the same spine: frames
   * fingerprint statelessly ([[Multimodal.frameFingerprints]], frame
   * bytes never reach the state store), then the shared banded state
   * join pairs individual frames. Ids are the composite
   * (video << FRAME_BITS | frame) packing, so the per-video
   * aggregation of [[Multimodal.videoNearDupPairs]] applies downstream
   * unchanged.
   */
  def videoFrameCandidates(frames: Dataset[Multimodal.Frame],
                           maxHamming: Int = 3,
                           maxPerBucket: Option[Int] = None): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    candidatesFromSignatures(
      Multimodal.frameFingerprints(frames).as[(Long, Long)],
      maxHamming, maxPerBucket)
  }

  /**
   * The shared machinery: banded-hamming candidate detection over ANY
   * streaming (id, 64-bit signature) dataset — the streaming face of
   * `Dedup.simhashPairs`' pigeonhole banding, one state operator,
   * state = signatures only.
   */
  def candidatesFromSignatures(sigs: Dataset[(Long, Long)],
                               maxHamming: Int = 3,
                               maxPerBucket: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      "maxHamming must be in [0, 63]")
    val spark = sigs.sparkSession
    import spark.implicits._
    val bands = maxHamming + 1
    val bound = (0 to bands).map(j => j * 64 / bands)
    val banded = sigs.flatMap { case (id, h) =>
      (0 until bands).iterator.map { j =>
        val w = bound(j + 1) - bound(j)
        val mask = if (w == 64) -1L else (1L << w) - 1
        (id, h, j, (h >>> bound(j)) & mask)
      }
    }
    val radius = maxHamming
    // default UNCAPPED to match the batch imageNearDupPairs default —
    // a silent cap made the pinned streamed ≡ batch parity diverge on
    // hot buckets (two post-cap arrivals could never pair)
    val cap = maxPerBucket.getOrElse(Int.MaxValue)
    banded.groupByKey(t => (t._3, t._4))
      .flatMapGroupsWithState[List[(Long, Long)], (Long, Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[(Long, Long, Int, Long)],
         state: GroupState[List[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Nil)
          var warned = false
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
          rows.foreach { case (id, h, _, _) =>
            if (!seen.exists(_._1 == id)) { // re-delivered image: no self-pairs
              seen.foreach { case (oid, oh) =>
                val ham = java.lang.Long.bitCount(h ^ oh)
                if (ham <= radius) {
                  val (x, y) = if (oid < id) (oid, id) else (id, oid)
                  out += ((x, y, ham))
                }
              }
              if (seen.size < cap) seen = (id, h) :: seen
              else if (!warned) { // opt-in cap hit: coverage loss observable
                org.slf4j.LoggerFactory.getLogger(StreamingImageDedup.getClass)
                  .warn(s"StreamingImageDedup: band bucket saturated at $cap " +
                    "signatures; further arrivals match but are not stored")
                warned = true
              }
            }
          }
          state.update(seen)
          out.iterator
      }
      .toDF("id_a", "id_b", "hamming")
  }
}
