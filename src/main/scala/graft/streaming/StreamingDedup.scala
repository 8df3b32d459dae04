package graft.streaming

import graft.functions.ShingleExprs
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming near-duplicate DETECTION — the MinHash+LSH dedup family
 * lifted onto Structured Streaming for ingestion pipelines: as
 * documents arrive, each is checked against everything already seen in
 * its LSH band buckets and candidate pairs are emitted immediately.
 *
 * The scale shape mirrors the batch operator ([[Dedup.minhashCandidates]]):
 * the signature build is the same codegen'd map-side kernel (the
 * corpus-sized shingle stream never shuffles; micro-batches only move
 * #docs × bands tiny rows into the state operator), and state is
 * per-(band, bucket) signature lists — UNCAPPED by default, matching
 * the batch operator's `maxBucketSize` default so the pinned
 * streamed ≡ batch parity holds; the opt-in `maxPerBucket` is the
 * streaming face of the hot-bucket guard: a full bucket still MATCHES
 * new arrivals against its stored signatures, it just stops growing
 * (documented + logged recall trade, same as the batch cap).
 *
 * A pair colliding in several bands is emitted once per colliding band
 * per batch — candidates are a stream, exact-verification (set Jaccard
 * over the colliding docs) stays a downstream batch join, exactly like
 * the batch path's verify stage. Pinned against the batch operator's
 * candidate set in StreamingSpec.
 */
object StreamingDedup {

  /** @return streaming (id_a, id_b, est_jaccard) candidate pairs,
    *         id_a < id_b, est from the k-minhash signature agreement */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleWords: Int = 3, k: Int = 64, bands: Int = 16,
                        minEstJaccard: Double = 0.0,
                        maxPerBucket: Option[Int] = None): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    StreamingKeys.requireIntegral("StreamingDedup", docs, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    val r = k / bands
    val a = Dedup.mixConstants(k, 1, 30)
    val b = Dedup.mixConstants(k, 2, 32)
    val sigs = docs.select(col(idCol).cast("long").as("id"),
        ShingleExprs.shingle_minhash(col(textCol), shingleWords, k,
          a.toArray, b.toArray, Dedup.MINHASH_P).as("s"))
      .filter(size(col("s.hs")) > 0) // docs with < w tokens drop out
      .select(col("id"), col("s.sig").as("sig"))
    val buckets = (0 until bands).map(j =>
      hash((j * r until (j + 1) * r).map(i => element_at(col("sig"), i + 1)): _*))
    val banded = sigs
      .select(col("id"), col("sig"),
        posexplode(array(buckets: _*)).as(Seq("band", "bucket")))
      .as[(Long, Seq[Long], Int, Int)]
    val kk = k
    val minEst = minEstJaccard
    // default UNCAPPED to match the batch operator's maxBucketSize
    // default — a silent cap made the pinned streamed ≡ batch parity
    // diverge on hot buckets (two post-cap arrivals could never pair)
    val cap = maxPerBucket.getOrElse(Int.MaxValue)
    banded.groupByKey(t => (t._3, t._4))
      .flatMapGroupsWithState[List[(Long, Array[Long])], (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Int), rows: Iterator[(Long, Seq[Long], Int, Int)],
         state: GroupState[List[(Long, Array[Long])]]) =>
          var seen = state.getOption.getOrElse(Nil)
          var warned = false
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          rows.foreach { case (id, sigSeq, _, _) =>
            if (!seen.exists(_._1 == id)) { // re-delivered doc: no self-pairs
              val sig = sigSeq.toArray
              seen.foreach { case (oid, osig) =>
                var agree = 0
                var i = 0
                while (i < kk) { if (sig(i) == osig(i)) agree += 1; i += 1 }
                val est = agree.toDouble / kk
                if (est >= minEst) {
                  val (x, y) = if (oid < id) (oid, id) else (id, oid)
                  out += ((x, y, est))
                }
              }
              if (seen.size < cap) seen = (id, sig) :: seen
              else if (!warned) { // opt-in cap hit: coverage loss observable
                org.slf4j.LoggerFactory.getLogger(StreamingDedup.getClass)
                  .warn(s"StreamingDedup: band bucket saturated at $cap " +
                    "signatures; further arrivals match but are not stored")
                warned = true
              }
            }
          }
          state.update(seen)
          out.iterator
      }
      .toDF("id_a", "id_b", "est_jaccard")
  }
}
