package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming winnowing (MOSS) plagiarism detection — the ingest-time
 * face of [[TextAnalysis.winnowPairs]]: as documents arrive, their
 * winnow fingerprints are computed STATELESSLY (the same zero-shuffle
 * per-row kernel as the batch operator; document text never reaches
 * the state store) and each fingerprint VALUE keys a state bucket of
 * the doc ids that carried it. A new arrival immediately pairs with
 * every earlier document sharing the fingerprint.
 *
 * Scale shape: state is per-fingerprint id lists — sized by how many
 * docs share a local fingerprint, not by the corpus; the opt-in
 * `maxPerFp` is the streaming face of the batch hot-fingerprint cap
 * (a saturated bucket still matches new arrivals, it just stops
 * growing — logged recall trade, same contract as [[StreamingDedup]]).
 * Re-delivered documents (at-least-once sources) are absorbed: an id
 * already in the bucket neither re-pairs nor duplicates state.
 *
 * Candidates are a stream of (id_a, id_b, fp); the `minShared`
 * threshold and containment scoring of the batch operator stay a
 * downstream batch aggregation, exactly like the batch path's verify
 * stage. Pinned streamed ≡ batch (minShared=1 candidate surface) in
 * StreamingSpec.
 */
object StreamingWinnow {

  /** @return streaming (id_a, id_b, fp) rows, id_a < id_b */
  def candidates(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 3, w: Int = 4,
                 maxPerFp: Option[Int] = None): DataFrame = {
    StreamingKeys.requireIntegral("StreamingWinnow", docs, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    // stateless stage: per-row kernel -> distinct fingerprint VALUES
    // (positions dropped: pairing is by content, and keeping one row
    // per (doc, fp) bounds the state operator's input)
    val fps = docs.select(col(idCol).cast("long").as("__wid"),
        TextAnalysis.winnowKeyArray(col(textCol), k, w).as("__keys"))
      .select(col("__wid"),
        explode(array_distinct(transform(col("__keys"),
          key => shiftright(key, 20)))).as("fp"))
      .as[(Long, Long)]
    val cap = maxPerFp.getOrElse(Int.MaxValue)
    fps.groupByKey(_._2)
      .flatMapGroupsWithState[List[Long], (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: Long, rows: Iterator[(Long, Long)], state: GroupState[List[Long]]) =>
          var seen = state.getOption.getOrElse(Nil)
          var warned = false
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          rows.foreach { case (id, _) =>
            if (!seen.contains(id)) { // re-delivery: no self-pairs
              seen.foreach { oid =>
                val (x, y) = if (oid < id) (oid, id) else (id, oid)
                out += ((x, y, fp))
              }
              if (seen.size < cap) seen = id :: seen
              else if (!warned) {
                org.slf4j.LoggerFactory.getLogger(StreamingWinnow.getClass)
                  .warn(s"StreamingWinnow: fingerprint bucket saturated at " +
                    s"$cap ids; further arrivals match but are not stored")
                warned = true
              }
            }
          }
          state.update(seen)
          out.iterator
      }
      .toDF("id_a", "id_b", "fp")
  }
}
