package graft.streaming

import graft.operators.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Streaming deterministic stratified sampling — [[Sampling.stratifiedSample]]
 * lifted onto Structured Streaming: as rows arrive, each stratum keeps
 * the `n` smallest md5(key, salt) ranks seen so far, so at every point
 * in time the state holds EXACTLY the sample the batch operator would
 * draw from everything ingested (same ranks, same order, engine-
 * independent). Update-mode emission: a stratum re-emits its current
 * sample whenever a batch touches it; the LAST emission per stratum is
 * the batch-equivalent answer (pinned in StreamingSpec).
 *
 * Scale shape: the rank is computed map-side; the state operator moves
 * one (rank, key) pair per row and holds O(n) per stratum. Re-delivered
 * rows are absorbed idempotently (the rank pair deduplicates), so
 * at-least-once sources cannot skew the draw — the property that makes
 * md5 ranks, not reservoir RNG, the right streaming sampler: a classic
 * reservoir mutates on every arrival and double-counts replays.
 */
object StreamingSample {

  /** @return Update-mode stream of (stratum, sample) — `sample` is the
    *         stratum's current key sample as strings, smallest-rank
    *         first. */
  def stratifiedSample(docs: DataFrame, strataCol: String, keyCol: String,
                       n: Int, salt: String = "s0"): DataFrame = {
    require(n > 0, "sample size must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(col(strataCol).cast("string").as("g"),
        Sampling.rankKey(Seq(col(keyCol)), salt).as("rk"),
        col(keyCol).cast("string").as("k"))
      .as[(String, String, String)]
    val nn = n
    keyed.groupByKey(_._1)
      .mapGroupsWithState[List[(String, String)], (String, Seq[String])](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, String, String)],
         state: GroupState[List[(String, String)]]) =>
          var res = state.getOption.getOrElse(Nil)
          rows.foreach { case (_, rk, k) =>
            val cand = (rk, k)
            // admit iff it beats the current worst (or there's room),
            // dedup so replays are no-ops
            if (!res.contains(cand) &&
              (res.size < nn || implicitly[Ordering[(String, String)]]
                .lt(cand, res.max)))
              res = (cand :: res).sorted.take(nn)
          }
          state.update(res)
          g -> res.map(_._2)
      }
      .toDF(strataCol, "sample")
  }
}
