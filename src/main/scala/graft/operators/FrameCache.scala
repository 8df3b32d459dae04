package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Per-JVM memoization of small OFFLINE DataFrame artifacts — the
 * frame-shaped sibling of [[Bpe.learnMergesCached]] (merge lists) and
 * [[IvfIndex.trainCached]] (centroids). A training-data deployment
 * computes media embeddings, perceptual hashes, and tokenizer
 * encodings ONCE and stores them in the lake next to the documents
 * (that is exactly what the `embeddings` parquet table is); queries
 * pay index/search/aggregate, not re-extraction. At bench/serve time
 * the same economics apply: the first evaluation of a keyed artifact
 * builds and localCheckpoints it, later queries in the same JVM read
 * the checkpointed blocks.
 *
 * Keys fold in the SparkContext applicationId so a cached frame can
 * never leak across sessions into a stopped context, and the caller's
 * key must identify the INPUT (lake dir + parameters) — same contract
 * as the other artifact caches. Only DETERMINISTIC builders may be
 * cached (every current caller derives rows from doc_id arithmetic or
 * deterministic decode), otherwise the memoized and fresh plans could
 * disagree under the oracle.
 *
 * Builds race benignly: two concurrent misses on one key both build,
 * one wins `putIfAbsent`, the loser's checkpoint is dropped by the
 * ContextCleaner. (computeIfAbsent would instead hold a bin lock
 * across a whole Spark job.)
 */
object FrameCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  // crude bound, the Bpe.MergeCacheMax precedent: past this many
  // artifacts the cache clears wholesale — dropped frames just
  // rebuild on next use, and the ContextCleaner reclaims their
  // checkpoint blocks once unreachable. A long-lived server over many
  // lakes must never pin blocks unboundedly.
  private val MaxEntries = 64

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = spark.sparkContext.applicationId + "|" + key
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      if (cache.size > MaxEntries) cache.clear()
      val df = build.localCheckpoint(true)
      val prev = cache.putIfAbsent(k, df)
      if (prev != null) prev else df
    }
  }
}
