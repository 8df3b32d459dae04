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
 * key must identify the INPUT — not just its path: [[cachedOn]] is
 * the standard entry point, folding each input frame's analyzed-plan
 * semanticHash AND its backing files' (size, mtime) fingerprint into
 * the key, so a lake regenerated in place in the same JVM can never
 * be served the previous corpus's artifacts. Only DETERMINISTIC
 * builders may be cached (every current caller derives rows from
 * doc_id arithmetic or deterministic decode), otherwise the memoized
 * and fresh plans could disagree under the oracle.
 *
 * Eviction is per-entry LRU (access-ordered LinkedHashMap under a
 * lock): at [[FrameCache.MaxEntries]]+1 artifacts the LEAST RECENTLY
 * USED one drops and rebuilds on next use — a long-lived server over
 * many lakes sheds cold lakes' artifacts while the live session's hot
 * entries survive (the previous wholesale clear() evicted those too:
 * a rebuild storm in exactly the deployment the bound protects).
 * Dropped frames' checkpoint blocks are reclaimed by the
 * ContextCleaner once unreachable.
 *
 * Builds race benignly: two concurrent misses on one key both build,
 * the first to insert wins, the loser's checkpoint is dropped by the
 * ContextCleaner. (Building under the map lock would instead hold it
 * across a whole Spark job.)
 */
object FrameCache {
  private[graft] val MaxEntries = 64
  private val cache =
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f,
        /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFrame]): Boolean =
        size() > MaxEntries
    }

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = spark.sparkContext.applicationId + "|" + key
    val hit = cache.synchronized(cache.get(k))
    if (hit != null) hit
    else {
      val df = build.localCheckpoint(true)
      cache.synchronized {
        val prev = cache.get(k)
        if (prev != null) prev
        else { cache.put(k, df); df }
      }
    }
  }

  /** Test hook: drop every memoized frame (suites sharing one JVM use
    * this to force the durable [[ArtifactStore]] tier to be consulted).
    * Never called by production code — eviction is the LRU's job. */
  private[graft] def clearForTesting(): Unit =
    cache.synchronized(cache.clear())

  /** [[cached]] with the input frames folded into the key: each
    * input's analyzed-plan semanticHash (what is computed, from which
    * paths) plus its [[frameFingerprint]] (file sizes/mtimes — the
    * part the semantic hash misses when a lake is regenerated in
    * place). `tag` distinguishes different artifacts of the same
    * inputs. */
  def cachedOn(spark: SparkSession, tag: String, inputs: DataFrame*)
              (build: => DataFrame): DataFrame = {
    val in = inputs.map(d =>
      d.queryExecution.analyzed.semanticHash().toString + ":" +
        frameFingerprint(d)).mkString(",")
    cached(spark, s"$tag|in=$in")(build)
  }

  /** Fingerprint of a DataFrame's backing files (path, size, mtime).
    * Non-file-backed plans (in-memory test frames) fingerprint empty —
    * callers fold the semantic hash alongside, which covers those.
    * Metadata-only: one FileSystem getFileStatus per backing file,
    * no data read. */
  def frameFingerprint(df: DataFrame): String = {
    val files = df.inputFiles
    if (files.isEmpty) ""
    else {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val h = java.security.MessageDigest.getInstance("MD5")
      files.sorted.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(conf).getFileStatus(p)
        h.update(s"$f|${st.getLen}|${st.getModificationTime};".getBytes("UTF-8"))
      }
      h.digest().map("%02x".format(_)).mkString
    }
  }
}
