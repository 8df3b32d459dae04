package graft.operators

import graft.functions.{BloomExprs, ShingleExprs, TextExprs}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Train/test decontamination for training-data pipelines: remove (or
 * flag) training documents that leak evaluation data.
 *
 * Two families, mirroring how the problem splits at 100 TB:
 *
 *  1. N-GRAM overlap vs a small eval set ([[flagContaminated]]): the
 *     eval set is test-suite sized (thousands of documents), so its
 *     distinct shingle hashes are metadata — collected once to the
 *     driver, sorted, and pushed into the corpus scan as a codegen'd
 *     binary-search flag ([[graft.functions.SortedLongsOverlap]]).
 *     The 100 TB side is never exploded, never shuffled: the flag
 *     materializes inside the scan stage. [[contaminatedIds]] is the
 *     broadcast-join formulation of the same predicate for eval sets
 *     too large to embed in a plan (equality pinned in tests).
 *
 *  2. EXACT-KEY membership vs a large reference corpus
 *     ([[exceptByKey]]): "drop every document whose fingerprint
 *     appears in corpus B". The reference side may itself be huge, so
 *     no driver collection of keys — instead a distributed
 *     `BloomFilterAggregate` builds a driver-sized sketch, the corpus
 *     is prefiltered map-side by `might_contain` (no false negatives),
 *     and only the tiny might-contain slice pays an exact anti-join to
 *     strip bloom false positives. Result is EXACT; the bloom only
 *     bounds how much data reaches the shuffle.
 *
 * Gram semantics match the dedup family ([[graft.functions.ShingleExprs]]):
 * whitespace tokens, w-word shingles joined by one space, xxhash64
 * seed 42; documents with fewer than w tokens degenerate to a single
 * whole-text shingle.
 */
object Contamination {

  private val gramCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  /** Distinct w-shingle hashes of the eval set, sorted, on the driver.
    * Eval sets are small by construction — this is metadata, not data.
    * ONE bounded job: `limit(maxGrams + 1)` caps what the driver ever
    * materializes, and the guard fires if the cap is hit (rather than
    * paying a separate count() pass or OOMing mid-collect).
    * `cacheKey` memoizes across repeated query constructions (the
    * bench builds each query ≥ 3×), IvfIndex.trainCached-style. */
  def evalGramHashes(eval: DataFrame, textCol: String, w: Int,
                     maxGrams: Int = 10_000_000,
                     cacheKey: Option[String] = None): Array[Long] = {
    def build(): Array[Long] = {
      val rows = eval
        .select(explode(ShingleExprs.shingle_hashes(col(textCol), w)).as("h"))
        .distinct()
        .limit(maxGrams + 1)
        .collect()
      require(rows.length <= maxGrams,
        s"eval set exceeds $maxGrams distinct grams — too large to embed " +
          "in the scan; use contaminatedIds (broadcast-join formulation)")
      val out = rows.map(_.getLong(0))
      java.util.Arrays.sort(out)
      out
    }
    cacheKey match {
      case Some(k) => gramCache.computeIfAbsent(s"$k|$w", _ => build())
      case None => build()
    }
  }

  /** Adds boolean `contaminated` to `train`: true iff the document
    * shares ≥ 1 w-shingle with the eval gram set. Zero shuffles. */
  def flagContaminated(train: DataFrame, textCol: String, w: Int,
                       evalHashes: Array[Long]): DataFrame =
    train.withColumn("contaminated",
      TextExprs.sorted_overlap(
        ShingleExprs.shingle_hashes(col(textCol), w), evalHashes))

  /** Training docs sharing ≥ 1 w-shingle with `eval` — broadcast-join
    * formulation (the explode stream stays map-side through the
    * broadcast hash join; only surviving hits shuffle for distinct). */
  def contaminatedIds(train: DataFrame, eval: DataFrame,
                      idCol: String, textCol: String, w: Int): DataFrame = {
    val evalGrams = eval
      .select(explode(ShingleExprs.shingle_hashes(col(textCol), w)).as("h"))
      .distinct()
    train
      .select(col(idCol), explode(
        ShingleExprs.shingle_hashes(col(textCol), w)).as("h"))
      .join(broadcast(evalGrams), "h")
      .select(col(idCol))
      .distinct()
  }

  /** Contamination ATTRIBUTION: which eval document leaked into which
    * training document, with the shared distinct-gram count — the
    * audit report behind [[flagContaminated]]'s boolean. Same join
    * shape as [[contaminatedIds]] (eval side broadcast; the exploded
    * corpus stream stays map-side through the broadcast hash join;
    * only matching (train, eval) gram hits shuffle to aggregate). */
  def contaminationReport(train: DataFrame, eval: DataFrame,
                          idCol: String, textCol: String, w: Int): DataFrame = {
    def grams(df: DataFrame, as: String) =
      df.select(col(idCol).as(as),
        explode(ShingleExprs.shingle_hashes(col(textCol), w)).as("h"))
    grams(train, "train_id")
      .join(broadcast(grams(eval, "eval_id")), "h")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /**
   * EXACT `corpus` minus rows whose `corpusKey` appears as `refKey` in
   * `reference` — bloom-prefiltered so only might-contain rows reach
   * the anti-join. `expectedItems` sizes the sketch (cap it with
   * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
   * `...maxNumBits` raised accordingly at real scale).
   */
  def exceptByKey(corpus: DataFrame, corpusKey: Column,
                  reference: DataFrame, refKey: Column,
                  expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val numBits = BloomExprs.optimalNumBits(expectedItems, fpp)
    val sketchRow = reference
      .select(BloomExprs.bloom_agg(xxhash64(refKey), expectedItems, numBits)
        .as("bf"))
      .head()
    if (sketchRow.isNullAt(0)) return corpus // empty reference: nothing to drop
    val bloom = sketchRow.getAs[Array[Byte]](0)
    val might = BloomExprs.might_contain(bloom, xxhash64(corpusKey))
    val fast = corpus.filter(!might)
    val candidates = corpus.filter(might)
    val refKeys = reference.select(refKey.as("__refkey")).distinct()
    val falsePositives =
      candidates.join(refKeys, corpusKey === col("__refkey"), "left_anti")
    fast.unionByName(falsePositives)
  }
}
