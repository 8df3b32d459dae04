package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data curation. `TABLESAMPLE` and
 * `df.sample` draw DIFFERENT rows on every run/partitioning (seeded
 * RNG over splits), and Spark's `sampleBy` quotas are approximate —
 * none of which survives a reproducibility requirement ("rebuild the
 * exact training set from the lake"). Here every row gets a
 * position-independent rank — md5 of its key and a caller salt — and
 * a sample is simply the first `n` ranks per stratum: fully
 * deterministic, re-runnable, engine-independent (md5 hex order is
 * identical everywhere), and changing the salt yields an independent
 * resample.
 *
 * Shape: one window per stratum (shuffle on the strata columns), top-n
 * kept — state is O(n) per stratum via the rank filter.
 */
object Sampling {

  /** Rank expression: md5 over the key columns + salt. Null keys get a
    * marker so they rank deterministically too (concat_ws would
    * silently skip them, making every null collide with empty). */
  def rankKey(keyCols: Seq[Column], salt: String): Column =
    md5(concat_ws(" ",
      (keyCols.map(c => coalesce(c.cast("string"), lit("null")))
        :+ lit(salt)): _*))

  /**
   * Exactly `n` rows per stratum (fewer when a stratum is smaller),
   * chosen by deterministic md5 order of `keyCol` + `salt`.
   *
   * Determinism contract: `keyCol` must uniquely identify rows within
   * a stratum. Rows SHARING a key value share a rank, and the
   * tie-break among them is arbitrary — reproducibility then holds
   * for the multiset of sampled key values, not the exact rows.
   */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], keyCol: String,
                       n: Int, salt: String = "s0"): DataFrame = {
    require(n > 0 && strataCols.nonEmpty)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(rankKey(Seq(col(keyCol)), salt), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /**
   * Leakage-free train/validation split: documents that near-dup each
   * other (any edge in `pairs`) MUST land on the same side, or the
   * held-out set leaks into training through paraphrases — the split
   * unit is therefore the near-dup COMPONENT (distributed connected
   * components over the pair set), not the document. A component goes
   * to validation iff the md5 of its id + salt is lexicographically
   * below `valBound` (a hex prefix: "1a" ≈ (16+10)/256 ≈ 10.2% of the
   * hash space) — deterministic, engine-independent, re-runnable, and
   * changing the salt redraws the split. Documents with no near-dup
   * are their own singleton component.
   *
   * Scale shape: the component build is the iterative min-label
   * propagation of [[ConnectedComponents.run]] (edge-set-sized, never
   * corpus²); the split itself is one per-row hash — no extra shuffle
   * beyond the component join.
   */
  def leakFreeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                    srcCol: String, dstCol: String,
                    valBound: String = "1a", salt: String = "s0"): DataFrame = {
    val cc = ConnectedComponents.run(pairs, srcCol, dstCol)
    docs.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
      .withColumn("split",
        when(rankKey(Seq(col("component")), salt) < valBound, "val")
          .otherwise("train"))
  }
}
