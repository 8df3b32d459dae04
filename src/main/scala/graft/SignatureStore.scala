package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * The dedup signature sidecar of a lake table: `(id, sig, hs)` rows
 * ([[Dedup.signatures]]) stored columnar under
 * `{root}/{db}/{table}/_signatures` — underscore-prefixed, so both the
 * graft catalog walk and Spark's own FileIndex treat it as hidden and
 * it never leaks into query results.
 *
 * This is what makes dedup O(batch) instead of O(corpus) at ingest
 * time: signatures are computed ONCE per document (one codegen'd
 * kernel pass while the text is already in memory for the lake write),
 * and every later batch runs [[Dedup.minhashCandidatesIncremental]]
 * against the stored table — the historical corpus text is never
 * re-read, only its banded signatures join the batch.
 */
object SignatureStore {

  def dir(root: String, db: String, table: String): String =
    new java.io.File(new java.io.File(new java.io.File(root, db), table),
      "_signatures").getAbsolutePath

  /** Append `docs`' signatures to the sidecar (one kernel pass). */
  def append(root: String, db: String, table: String, docs: DataFrame,
             idCol: String, textCol: String,
             shingleWords: Int = 3, k: Int = 64): Unit =
    Dedup.signatures(docs, idCol, textCol, shingleWords, k)
      .write.mode(SaveMode.Append).parquet(dir(root, db, table))

  /** The stored signature table; empty (correct schema) if nothing has
    * been ingested yet. */
  def load(spark: SparkSession, root: String, db: String,
           table: String): DataFrame = {
    val d = new java.io.File(dir(root, db, table))
    if (d.isDirectory) spark.read.parquet(d.getAbsolutePath)
    else spark.emptyDataFrame
      .withColumn("id", org.apache.spark.sql.functions.lit(0L))
      .withColumn("sig", org.apache.spark.sql.functions
        .array().cast("array<bigint>"))
      .withColumn("hs", org.apache.spark.sql.functions
        .array().cast("array<bigint>"))
  }

  /**
   * Ingest-time dedup step: near-dup candidates of `batch` against
   * everything ingested BEFORE it, then append the batch's signatures
   * to the store. Returns (id_a, id_b, est_jaccard, jaccard) pairs —
   * (new, new) and (new, stored) only.
   */
  def dedupThenAppend(root: String, db: String, table: String,
                      batch: DataFrame, idCol: String, textCol: String,
                      shingleWords: Int = 3, k: Int = 64, bands: Int = 16,
                      minEstJaccard: Double = 0.0): DataFrame = {
    val spark = batch.sparkSession
    val newSigs = Dedup.signatures(batch, idCol, textCol, shingleWords, k)
      .localCheckpoint(true) // reused: pair join + append below
    val stored = load(spark, root, db, table)
    val pairs = Dedup.minhashCandidatesIncremental(newSigs, stored,
      k, bands, minEstJaccard)
      .localCheckpoint(true) // materialize BEFORE the store mutates
    newSigs.write.mode(SaveMode.Append).parquet(dir(root, db, table))
    pairs
  }
}
