package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * The dedup signature sidecar of a lake table: `(id, sig, hs)` rows
 * ([[Dedup.signatures]]) stored columnar under
 * `{root}/{db}/{table}/_signatures/batch=<label>` — underscore-
 * prefixed, so the graft catalog walks (file listing, SHOW TABLES,
 * metadata fast path), the compactor, and Spark's own FileIndex all
 * treat it as hidden and it never leaks into query results.
 *
 * Each write lands in its own `batch=<label>` partition dir and is
 * written with Overwrite: a replayed micro-batch (foreachBatch is
 * at-least-once) re-lands on the SAME label and overwrites its
 * previous attempt instead of double-appending — the store stays
 * exactly-once per batch label.
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

  /** Write `docs`' signatures under `batch=<label>` (one kernel pass;
    * Overwrite ⇒ idempotent per label). */
  def append(root: String, db: String, table: String, docs: DataFrame,
             idCol: String, textCol: String, batchLabel: String,
             shingleWords: Int = 3, k: Int = 64): Unit =
    writeSigs(Dedup.signatures(docs, idCol, textCol, shingleWords, k),
      root, db, table, batchLabel)

  private def writeSigs(sigs: DataFrame, root: String, db: String,
                        table: String, batchLabel: String): Unit =
    sigs.write.mode(SaveMode.Overwrite)
      .parquet(s"${dir(root, db, table)}/batch=$batchLabel")

  /** The stored signature table (partition label dropped), or None if
    * nothing has been ingested yet. */
  def load(spark: SparkSession, root: String, db: String,
           table: String): Option[DataFrame] = {
    val d = new java.io.File(dir(root, db, table))
    if (d.isDirectory)
      Some(spark.read.parquet(d.getAbsolutePath).select("id", "sig", "hs"))
    else None
  }

  /**
   * Ingest-time dedup step: near-dup candidates of `batch` against
   * everything ingested BEFORE it, then write the batch's signatures
   * under `batch=<batchLabel>`. Returns (id_a, id_b, est_jaccard,
   * jaccard) pairs — (new, new) and (new, stored) only.
   */
  def dedupThenAppend(root: String, db: String, table: String,
                      batch: DataFrame, idCol: String, textCol: String,
                      batchLabel: String,
                      shingleWords: Int = 3, k: Int = 64, bands: Int = 16,
                      minEstJaccard: Double = 0.0): DataFrame = {
    val spark = batch.sparkSession
    val newSigs = Dedup.signatures(batch, idCol, textCol, shingleWords, k)
      .localCheckpoint(true) // reused: pair join + write below
    val stored = load(spark, root, db, table).getOrElse(
      // schema-true empty frame — id keeps the CALLER's id type
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        newSigs.schema))
    val pairs = Dedup.minhashCandidatesIncremental(newSigs, stored,
      k, bands, minEstJaccard)
      .localCheckpoint(true) // materialize BEFORE the store mutates
    writeSigs(newSigs, root, db, table, batchLabel)
    pairs
  }
}
