package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tiered-retention downsampling — the storage policy every large
 * time-series lake runs (keep raw fidelity for the recent window,
 * compact older data to coarse rollups): rows with `ts >= cutoffNs`
 * pass through RAW; older rows compact to one row per (keys, bucket)
 * carrying the count / avg / min / max that dashboards still need.
 *
 * Scale shape: the reference's lake layout is `date=/hour=`-partitioned
 * parquet (SURVEY §1.1), so the cutoff predicate is a PARTITION-PRUNING
 * split — each branch's scan reads only its own date folders, the hot
 * branch is map-only pass-through (never shuffled), and the cold branch
 * is one partial/final hash aggregate whose output is smaller than its
 * input by the bucket compaction factor. On a flat unpartitioned file
 * the two branches read the file twice; on the partitioned lake the
 * union reads every row exactly once, which is the deployment target.
 *
 * `v_avg` is rounded to 1e-6 on BOTH tiers (the q41/lmScore
 * cross-engine convention); min/max are exact row values and need no
 * rounding. The rollup average is computed as an EXACT DECIMAL sum
 * cast to double, then divided — a plain double `avg` is
 * summation-order-dependent, and at sf0.1 one bucket's float sum
 * landed a half-ulp either side of a round(x, 6) midpoint in Spark vs
 * DuckDB; the decimal sum is order-independent, so both engines round
 * the identical double.
 */
object Retention {

  def tieredDownsample(events: DataFrame, tsCol: String,
                       keyCols: Seq[String], valCol: String,
                       cutoffNs: Long, bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucketNs must be positive")
    // pmod floors (−3 % 10 → 7) where SQL % truncates toward zero
    // (→ −3), so the two bucket formulas diverge on NEGATIVE
    // timestamps — epoch-ns lakes are non-negative by construction
    // (the reference's time model starts at unix epoch), and a
    // pre-1970 ts here means corrupted ingest, better refused loudly
    // than silently bucketed differently per engine.
    require(cutoffNs >= 0, "cutoffNs must be >= 0 (epoch-ns time model)")
    val keys = keyCols.map(col)
    val ts = col(tsCol)
    val raw = events.filter(ts >= cutoffNs)
      .select(keys ++ Seq(
        ts.as("bucket_ns"), lit(1L).as("n_rows"),
        round(col(valCol).cast("double"), 6).as("v_avg"),
        col(valCol).cast("double").as("v_min"),
        col(valCol).cast("double").as("v_max"),
        lit("raw").as("tier")): _*)
    // per-row tripwire for the same invariant on the data itself: a
    // negative ts fails the job with a named error instead of landing
    // in a floor-vs-truncate bucket the oracle disagrees on. One
    // codegen'd branch inside the scan — no extra pass.
    val guardedTs = when(ts < 0, raise_error(concat(
        lit(s"tieredDownsample: negative $tsCol (pre-epoch) in rollup "),
        lit("tier — floor (pmod) and SQL % bucketing diverge there"))))
      .otherwise(ts)
    val rolled = events.filter(ts < cutoffNs)
      .groupBy(keys :+ (guardedTs - pmod(guardedTs, lit(bucketNs)))
        .as("bucket_ns"): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valCol).cast("decimal(27,9)")).as("__vsum"),
        min(col(valCol)).cast("double").as("v_min"),
        max(col(valCol)).cast("double").as("v_max"))
      .select(keys ++ Seq(col("bucket_ns"), col("n_rows"),
        round(col("__vsum").cast("double") / col("n_rows"), 6).as("v_avg"),
        col("v_min"), col("v_max"), lit("rollup").as("tier")): _*)
    raw.unionByName(rolled)
  }
}
